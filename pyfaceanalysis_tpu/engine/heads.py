"""Age / race / gender estimation heads.

Reference: ``estimate_age_race_gender`` (face_analysis.py:1170-1306). Per
detected face (post-purge): normalize to the (256, 260) "Z" frame from the
localized eyes (method eyes_inferred-mouth_areaZ, centering
mid_eyes_inferred-mouth, EyeLineRotation), extract a 96x96 patch (sampling
1.14 * 160/96, ty = -6/(160/96), contrast "AgeContrastEnhancement_Avg_Std"
obj_std 0.16), run the linear-PCA network once, and feed the SAME features
to three Gaussian regressors: Age (estimate_std=True), Race, Gender.

TPU re-design: the reference loops faces one at a time with a PIL warp chain
each; here all faces are batched -- one (N, 260, 256) gather, one (N, 9216)
patch batch, one network execution. Label->string maps per
face_analysis.py:333-371.
"""

from __future__ import annotations

from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pyfaceanalysis_tpu import normalization
from pyfaceanalysis_tpu.models.network import apply_network
from pyfaceanalysis_tpu.ops.contrast import contrast_enhance_patches
from pyfaceanalysis_tpu.ops.patches import extract_centered_patch
from pyfaceanalysis_tpu.training.datasets import (
    AGE_SAMPLING,
    Z_SIZE,
    age_patch_constants,
)


def _tta_offsets(k: int) -> np.ndarray:
    """Deterministic (K, 3) crop perturbations (ox, oy, dlogscale) in
    Z-frame pixels for test-time multi-crop averaging.

    The deploy-time attribute error is dominated by eye-localization
    jitter (~0.08 x inter-eye ~ 6 Z px, diagnose_attrs deploy vs zero
    rows); averaging the heads over a small symmetric crop ring smooths
    the response surface. Radius 3 Z px / +-4% scale match the measured
    jitter scale. k=1 is exactly the reference's single crop.
    """
    if k <= 1:
        return np.zeros((1, 3), np.float32)
    r, ds = 3.0, 0.04
    pool = [(r, 0, 0), (-r, 0, 0), (0, r, 0), (0, -r, 0),
            (0, 0, ds), (0, 0, -ds),
            (r, r, 0), (-r, -r, 0), (r, -r, 0), (-r, r, 0)]
    offs = [(0.0, 0.0, 0.0)] + pool[:k - 1]
    return np.asarray(offs, np.float32)


def _age_patch_zgrid() -> Tuple[np.ndarray, np.ndarray]:
    """Static Z-frame coordinates (relative to the Z center) of the 96x96
    age-patch sample grid.

    Composes the two affine resamplings of the reference path --
    source -> (260, 256) Z frame (normalization.sample_frame) followed by
    Z frame -> 96x96 sampled crop (extract_centered_patch at AGE_SAMPLING)
    -- into ONE map, so `_sample_age_patches` gathers exactly the 9216
    output taps per face instead of materializing the 66,560-texel Z frame
    first (7.2x less gather traffic; the gather is the whole cost of the
    attribute program on TPU). Single-stage bilinear of the composed map
    vs bilinear-of-bilinear differ only in filter support; the 96x96 box
    never leaves the Z frame (extent 182.4 px inside 256/260) so the
    zero-fill semantics compose exactly.
    """
    zh, zw = Z_SIZE
    fr, fc, tx, ty = age_patch_constants()
    x0 = fc + tx * AGE_SAMPLING
    y0 = fr + ty * AGE_SAMPLING
    gx = (x0 + (np.arange(96, dtype=np.float32) + 0.5) * AGE_SAMPLING
          - 0.5 - (zw - 1) / 2.0)
    gy = (y0 + (np.arange(96, dtype=np.float32) + 0.5) * AGE_SAMPLING
          - 0.5 - (zh - 1) / 2.0)
    return gx, gy


def _sample_age_patches(images: jax.Array, centers: jax.Array,
                        angles: jax.Array, sfs: jax.Array,
                        img_idx: jax.Array) -> jax.Array:
    """(N, 96, 96) age-head input patches gathered DIRECTLY from the image
    stack through the composed source->patch affine (see _age_patch_zgrid).

    images: (B, H, W); centers: (N, 2) Z-frame center in source px;
    angles: (N,) deg; sfs: (N,) source px per Z px; img_idx: (N,) int32.
    """
    B, H, W = images.shape
    flat_img = images.reshape(-1)
    gx, gy = _age_patch_zgrid()
    gx = jnp.asarray(gx)
    gy = jnp.asarray(gy)

    def one_face(center, angle, sf, idx):
        u = gx[None, :] * sf
        v = gy[:, None] * sf
        rad = jnp.deg2rad(angle)
        c, s = jnp.cos(rad), jnp.sin(rad)
        sx = center[0] + c * u - s * v
        sy = center[1] + s * u + c * v
        base = idx.astype(jnp.int32) * (H * W)
        px = sx - 0.5
        py = sy - 0.5
        ix0 = jnp.floor(px)
        iy0 = jnp.floor(py)
        tx_ = px - ix0
        ty_ = py - iy0
        ix0 = ix0.astype(jnp.int32)
        iy0 = iy0.astype(jnp.int32)

        def tap(iy, ix):
            inb = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
            lin = base + jnp.clip(iy, 0, H - 1) * W + jnp.clip(ix, 0, W - 1)
            return jnp.where(inb, jnp.take(flat_img, lin, axis=0), 0.0)

        top = tap(iy0, ix0) * (1 - tx_) + tap(iy0, ix0 + 1) * tx_
        bot = tap(iy0 + 1, ix0) * (1 - tx_) + tap(iy0 + 1, ix0 + 1) * tx_
        return top * (1 - ty_) + bot * ty_

    return jax.vmap(one_face)(centers, angles, sfs, img_idx)


@partial(jax.jit, static_argnames=("specs", "dims"))
def _arg_forward(specs, dims: Tuple[int, int, int],
                 images: jax.Array, net_params, clf_age, clf_race,
                 clf_gender, centers: jax.Array, angles: jax.Array,
                 sfs: jax.Array, img_idx: jax.Array,
                 tta_offsets: jax.Array):
    """Batched Z-frame normalization + patch + features + three regressions,
    over faces drawn from a STACK of images (one program for a whole batch
    of photos -- no per-image head dispatch). Returns ONE stacked (4, N)
    array [age, age_std, race, gender] so the caller pays a single
    device->host pull (~25 ms RTT each over a tunneled link).

    images: (B, H, W); centers: (N, 2), angles: (N,) deg, sfs: (N,) source
    px per Z px, img_idx: (N,) int32 image of each face. tta_offsets:
    (K, 3) Z-frame crop perturbations; the K crops of a face run through
    the same batched GEMMs (one wider batch, not K dispatches) and the
    head outputs are posterior-averaged per face.
    """
    n = centers.shape[0]
    k = tta_offsets.shape[0]
    # Expand each face into K crops: (ox, oy) rotate with the face angle
    # and scale with sf (offsets are defined in the Z frame); dlogscale
    # multiplies sf.
    rad = jnp.deg2rad(angles)
    c, s = jnp.cos(rad), jnp.sin(rad)
    ox = tta_offsets[None, :, 0]
    oy = tta_offsets[None, :, 1]
    dx = (c[:, None] * ox - s[:, None] * oy) * sfs[:, None]
    dy = (s[:, None] * ox + c[:, None] * oy) * sfs[:, None]
    centers_k = (centers[:, None, :]
                 + jnp.stack([dx, dy], axis=-1)).reshape(n * k, 2)
    sfs_k = (sfs[:, None] * jnp.exp(tta_offsets[None, :, 2])).reshape(n * k)
    angles_k = jnp.repeat(angles, k)
    idx_k = jnp.repeat(img_idx, k)

    patches = _sample_age_patches(images, centers_k, angles_k, sfs_k, idx_k)
    flat = contrast_enhance_patches(patches.reshape(patches.shape[0], -1),
                                    obj_avg=0.0, obj_std=0.16)
    sl = apply_network(specs, net_params, flat)
    d_age, d_race, d_gender = dims
    age_k, age_std_k = clf_age.regression(sl[:, :d_age], estimate_std=True)
    race_k = clf_race.regression(sl[:, :d_race])
    gender_k = clf_gender.regression(sl[:, :d_gender])
    # Per-face averaging over the K crops. Age std combines as the std of
    # the equal-weight mixture of the K per-crop posteriors.
    age_k = age_k.reshape(n, k)
    age = age_k.mean(axis=1)
    age_var = (age_std_k.reshape(n, k) ** 2 + age_k ** 2).mean(axis=1) \
        - age ** 2
    age_std = jnp.sqrt(jnp.maximum(age_var, 0.0))
    race = race_k.reshape(n, k).mean(axis=1)
    gender = gender_k.reshape(n, k).mean(axis=1)
    return jnp.stack([age, age_std, race, gender])


def _frame_arrays(rows: np.ndarray):
    centers, angles, sfs = [], [], []
    for row in rows:
        coords = [row[5], row[6], row[7], row[8], 0.0, 0.0]
        fp = normalization.frame_params(
            coords, normalization_method="eyes_inferred-mouth_areaZ",
            centering_mode="mid_eyes_inferred-mouth",
            rotation_mode="EyeLineRotation", out_size=(Z_SIZE[1], Z_SIZE[0]))
        centers.append([fp.center_x, fp.center_y])
        angles.append(fp.angle_deg)
        sfs.append(fp.sf)
    return (np.asarray(centers, np.float32), np.asarray(angles, np.float32),
            np.asarray(sfs, np.float32))


def estimate_age_race_gender_multi(images: jax.Array, rows: np.ndarray,
                                   img_idx: np.ndarray, model,
                                   tta: int = 1
                                   ) -> Tuple[np.ndarray, np.ndarray,
                                              np.ndarray, np.ndarray]:
    """Attribute heads for faces spread over an image STACK: one jitted
    program for the whole batch. images: (B, H, W) device stack; rows:
    (N, 10) purged detections; img_idx: (N,) image index per row.
    tta: number of crops averaged per face (1 = reference behavior)."""
    n = len(rows)
    if n == 0:
        z = np.zeros(0)
        return z, z, z, z
    centers, angles, sfs = _frame_arrays(rows)
    # Pad the face batch to a small bucket so recompiles are rare.
    bucket = max(4, 1 << (n - 1).bit_length())
    pad = bucket - n
    centers = np.pad(centers, ((0, pad), (0, 0)))
    angles = np.pad(angles, (0, pad))
    sfs = np.pad(sfs, (0, pad), constant_values=1.0)
    idx = np.pad(np.asarray(img_idx, np.int32), (0, pad))

    net = model.nets["net_age"]
    out = np.asarray(_arg_forward(          # ONE (4, bucket) pull
        net.specs,
        (model.clf_input_dim("Age"), model.clf_input_dim("Race"),
         model.clf_input_dim("Gender")),
        images, tuple(net.params),
        model.classifier("Age"), model.classifier("Race"),
        model.classifier("Gender"),
        jnp.asarray(centers), jnp.asarray(angles), jnp.asarray(sfs),
        jnp.asarray(idx), jnp.asarray(_tta_offsets(tta))))
    return out[0, :n], out[1, :n], out[2, :n], out[3, :n]


def estimate_age_race_gender(image: jax.Array, rows: np.ndarray, model,
                             tta: int = 1
                             ) -> Tuple[np.ndarray, np.ndarray, np.ndarray,
                                        np.ndarray]:
    """rows: (N, 10) purged detections. Returns (ages, age_stds, race_values,
    gender_values) as float arrays (label values, not strings)."""
    n = len(rows)
    if n == 0:
        z = np.zeros(0)
        return z, z, z, z
    return estimate_age_race_gender_multi(
        jnp.asarray(image)[None], rows, np.zeros(n, np.int32), model,
        tta=tta)


def save_age_estimation_images(image: jax.Array, rows: np.ndarray,
                               pattern: str = "ImageForAgeEstimation%03d.jpg",
                               start_index: int = 0) -> int:
    """Writes the 96x96 age-head input patches as JPEGs.

    The reference does this UNCONDITIONALLY during attribute estimation
    (face_analysis.py:1251-1254, 'ImageForAgeEstimation%03d.jpg'); here it is
    an opt-in debug side output (DetectorConfig.save_age_estimation_images).
    Returns the next index.
    """
    from pyfaceanalysis_tpu.io import images as im_io

    n = len(rows)
    if n == 0:
        return start_index
    centers, angles, sfs = [], [], []
    for row in rows:
        fp = normalization.frame_params(
            [row[5], row[6], row[7], row[8], 0.0, 0.0],
            normalization_method="eyes_inferred-mouth_areaZ",
            centering_mode="mid_eyes_inferred-mouth",
            rotation_mode="EyeLineRotation", out_size=(Z_SIZE[1], Z_SIZE[0]))
        centers.append([fp.center_x, fp.center_y])
        angles.append(fp.angle_deg)
        sfs.append(fp.sf)
    fr, fc, tx, ty = age_patch_constants()
    zh, zw = Z_SIZE
    for j in range(n):
        fp = normalization.FrameParams(centers[j][0], centers[j][1],
                                       angles[j], sfs[j])
        z = normalization.sample_frame(image, fp, (zw, zh))
        patch = np.asarray(extract_centered_patch(
            jnp.asarray(z), AGE_SAMPLING, fr, fc, tx, ty, (96, 96)))[0]
        im_io.save_image(pattern % (start_index + j), patch)
    return start_index + n


def gender_strings(values, long_text: bool = True) -> List[str]:
    """-1 -> Male, +1 -> Female (face_analysis.py:333-351)."""
    return [("Male" if long_text else "M") if v <= 0
            else ("Female" if long_text else "F") for v in values]


def race_strings(values, long_text: bool = True) -> List[str]:
    """-2 -> Black, +2 -> White (face_analysis.py:354-371)."""
    return [("Black" if long_text else "B") if v <= 0
            else ("White" if long_text else "W") for v in values]
