"""Dataset builders for each pipeline stage family.

Each builder renders synthetic faces (training.synth) and extracts patches
with the SAME device kernels used at inference (ops.patches), so the
coordinate/rotation conventions are consistent end-to-end by construction.
Label ranges replicate the reference pipeline (SURVEY.md 2.2 and
Pipelines/Pipeline_experimental.txt):

- pose iter-0:  dx +-40, dy +-20 (regression units), angle +-22.5 deg,
                sampling 0.694..0.981
- pose iter-1:  dx +-14, dy +-13, angle +-21, same sampling envelope
- disc:         10 graded centering classes, avg_labels linspace(0, 1, 10)
                (0 = centered face, 1 = background), reference cutoff ladder
- eyes:         +-10 px labels in the 2.3719-sampled 64-unit eye frame
- age/race/gender: 16.5-57.8 years / +-2 / +-1 on Z-frame 96x96 patches

Temporal structure: pose and eye sets are generated as mean-reverting walks
(one segment per rendered face) so plain temporal-graph SFA extracts the pose
parameters as its slowest features.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pyfaceanalysis_tpu.config import DESIRED_SAMPLING, EYE_SAMPLING, NetGeometry
from pyfaceanalysis_tpu.ops.contrast import contrast_enhance_patches
from pyfaceanalysis_tpu.ops.patches import extract_centered_patch, extract_patches_rotate
from pyfaceanalysis_tpu.training import synth

CANVAS = (240, 240)
# Face sizes are RANDOMIZED per canvas: with a fixed size, patch-resampling
# blur correlates perfectly with the scale label and the nets latch onto it,
# which does not generalize to faces of other sizes.
FACE_SIZE_RANGE = (40.0, 110.0)


def _render_batch(key, n, with_face=True, canvas=CANVAS,
                  face_size_range=FACE_SIZE_RANGE, angle_range=0.0,
                  attr_cues="v3"):
    """Renders n canvases with randomized face size and (optionally)
    in-plane face angle. Detection-time rotation lives in the FACE (about
    the face center), not only in the extraction grid (about the box
    center), so rotation-robust stages must train on rotated renders."""
    k_keys, k_size, k_ang = jax.random.split(key, 3)
    keys = jax.random.split(k_keys, n)
    sizes = jax.random.uniform(k_size, (n,), minval=face_size_range[0],
                               maxval=face_size_range[1])
    angles = jax.random.uniform(k_ang, (n,), minval=-angle_range,
                                maxval=angle_range)
    fn = jax.vmap(lambda k, fs, ad: synth.render_face(
        k, canvas_hw=canvas, face_size=fs, angle_deg=ad,
        with_face=with_face, attr_cues=attr_cues))
    return jax.jit(fn)(keys, sizes, angles)


_POOL_KEYS = ("eye_l", "eye_r", "mouth", "face_size", "angle")


def _face_canvases(key, n, angle_range, real_source=None, real_frac=0.0,
                   canvas=CANVAS, face_size_range=FACE_SIZE_RANGE,
                   attr_cues="v3"):
    """n face canvases: synthetic renders mixed with warped REAL annotated
    faces (training.real) at ratio ``real_frac``. Attrs follow the
    annotation convention of synth.render_face either way."""
    n_real = int(n * real_frac) if real_source is not None else 0
    n_real = min(n_real, n - 1) if n > 1 else 0
    k_syn, k_real = jax.random.split(key)
    imgs, attrs = _render_batch(k_syn, n - n_real, angle_range=angle_range,
                                canvas=canvas,
                                face_size_range=face_size_range,
                                attr_cues=attr_cues)
    if n_real > 0:
        seed = int(jax.random.randint(k_real, (), 0, 2 ** 31 - 1))
        r_imgs, r_attrs = real_source.sample_faces(
            seed, n_real, canvas, face_size_range, angle_range)
        imgs = jnp.concatenate([imgs, r_imgs], axis=0)
        attrs = {k: jnp.concatenate([jnp.asarray(attrs[k]),
                                     jnp.asarray(r_attrs[k])], axis=0)
                 for k in _POOL_KEYS}
    return imgs, attrs


def _boxes_from_centers(cx, cy, side):
    """Inclusive [x0, y0, x1, y1] boxes from centers and side lengths."""
    x0 = cx - (side - 1.0) / 2.0
    y0 = cy - (side - 1.0) / 2.0
    return jnp.stack([x0, y0, x0 + side - 1.0, y0 + side - 1.0], axis=-1)


# NEAREST matches the inference extractions (config interpolation_formats
# default; the reference also samples NEAREST, FaceDetectUpdated.py:125).
_extract_batch = jax.jit(jax.vmap(
    lambda img, boxes, angles: extract_patches_rotate(
        img, boxes, angles, (64, 64), method="nearest")))


def _blur1(p):
    return (p + jnp.roll(p, 1, -1) + jnp.roll(p, -1, -1)
            + jnp.roll(p, 1, -2) + jnp.roll(p, -1, -2)) / 5.0


def _random_patch_blur(key, patches, noise_amp: float = 0.0):
    """Per-PATCH blur augmentation (random strength 0..~2 px), optionally
    followed by high-frequency texture injection.

    Canvas-level blur mostly vanishes once boxes are downsampled to 64x64,
    so it cannot stop the nets from keying on renderer-sharp micro-cues
    that do not exist in photographs; randomizing blur at patch level makes
    fine detail an UNRELIABLE signal during GSFA fitting, forcing the slow
    features onto coarse structure that transfers to real faces.

    ``noise_amp`` > 0 additionally adds band-passed noise with a random
    per-patch amplitude in [0, noise_amp]. Blur can only REMOVE high
    frequencies, yet the measured renderer-vs-photograph gap runs the
    other way: real anchor faces carry ~3x the gradient energy and ~10x
    the Laplacian variance of renderer faces, a gap the production
    contrast normalization does not close (docs/domain_gap_r4.json,
    tools/audit_domain_gap.py). Injecting texture makes the PRESENCE of
    micro-structure uninformative too, and amp ~0.08 spans the real
    patches' Laplacian-variance range. patches: (..., 64, 64).
    """
    k1, k2, k3, k4 = jax.random.split(key, 4)
    shape = patches.shape
    n = int(np.prod(shape[:-2]))
    t1 = jax.random.uniform(k1, (n,) + (1, 1))
    t2 = jax.random.uniform(k2, (n,) + (1, 1)) * t1     # heavier tail
    flat = patches.reshape((n,) + shape[-2:])
    b1 = _blur1(flat)
    b2 = _blur1(b1)
    out = flat * (1 - t1) + b1 * (t1 - t2) + b2 * t2
    if noise_amp > 0.0:
        amp = jax.random.uniform(k3, (n, 1, 1)) * noise_amp
        white = jax.random.normal(k4, out.shape)
        out = jnp.clip(out + amp * (white - _blur1(white)), 0.0, 1.0)
    return out.reshape(shape)


def _maybe_contrast(flat, enabled: bool):
    """The cascade's per-patch contrast normalization (engine.cascade:
    mean 137.5 / std 0.4*255 in [0, 255] units) -- applied at TRAINING time
    iff the model is to run with detection_contrast_normalize, so pixel
    statistics match between fitting and inference."""
    if not enabled:
        return flat
    from pyfaceanalysis_tpu.ops.contrast import contrast_normalize_avg_std
    return contrast_normalize_avg_std(flat * 255.0, 137.5,
                                      0.40 * 255.0) / 255.0


def pose_dataset(key, num_faces: int, steps: int, geom: NetGeometry,
                 dx_range: float, dy_range: float, ang_range: float,
                 real_source=None, real_frac: float = 0.0,
                 contrast_normalize: bool = False, attr_cues: str = "v3",
                 texture_noise: float = 0.0
                 ) -> Tuple[np.ndarray, Dict[str, np.ndarray]]:
    """Pose-walk patches: (N, 4096) in [0,1] plus labels dx/dy/ang/scale.

    N = num_faces * steps; each face contributes one temporally-smooth walk
    segment over (dx, dy, angle, sampling).
    """
    k_face, k_dx, k_dy, k_ang, k_s = jax.random.split(key, 5)
    # Faces render at random in-plane angles: detection-time rotation lives
    # in the face, not only in the sampling grid.
    imgs, attrs = _face_canvases(k_face, num_faces, ang_range,
                                 real_source, real_frac,
                                 attr_cues=attr_cues)
    F = attrs["face_size"]                                       # (M,)
    theta = attrs["angle"]                                       # (M,)
    fc_x = ((attrs["eye_l"][:, 0] + attrs["eye_r"][:, 0]) / 2.0
            + attrs["mouth"][:, 0]) / 2.0
    fc_y = ((attrs["eye_l"][:, 1] + attrs["eye_r"][:, 1]) / 2.0
            + attrs["mouth"][:, 1]) / 2.0

    # Independent uniform pose draws (the nets are trained with label-graph
    # GSFA, so no temporal ordering is needed; uniform coverage beats walks).
    M, T = num_faces, steps
    dx = jax.random.uniform(k_dx, (M, T), minval=-dx_range, maxval=dx_range)
    dy = jax.random.uniform(k_dy, (M, T), minval=-dy_range, maxval=dy_range)
    ang = jax.random.uniform(k_ang, (M, T), minval=-ang_range,
                             maxval=ang_range)
    smp = jax.random.uniform(k_s, (M, T), minval=geom.mins, maxval=geom.maxs)

    # Scale label semantics: the update rule ``new_w = w / reg * 0.825``
    # (face_analysis.py:820-833) maps the box onto the face size F exactly
    # when reg = 0.825 * b / F, so label smp <=> box side b = smp * F / 0.825.
    b = smp * F[:, None] / DESIRED_SAMPLING                      # box side px
    # Extraction happens at the current ANGLE ESTIMATE a = theta - ang, so
    # the net sees a residual rotation of ``ang`` (the PAng label). Position
    # labels are PATCH-frame offsets: the box center is displaced by
    # R(a) . (dx, dy) in image coordinates (R(a) = the sampling rotation of
    # ops.patches.extract_patches_rotate), which the net observes as a
    # +(dx, dy) patch-frame offset for ANY a.
    a = theta[:, None] - ang                                     # (M, T)
    rad = jnp.deg2rad(a)
    off_x = dx * b / geom.regression_width
    off_y = dy * b / geom.regression_height
    cx = fc_x[:, None] + jnp.cos(rad) * off_x - jnp.sin(rad) * off_y
    cy = fc_y[:, None] + jnp.sin(rad) * off_x + jnp.cos(rad) * off_y
    boxes = _boxes_from_centers(cx, cy, b)                       # (M, T, 4)
    patches = _extract_batch(imgs, boxes, a)                     # (M,T,64,64)
    patches = _random_patch_blur(jax.random.fold_in(key, 99), patches,
                                 noise_amp=texture_noise)

    N = num_faces * steps
    labels = {
        "dx": np.asarray(dx).reshape(N),
        "dy": np.asarray(dy).reshape(N),
        "ang": np.asarray(ang).reshape(N),
        "scale": np.asarray(smp).reshape(N),
    }
    # Patches stay on DEVICE (the trainer consumes them there; pulling the
    # full patch tensor to host is prohibitively slow over a TPU tunnel).
    return _maybe_contrast(jnp.reshape(patches, (N, -1)),
                           contrast_normalize), labels


def disc_dataset(key, num_faces: int, steps: int, geom: NetGeometry,
                 num_classes: int = 10, real_source=None,
                 texture_noise: float = 0.0,
                 texture_noise_bg: float = 0.0,
                 real_frac: float = 0.0, real_bg_frac: float = 0.0,
                 contrast_normalize: bool = False,
                 mined_frac: float = 0.0, attr_cues: str = "v3",
                 return_frac: bool = False
                 ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Graded face-centering patches.

    Classes 0..num_classes-2 have perturbation magnitudes growing linearly
    (class 0 = centered); the last class is pure background. Real annotated
    faces join the graded classes at ratio ``real_frac``; real face-free
    photo crops (hard negatives) join the background class at
    ``real_bg_frac``. When ``real_source`` carries mined false-positive
    boxes (RealFaceSource.load_mined), ``mined_frac`` x the background
    count of EXTRA background-class patches are sampled on those boxes --
    the model's own real-photo mistakes as bootstrapped hard negatives.
    Returns (patches (N, 4096), class_ids (N,), avg_labels (C,) =
    linspace(0, 1, C)).

    ``texture_noise_bg`` sets the background/mined-class injection
    amplitude SEPARATELY from the graded face classes (0 = inherit
    ``texture_noise``): the campaign-3 L5 result was that face-class
    injection at 0.08 cuts real-photo FP but degrades real-face recall
    (docs/ROUND4_NOTES.md), so the FP lever is exposed background-only.
    ``return_frac=True`` appends the CONTINUOUS centering fraction per
    patch (graded faces: [0, 1); background/mined: 1.0) for serial-graph
    disc training (TrainConfig.disc_graph).
    """
    bg_noise = texture_noise_bg if texture_noise_bg > 0 else texture_noise
    k_face, k_bg, k_mag, k_dir, k_cls = jax.random.split(key, 5)
    imgs, attrs = _face_canvases(k_face, num_faces, 22.5,
                                 real_source, real_frac,
                                 attr_cues=attr_cues)
    F = attrs["face_size"]
    theta = attrs["angle"]
    fc_x = ((attrs["eye_l"][:, 0] + attrs["eye_r"][:, 0]) / 2.0
            + attrs["mouth"][:, 0]) / 2.0
    fc_y = ((attrs["eye_l"][:, 1] + attrs["eye_r"][:, 1]) / 2.0
            + attrs["mouth"][:, 1]) / 2.0

    M, T = num_faces, steps
    cls = jax.random.randint(k_cls, (M, T), 0, num_classes - 1)   # 0..C-2
    frac = (cls + jax.random.uniform(k_mag, (M, T))) / (num_classes - 1)
    frac = jnp.clip(frac, 0.0, 1.0)
    d = jax.random.uniform(k_dir, (4, M, T), minval=-1.0, maxval=1.0)
    # All perturbation dimensions scale TOGETHER with the class fraction
    # (visually coherent quality grades). Budget beyond the pose envelope
    # (FaceCentering2 used Dx 48 / Dy 24 -- wider than the refinement nets).
    # The absolute meaning of the final Disc cutoff is model-dependent, so
    # the trainer CALIBRATES it against converged-residual patches rather
    # than assuming the reference's 0.05 transfers.
    dx = 48.0 * frac * jnp.sign(d[0]) * (0.35 + 0.65 * jnp.abs(d[0]))
    dy = 24.0 * frac * jnp.sign(d[1]) * (0.35 + 0.65 * jnp.abs(d[1]))
    ang = 27.0 * frac * d[2]
    log_span = jnp.log(geom.maxs / geom.mins) * 0.75
    smp = DESIRED_SAMPLING * jnp.exp(log_span * frac * jnp.sign(d[3])
                                     * (0.3 + 0.7 * jnp.abs(d[3])))

    b = smp * F[:, None] / DESIRED_SAMPLING
    a = theta[:, None] - ang              # extraction = angle estimate
    rad = jnp.deg2rad(a)
    off_x = dx * b / geom.regression_width
    off_y = dy * b / geom.regression_height
    cx = fc_x[:, None] + jnp.cos(rad) * off_x - jnp.sin(rad) * off_y
    cy = fc_y[:, None] + jnp.sin(rad) * off_x + jnp.cos(rad) * off_y
    boxes = _boxes_from_centers(cx, cy, b)
    patches = _random_patch_blur(jax.random.fold_in(key, 99),
                                 _extract_batch(imgs, boxes, a),
                                 noise_amp=texture_noise)
    patches = jnp.reshape(patches, (M * T, -1))
    cls = np.asarray(cls).reshape(-1)

    # Background class: patches from face-free canvases at random scales.
    # Canvases mix synthetic scenes with real face-free photo crops
    # (hard negatives: foliage, bookshelves, clothing).
    n_bg = M * T // (num_classes - 1) + 1
    n_canv = max(n_bg // 8, 1)
    n_real_canv = (int(n_canv * real_bg_frac)
                   if real_source is not None else 0)
    bg_imgs, _ = _render_batch(k_bg, max(n_canv - n_real_canv, 1),
                               with_face=False, attr_cues=attr_cues)
    if n_real_canv > 0:
        seed = int(jax.random.randint(jax.random.fold_in(k_bg, 17),
                                      (), 0, 2 ** 31 - 1))
        real_bg = real_source.sample_backgrounds(seed, n_real_canv, CANVAS)
        bg_imgs = jnp.concatenate([bg_imgs, real_bg], axis=0)
    kb1, kb2, kb3 = jax.random.split(k_bg, 3)
    nb = bg_imgs.shape[0]
    per = -(-n_bg // nb)
    side = jax.random.uniform(kb1, (nb, per), minval=24.0,
                              maxval=CANVAS[0] * 0.7)
    bcx = jax.random.uniform(kb2, (nb, per), minval=40.0, maxval=CANVAS[1] - 40.0)
    bcy = jax.random.uniform(kb3, (nb, per), minval=40.0, maxval=CANVAS[0] - 40.0)
    bg_boxes = _boxes_from_centers(bcx, bcy, side)
    bg_patches = _random_patch_blur(
        jax.random.fold_in(key, 98),
        _extract_batch(bg_imgs, bg_boxes, jnp.zeros((nb, per))),
        noise_amp=bg_noise)
    bg_patches = jnp.reshape(bg_patches, (nb * per, -1))

    n_mined = (int(nb * per * mined_frac)
               if (real_source is not None
                   and getattr(real_source, "num_mined", 0) > 0) else 0)
    if n_mined > 0:
        seed = int(jax.random.randint(jax.random.fold_in(key, 43),
                                      (), 0, 2 ** 31 - 1))
        hw = (geom.subimage_height, geom.subimage_width)
        mined = real_source.sample_mined_patches(seed, n_mined, hw)
        mined = _random_patch_blur(jax.random.fold_in(key, 97), mined,
                                   noise_amp=bg_noise)
        bg_patches = jnp.concatenate(
            [bg_patches, jnp.reshape(mined, (n_mined, -1))], axis=0)

    all_patches = jnp.concatenate([patches, bg_patches], axis=0)  # device
    all_cls = np.concatenate([cls,
                              np.full(nb * per + n_mined, num_classes - 1,
                                      np.int64)])
    avg_labels = np.linspace(0.0, 1.0, num_classes)
    out = _maybe_contrast(all_patches, contrast_normalize)
    if return_frac:
        frac_all = np.concatenate([np.asarray(frac).reshape(-1),
                                   np.ones(nb * per + n_mined)])
        return out, all_cls, avg_labels, frac_all
    return out, all_cls, avg_labels


def residual_dataset(key, num_faces: int, steps: int,
                     geom: NetGeometry, texture_noise: float = 0.0,
                     *, attr_cues: str = "v3",
                     dx_r: float = 2.5, dy_r: float = 3.0, ang_r: float = 8.0,
                     logscale_r: float = 0.10,
                     real_source=None, real_frac: float = 0.0,
                     contrast_normalize: bool = False):
    """Patches perturbed like POST-REFINEMENT residuals on true faces --
    used to calibrate the final Disc cutoff (trainer.calibrate_cutoff).
    Real faces join at ``real_frac`` so the calibrated gate admits them."""
    k_face, k_dx, k_dy, k_ang, k_s = jax.random.split(key, 5)
    imgs, attrs = _face_canvases(k_face, num_faces, 20.0,
                                 real_source, real_frac,
                                 attr_cues=attr_cues)
    F = attrs["face_size"]
    theta = attrs["angle"]
    fc_x = ((attrs["eye_l"][:, 0] + attrs["eye_r"][:, 0]) / 2.0
            + attrs["mouth"][:, 0]) / 2.0
    fc_y = ((attrs["eye_l"][:, 1] + attrs["eye_r"][:, 1]) / 2.0
            + attrs["mouth"][:, 1]) / 2.0
    M, T = num_faces, steps
    dx = jax.random.uniform(k_dx, (M, T), minval=-dx_r, maxval=dx_r)
    dy = jax.random.uniform(k_dy, (M, T), minval=-dy_r, maxval=dy_r)
    ang = jax.random.uniform(k_ang, (M, T), minval=-ang_r, maxval=ang_r)
    smp = DESIRED_SAMPLING * jnp.exp(
        jax.random.uniform(k_s, (M, T), minval=-logscale_r,
                           maxval=logscale_r))
    b = smp * F[:, None] / DESIRED_SAMPLING
    a = theta[:, None] - ang
    rad = jnp.deg2rad(a)
    off_x = dx * b / geom.regression_width
    off_y = dy * b / geom.regression_height
    cx = fc_x[:, None] + jnp.cos(rad) * off_x - jnp.sin(rad) * off_y
    cy = fc_y[:, None] + jnp.sin(rad) * off_x + jnp.cos(rad) * off_y
    boxes = _boxes_from_centers(cx, cy, b)
    patches = _random_patch_blur(jax.random.fold_in(key, 99),
                                 _extract_batch(imgs, boxes, a),
                                 noise_amp=texture_noise)
    return _maybe_contrast(jnp.reshape(patches, (M * T, -1)),
                           contrast_normalize)


def eye_dataset(key, num_faces: int, steps: int, geom: NetGeometry,
                texture_noise: float = 0.0,
                real_source=None, real_frac: float = 0.0,
                attr_cues: str = "v3"
                ) -> Tuple[np.ndarray, Dict[str, np.ndarray]]:
    """Eye-localization patches: 64x64 crops of eye boxes with the eye
    offset walking within +-10 label units.

    Label convention (must invert engine.eyes apply): reg = 10 units
    corresponds to an image offset of (10 / 2.3719) * box_w / 64 px; the
    label measures (box_center - eye) rotated into the patch frame.

    Real annotated faces join at ``real_frac`` (their eye annotations
    drive the same walks) -- without them the eye regressions saturate on
    photographs exactly like the pose nets did (docs/ROUND2_NOTES.md).
    """
    k_face, k_dx, k_dy, k_ang, k_w, k_lr = jax.random.split(key, 6)
    imgs, attrs = _face_canvases(k_face, num_faces, 20.0,
                                 real_source, real_frac,
                                 attr_cues=attr_cues)
    F = attrs["face_size"]
    theta = attrs["angle"]
    M, T = num_faces, steps

    # Nominal eye-box width from the detection geometry: for box side b = F,
    # box_w = F / (64 * 2 * 0.825) * (64 * 2.3719 / 2) (face_analysis.py:106).
    box_w = F / (2 * DESIRED_SAMPLING) * (EYE_SAMPLING / 2.0)
    box_w = box_w[:, None] * (1.0 + 0.08 * jax.random.normal(k_w, (M, 1)))

    # Pick left or right eye per face (both trained identically; the
    # reference's right-eye mirroring is disabled, face_analysis.py:1024-1031).
    use_left = jax.random.bernoulli(k_lr, shape=(M,))
    eye = jnp.where(use_left[:, None], attrs["eye_l"], attrs["eye_r"])

    lab_x = jax.random.uniform(k_dx, (M, T), minval=-10.0, maxval=10.0)
    lab_y = jax.random.uniform(k_dy, (M, T), minval=-10.0, maxval=10.0)
    # Extraction happens at the detector's face-angle estimate: true face
    # angle plus residual estimation error.
    err = jax.random.uniform(k_ang, (M, T), minval=-8.0, maxval=8.0)
    est = theta[:, None] + err

    # box_center = eye + R(-est) . (label/2.3719) * box_w / 64 -- the same
    # rotation engine.eyes applies when shifting boxes (roundtrip-tested).
    off_x = lab_x / EYE_SAMPLING * box_w / 64.0
    off_y = lab_y / EYE_SAMPLING * box_w / 64.0
    rad = jnp.deg2rad(-est)
    cxo = jnp.cos(rad) * off_x - jnp.sin(rad) * off_y
    cyo = jnp.sin(rad) * off_x + jnp.cos(rad) * off_y
    cx = eye[:, 0:1] + cxo
    cy = eye[:, 1:2] + cyo
    boxes = _boxes_from_centers(cx, cy, box_w * jnp.ones_like(cx))
    patches = _extract_batch(imgs, boxes, est)             # (M, T, 64, 64)
    patches = _random_patch_blur(jax.random.fold_in(key, 99), patches,
                                 noise_amp=texture_noise)
    flat = jnp.reshape(patches, (M * T, -1))
    flat = contrast_enhance_patches(flat, obj_avg=0.11, obj_std=0.15)

    labels = {"x": np.asarray(lab_x).reshape(-1),
              "y": np.asarray(lab_y).reshape(-1)}
    return flat, labels   # patches stay on device


# --- Z-frame (age/race/gender) constants, from estimate_age_race_gender
# (face_analysis.py:1180-1199): out (256, 260), sampling 1.14 * 160/96,
# translation ty = -6 / (160/96) sampled units.
Z_SIZE = (260, 256)                  # (H, W)
Z_FACE_SIZE = 75.0 / (2 * synth.EYE_X)   # inter-eye 75 px in the Z frame
AGE_SAMPLING = 1.14 * 160.0 / 96
AGE_TY = -6.0 / (160.0 / 96)


def age_patch_constants(subimage_hw=(96, 96)):
    """first_row/first_col/tx/ty for the Z-frame 96x96 extraction."""
    h, w = subimage_hw
    first_row = Z_SIZE[0] / 2.0 - h * AGE_SAMPLING / 2.0
    first_col = Z_SIZE[1] / 2.0 - w * AGE_SAMPLING / 2.0
    return first_row, first_col, 0.0, AGE_TY


def age_dataset(key, n: int, chunk: int = 256, jitter_px: float = 1.5,
                jitter_scale: float = 0.03, attr_cues: str = "v3",
                texture_noise: float = 0.0
                ) -> Tuple[np.ndarray, Dict[str, np.ndarray]]:
    """Z-frame 96x96 contrast-enhanced patches + age/race/gender labels.

    Renders in fixed-size chunks: the v2 renderer materializes several
    (chunk, 260, 256) float temporaries per canvas batch, so one 4000-wide
    vmap would blow HBM; chunks of 256 keep the peak under ~200 MB while
    only the (chunk, 96, 96) patches survive each step.
    """
    k_face, k_j = jax.random.split(key)
    cx = Z_SIZE[1] / 2.0 - 0.5
    cy = Z_SIZE[0] / 2.0 - 0.5
    jit_xy = jax.random.normal(k_j, (n, 3))

    def one(k, jxy):
        img, attrs = synth.render_face(
            k, canvas_hw=Z_SIZE,
            face_size=Z_FACE_SIZE * (1 + jitter_scale * jxy[2]),
            center=(cx + jitter_px * jxy[0], cy + jitter_px * jxy[1]),
            attr_cues=attr_cues)
        fr, fc, tx, ty = age_patch_constants()
        patch = extract_centered_patch(img, AGE_SAMPLING, fr, fc, tx, ty,
                                       (96, 96))
        return (patch[0], attrs["age"], attrs["race"], attrs["gender"])

    render = jax.jit(jax.vmap(one))
    keys = jax.random.split(k_face, -(-n // chunk) * chunk)
    parts, ages, races, genders = [], [], [], []
    for s in range(0, n, chunk):
        kc = keys[s:s + chunk]
        jc = jnp.pad(jit_xy[s:s + chunk],
                     ((0, chunk - min(chunk, n - s)), (0, 0)))
        p, a, r, g = render(kc, jc)
        take = min(chunk, n - s)
        parts.append(p[:take])
        ages.append(np.asarray(a[:take]))
        races.append(np.asarray(r[:take]))
        genders.append(np.asarray(g[:take]))
    patches = jnp.concatenate(parts, axis=0)
    if texture_noise > 0.0:
        # Texture injection only (no blur: the Z-frame stack already has
        # eye-jitter augmentation); see _random_patch_blur for the
        # domain-gap rationale.
        ka, kw = jax.random.split(jax.random.fold_in(key, 96))
        amp = jax.random.uniform(ka, (n, 1, 1)) * texture_noise
        white = jax.random.normal(kw, patches.shape)
        patches = jnp.clip(patches + amp * (white - _blur1(white)),
                           0.0, 1.0)
    flat = contrast_enhance_patches(
        jnp.reshape(patches, (n, -1)), obj_avg=0.0, obj_std=0.16)
    labels = {"age": np.concatenate(ages),
              "race": np.concatenate(races),
              "gender": np.concatenate(genders)}
    return flat, labels   # patches stay on device
