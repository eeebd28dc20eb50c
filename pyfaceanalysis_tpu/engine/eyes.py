"""Eye localization sub-cascade.

Reference: ``find_Left_Right_eyes`` (face_analysis.py:1036-1109). Per
surviving face box: approximate eye boxes from the face geometry, extract
contrast-enhanced 64x64 eye patches, run the EyeLX / EyeLY networks, and
shift the eye boxes by the (rotation-corrected) regression output; flag
faces whose raw |reg| >= 9.0 as "too far" (discarded by the driver,
FaceDetectUpdated.py:1014-1019).

Notes reproduced from the reference:
- BOTH eyes run the left-eye path: the horizontal mirroring in
  ``find_Right_eyes`` is effectively disabled (the swapped box is discarded;
  face_analysis.py:1024-1031), so we batch L and R together (2N patches, one
  network execution -- the reference executes the same flow twice).
- EyeLX and EyeLY name the SAME network artifact in the pipeline; features
  are computed once and fed to both classifiers.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from pyfaceanalysis_tpu.config import EYE_SAMPLING, DetectorConfig
from pyfaceanalysis_tpu.models.network import apply_network
from pyfaceanalysis_tpu.ops.contrast import contrast_enhance_patches
from pyfaceanalysis_tpu.ops.patches import extract_patches_rotate


def _eye_levels(scales: jax.Array, box_w: jax.Array
                ) -> Tuple[jax.Array, jax.Array]:
    """Pyramid level per eye box: the FINEST level whose texel pitch keeps
    the rotated box extent inside the gather kernel's 128-row tile.  The
    angle gate bounds |angle| <= 24.75 deg, so the rotated extent is at
    most box_w * (cos + sin)(24.75 deg) = box_w * 1.327 <= 111 * s_k
    =>  s_k >= box_w / 83.6; we use /80 for slack (worst case 106 of the
    111-texel budget).  Boxes needing s < 1 hit the appended NATIVE level
    (scale 1.0), where nearest sampling is bit-identical to sampling the
    image directly.

    Returns ``(levels, no_cover)`` where ``no_cover`` marks boxes too wide
    for even the coarsest level -- the caller must route those through the
    XLA gather (sampling them at the coarsest level would zero-fill texels
    outside the tile; ADVICE r2)."""
    need = box_w / 80.0
    cand = jnp.where(scales[None, :] >= need[:, None], scales[None, :],
                     jnp.inf)
    idx = jnp.argmin(cand, axis=1)
    no_cover = jnp.isinf(cand.min(axis=1))
    levels = jnp.where(no_cover, jnp.argmax(scales), idx).astype(jnp.int32)
    return levels, no_cover


@partial(jax.jit, static_argnames=("specs", "dim_x", "dim_y", "patch_hw",
                                   "n_base_levels"))
def localize_eyes(specs, dim_x: int, dim_y: int, patch_hw: Tuple[int, int],
                  image: jax.Array, net_params, clf_x, clf_y,
                  eye_boxes: jax.Array, angles: jax.Array,
                  pyramid: jax.Array = None, pyr_scales: jax.Array = None,
                  image_idx: jax.Array = None, n_base_levels: int = 0
                  ) -> Tuple[jax.Array, jax.Array]:
    """One batched eye-localization pass.

    Args:
        eye_boxes: (B, 4) approximate eye boxes (either eye; L/R batched).
        angles: (B,) face angles in degrees.
        pyramid/pyr_scales: when given (and the platform is TPU), eye
            patches are sampled by the Pallas pyramid kernel with per-box
            level selection instead of the XLA image gather -- the gather
            was the single hottest op of the fused detect program (~15 ms
            for 512 eye patches from a 1000px canvas).
        image_idx/n_base_levels: fused multi-image batch -- ``image`` is a
            (B, H, W) stack, ``image_idx`` the per-box image, ``pyramid``
            the stacked per-image pyramids (B * n_base_levels levels) with
            ``pyr_scales`` the single-image ladder TILED B times; level
            selection runs on the base ladder and is folded per box
            (level' = img * n_base_levels + level).

    Returns:
        (new_boxes (B, 4), max_reg (B,) = max(|reg_x|, |reg_y|)).
        Callers apply the "too far" gate as max_reg >= tolerance_xy_eye
        (face_analysis.py:1073) -- returning the magnitude instead of the
        boolean lets diagnosis tools sweep the gate without re-running.
    """
    h, w = patch_hw
    # NEAREST like every reference extraction (interpolation_formats default,
    # FaceDetectUpdated.py:125) -- and ~3.5x cheaper than bilinear gathers.
    if pyramid is not None and jax.default_backend() == "tpu":
        from pyfaceanalysis_tpu.ops.pallas_gather import (
            sample_patches_pyramid,
        )
        bw = jnp.abs(eye_boxes[:, 2] - eye_boxes[:, 0]) + 1.0
        if image_idx is not None and n_base_levels > 0:
            base_scales = pyr_scales[:n_base_levels]
            levels, no_cover = _eye_levels(base_scales, bw)
            levels = levels + image_idx.astype(jnp.int32) * n_base_levels
        else:
            levels, no_cover = _eye_levels(pyr_scales, bw)
        patches = sample_patches_pyramid(pyramid, pyr_scales, levels,
                                         eye_boxes, angles, patch_hw,
                                         method="nearest")
        # Rare: a box wider than the coarsest level's tile budget would be
        # zero-filled by the kernel; re-sample the whole batch through the
        # XLA gather and keep it only for the offending rows. lax.cond
        # keeps the expensive branch off the hot path at runtime.
        patches = jax.lax.cond(
            jnp.any(no_cover),
            lambda p: jnp.where(
                no_cover[:, None, None],
                extract_patches_rotate(image, eye_boxes, angles, patch_hw,
                                       method="nearest",
                                       image_idx=image_idx), p),
            lambda p: p, patches)
    else:
        patches = extract_patches_rotate(image, eye_boxes, angles, patch_hw,
                                         method="nearest",
                                         image_idx=image_idx)
    flat = patches.reshape(patches.shape[0], -1)
    flat = contrast_enhance_patches(flat, obj_avg=0.11, obj_std=0.15)
    sl = apply_network(specs, net_params, flat)
    reg_x = clf_x.regression(sl[:, :dim_x])
    reg_y = clf_y.regression(sl[:, :dim_y])
    max_reg = jnp.maximum(jnp.abs(reg_x), jnp.abs(reg_y))

    box_w = jnp.abs(eye_boxes[:, 2] - eye_boxes[:, 0])
    box_h = jnp.abs(eye_boxes[:, 3] - eye_boxes[:, 1])
    off_x = (reg_x / EYE_SAMPLING) * box_w / w
    off_y = (reg_y / EYE_SAMPLING) * box_h / h
    # Rotate the patch-frame offset into the image frame
    # (face_analysis.py:1096-1104 with factor = 1).
    rad = -jnp.deg2rad(angles)
    dx = off_x * jnp.cos(rad) - off_y * jnp.sin(rad)
    dy = off_y * jnp.cos(rad) + off_x * jnp.sin(rad)
    new_boxes = jnp.stack([eye_boxes[:, 0] - dx, eye_boxes[:, 1] - dy,
                           eye_boxes[:, 2] - dx, eye_boxes[:, 3] - dy], axis=1)
    return new_boxes, max_reg
