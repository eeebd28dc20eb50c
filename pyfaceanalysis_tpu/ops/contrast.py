"""Per-patch contrast normalization.

Two variants used by the reference:

1. ``image_array_contrast_normalize_avg_std`` (face_analysis.py:318-330):
   per-row recentering to a target mean/std with clipping to [0, 255]; the
   detection path calls it with (137.5, 0.40*255) when enabled
   (face_analysis.py:793).
2. ``contrast_enhance="AgeContrastEnhancement_Avg_Std"`` with
   ``obj_avg/obj_std`` applied inside cuicuilco's patch extractor for the eye
   (0.11 / 0.15, face_analysis.py:1042-1045) and age (0.0 / 0.16,
   face_analysis.py:1190-1247) paths. cuicuilco is not vendored; our
   TPU-native definition normalizes each patch to zero mean / unit std and
   maps it to ``obj_avg + obj_std * z`` in [0, 1] pixel units WITHOUT
   clipping. Because this framework trains its own networks with the same
   transform, the convention is self-consistent end to end.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def contrast_normalize_avg_std(patches, mean=137.5, std=0.40 * 255.0,
                               clip_max=255.0):
    """Row-wise mean/std normalization with clipping, [0, 255] pixel units.

    Exact port of face_analysis.py:318-330 (note the reference divides by
    ``row_std / std + 1e-8``, i.e. the epsilon guards the *ratio*).
    """
    p = jnp.asarray(patches)
    flat = p.reshape(p.shape[0], -1)
    row_mean = flat.mean(axis=1, keepdims=True)
    row_std = flat.std(axis=1, keepdims=True)
    out = (flat - row_mean) / (row_std / std + 1e-8) + mean
    out = jnp.clip(out, 0.0, clip_max)
    return out.reshape(p.shape)


def contrast_enhance_patches(patches, obj_avg=0.0, obj_std=0.2):
    """"AgeContrastEnhancement_Avg_Std" equivalent in [0, 1] pixel units.

    Per patch: z-score then rescale to mean ``obj_avg`` / std ``obj_std``.
    No clipping (features feed straight into the SFA flow).
    """
    p = jnp.asarray(patches)
    flat = p.reshape(p.shape[0], -1)
    row_mean = flat.mean(axis=1, keepdims=True)
    row_std = flat.std(axis=1, keepdims=True)
    out = (flat - row_mean) / (row_std + _EPS) * obj_std + obj_avg
    return out.reshape(p.shape)
