"""Batched rotated patch extraction -- the image-frontend hot op.

TPU-native replacement for ``cuicuilco.image_loader.extract_subimages_rotate``
(consumed at face_analysis.py:781, :1042; FaceDetectUpdated.py:935): for each
box, rotate the image by ``-angle`` about the box center, crop the (subpixel)
box, and resize to ``(h, w)``.

Instead of PIL per-patch warps on CPU, all patches are sampled in one fused
gather: the (B, h, w) output grid is mapped through the inverse rotation to
source coordinates, and the image -- resident in HBM/VMEM -- is gathered with
nearest or bilinear filtering. Out-of-image samples are filled with 0 to
match PIL's black fill.

Coordinate convention (self-consistent across training and inference, see
module docstring of ops/contrast.py for why exact PIL parity is not required):
boxes are ``[x0, y0, x1, y1]`` with x1/y1 INCLUSIVE (the reference builds
boxes as ``posX + patch_width - 1``, face_analysis.py:661-669), so the
sampled extent is ``[x0, x1 + 1)``. Output pixel (i, j) samples the source at
the extent-mapped pixel center, rotated about the extent center.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("out_hw", "method"))
def extract_patches_rotate(image: jax.Array, boxes: jax.Array,
                           angles: jax.Array,
                           out_hw: Tuple[int, int] = (64, 64),
                           method: str = "bilinear",
                           image_idx: jax.Array = None) -> jax.Array:
    """Extracts B rotated patches from one image, or from a STACK of images
    with a per-box image index (the reference's
    ``extract_subimages_rotate(images, indices, ...)`` API).

    Args:
        image: (H, W) float array in [0, 1], or (N, H, W) with ``image_idx``.
        boxes: (B, 4) [x0, y0, x1, y1] subpixel boxes, x1/y1 inclusive.
        angles: (B,) in-plane angles in DEGREES. A positive angle samples the
            patch rotated counter-clockwise in image coordinates, matching the
            reference's ``extract_subimages_rotate(..., -1 * curr_angles, ...)``
            call convention: callers pass the face angle directly and this
            function applies the inverse warp.
        out_hw: output (height, width).
        method: "bilinear" or "nearest".
        image_idx: (B,) int32 image index per box (required iff image is 3D).

    Returns:
        (B, h, w) float32 patches; samples outside the image are 0.
    """
    if image.ndim == 3:
        N, H, W = image.shape
        base = image_idx.astype(jnp.int32) * (H * W)
    else:
        H, W = image.shape
        base = None
    oh, ow = out_hw
    image = image.astype(jnp.float32).reshape(-1)

    x0, y0, x1, y1 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    bw = x1 + 1.0 - x0
    bh = y1 + 1.0 - y0
    cx = x0 + bw * 0.5
    cy = y0 + bh * 0.5

    fx = (jnp.arange(ow, dtype=jnp.float32) + 0.5) / ow   # (ow,)
    fy = (jnp.arange(oh, dtype=jnp.float32) + 0.5) / oh   # (oh,)
    # Output-grid source positions before rotation: (B, oh, ow)
    u = x0[:, None, None] + fx[None, None, :] * bw[:, None, None]
    v = y0[:, None, None] + fy[None, :, None] * bh[:, None, None]

    rad = jnp.deg2rad(angles).astype(jnp.float32)
    c = jnp.cos(rad)[:, None, None]
    s = jnp.sin(rad)[:, None, None]
    du = u - cx[:, None, None]
    dv = v - cy[:, None, None]
    us = cx[:, None, None] + c * du - s * dv
    vs = cy[:, None, None] + s * du + c * dv

    # Continuous pixel-center coordinates.
    px = us - 0.5
    py = vs - 0.5

    def flat_idx(iy, ix):
        idx = jnp.clip(iy, 0, H - 1) * W + jnp.clip(ix, 0, W - 1)
        if base is not None:
            idx = idx + base[:, None, None]
        return idx

    if method == "nearest":
        ix = jnp.round(px).astype(jnp.int32)
        iy = jnp.round(py).astype(jnp.int32)
        inb = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
        vals = jnp.take(image, flat_idx(iy, ix), axis=0)
        return jnp.where(inb, vals, 0.0)

    ix0 = jnp.floor(px)
    iy0 = jnp.floor(py)
    tx = px - ix0
    ty = py - iy0
    ix0 = ix0.astype(jnp.int32)
    iy0 = iy0.astype(jnp.int32)

    def tap(iy, ix):
        inb = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
        return jnp.where(inb, jnp.take(image, flat_idx(iy, ix), axis=0), 0.0)

    v00 = tap(iy0, ix0)
    v01 = tap(iy0, ix0 + 1)
    v10 = tap(iy0 + 1, ix0)
    v11 = tap(iy0 + 1, ix0 + 1)
    top = v00 * (1.0 - tx) + v01 * tx
    bot = v10 * (1.0 - tx) + v11 * tx
    return top * (1.0 - ty) + bot * ty


@functools.partial(jax.jit, static_argnames=("out_hw",))
def extract_centered_patch(image: jax.Array, sampling: float,
                           first_row: jax.Array, first_col: jax.Array,
                           trans_x: jax.Array, trans_y: jax.Array,
                           out_hw: Tuple[int, int] = (96, 96)) -> jax.Array:
    """Axis-aligned sampled crop, the ``load_image_data_monoprocessor``
    equivalent of the age path (face_analysis.py:1231-1247).

    Box origin is ``(first_col + trans_x * sampling, first_row + trans_y *
    sampling)`` (translations are in subimage units, ``trans_sampled=True``),
    spanning ``out * sampling`` source pixels.

    Returns (1, h, w).
    """
    oh, ow = out_hw
    x0 = first_col + trans_x * sampling
    y0 = first_row + trans_y * sampling
    boxes = jnp.stack([x0, y0, x0 + ow * sampling - 1.0,
                       y0 + oh * sampling - 1.0])[None, :]
    return extract_patches_rotate(image, boxes, jnp.zeros((1,)), out_hw,
                                  method="bilinear")
