"""Scale-ladder image pyramid + aligned crop extraction.

The iter-0 grid patches are axis-aligned, unrotated windows at the ladder
scales (engine.grid). Sampling them as rotated gathers costs ~8M random HBM
lookups per pass; a pyramid turns them into contiguous 64x64 crops:

- ``build_pyramid``: one nearest-resize gather per ladder scale (a few
  hundred K points TOTAL), stacked into an (L, lh, lw) tensor.
- ``crop_patches``: vmapped ``dynamic_slice`` -- measured ~6x faster than
  the rotated gather for 2048 windows on a v5e chip.

Grid positions are SNAPPED to integer level pixels (at most half a level
pixel, i.e. half a patch pixel, of grid jitter -- far below the grid spacing
and irrelevant to labels because the snapped box is what enters the cascade
state). Later rounds (moved/rotated boxes) and eye patches keep the general
rotated-gather path at the compacted batch size.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("scales", "level_hw"))
def build_pyramid(image: jax.Array, scales: Tuple[float, ...],
                  level_hw: Tuple[int, int]) -> jax.Array:
    """(H, W) image -> (L, lh, lw) nearest-resized levels.

    Level k holds the image at 1/scales[k] resolution in its top-left
    corner (one level pixel = scales[k] source pixels; sampling at pixel
    centers, matching ops.patches nearest semantics). Out-of-image texels
    are 0.

    Perf notes (this op was 40% of detect device time as a naive 2-D
    gather over the full (lh, lw) canvas per level): each level now
    samples only its true extent (ceil(dim / s) texels -- the sum over the
    ladder is ~1.3x the image, not L x canvas), and the nearest resample is
    SEPARABLE: one row take (contiguous DMA rows) + one column take,
    instead of lh*lw random 2-D lookups. The result is placed into the
    fixed canvas with a static pad so shapes stay compile-constant.
    """
    H, W = image.shape
    lh, lw = level_hw
    levels = []
    for s in scales:
        hk = min(lh, max(1, int(-(-H // s))))      # ceil(H / s), capped
        wk = min(lw, max(1, int(-(-W // s))))
        sy = jnp.round((jnp.arange(hk, dtype=jnp.float32) + 0.5) * s
                       - 0.5).astype(jnp.int32)
        sx = jnp.round((jnp.arange(wk, dtype=jnp.float32) + 0.5) * s
                       - 0.5).astype(jnp.int32)
        oky = (sy >= 0) & (sy < H)
        okx = (sx >= 0) & (sx < W)
        rows = jnp.take(image, jnp.clip(sy, 0, H - 1), axis=0)   # (hk, W)
        lvl = jnp.take(rows, jnp.clip(sx, 0, W - 1), axis=1)     # (hk, wk)
        lvl = jnp.where(oky[:, None] & okx[None], lvl, 0.0)
        levels.append(jnp.pad(lvl, ((0, lh - hk), (0, lw - wk))))
    return jnp.stack(levels)


@partial(jax.jit, static_argnames=("scales", "level_hw"))
def build_pyramid_batch(images: jax.Array, scales: Tuple[float, ...],
                        level_hw: Tuple[int, int]) -> jax.Array:
    """(B, H, W) image stack -> (B*L, lh, lw) image-major stacked pyramid.

    Image b's levels occupy rows [b*L, (b+1)*L) -- the layout the fused
    multi-image cascade's folded crop levels index
    (engine.cascade.make_batched_grid_state). One program for the whole
    batch: on a tunneled device link, B separate build_pyramid dispatches
    cost milliseconds of round-trips each; this is one."""
    B = images.shape[0]
    L = len(scales)
    lh, lw = level_hw
    stacked = jax.vmap(lambda im: build_pyramid(im, scales, level_hw))(images)
    return stacked.reshape(B * L, lh, lw)


@partial(jax.jit, static_argnames=("patch_hw",))
def crop_patches(pyramid: jax.Array, crops: jax.Array,
                 patch_hw: Tuple[int, int] = (64, 64)) -> jax.Array:
    """crops: (B, 3) int32 [level, y, x] -> (B, h, w) contiguous crops."""
    h, w = patch_hw

    def one(c):
        return jax.lax.dynamic_slice(pyramid, (c[0], c[1], c[2]), (1, h, w))[0]

    return jax.vmap(one)(crops)
