"""Pallas TPU kernel: rotated patch sampling from the scale pyramid.

The measured hot op of the detection path is the rotated patch gather
(reference semantics: ``cuicuilco.image_loader.extract_subimages_rotate``,
consumed at face_analysis.py:781) -- XLA lowers the random-access gather of
ops.patches.extract_patches_rotate to scalar loads, far from roofline.

TPU-native design (this kernel):

- Source from the SCALE PYRAMID (ops.pyramid) instead of the full-resolution
  canvas: each patch reads from its own grid level, where its box spans at
  most ~111 level texels even after the cascade's scale/angle refinement
  (scale drift is gated to (maxs/0.825)*1.1 = 1.31x and |angle| <= 24.75 deg,
  engine/cascade.py discard rules), so a fixed 128x128 tile always covers it.
- Per patch (one grid program each): DMA the 128x128 tile HBM->VMEM, then
  perform the warp as an exact one-hot (nearest) or tent-weight (bilinear)
  MATMUL gather: out[o] = sum_l Wx[o,l] * (Wy @ tile)[o,l]. The separable
  row/column weight product reproduces nearest/bilinear sampling exactly for
  an arbitrary affine warp while running on the MXU instead of a scalar
  gather unit the TPU does not have.
- Out-of-tile / out-of-level samples produce all-zero weight rows, matching
  the zero-fill of the reference's PIL path (rotate fills black).

Numerical note: sampling level texels (which are themselves nearest-resampled
canvas pixels) quantizes sample positions to one LEVEL pixel instead of one
canvas pixel -- the same order of jitter as the iter-0 grid snap
(engine/cascade.py make_grid_state) and covered by the training-time
aliasing/blur domain randomization (training/datasets).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128  # level-space tile side; fits any gated refinement box (see above)


def _gather_kernel(levels_ref, origins_ref, coeffs_ref, pyr_ref, out_ref,
                   tile_ref, sem, *, oh: int, ow: int, bilinear: bool):
    p = pl.program_id(0)
    lev = levels_ref[p]
    oy = origins_ref[p, 0]
    ox = origins_ref[p, 1]
    dma = pltpu.make_async_copy(
        pyr_ref.at[lev, pl.ds(oy, TILE), pl.ds(ox, TILE)], tile_ref, sem)
    dma.start()

    # Tile-relative continuous level coordinates of every output pixel:
    # lx = Ax*(j+.5) + Bx*(i+.5) + Cx (linear in the output grid; coefficients
    # computed host-side in sample_patches_pyramid, prefetched via SMEM).
    jj = jax.lax.broadcasted_iota(jnp.float32, (oh, ow), 1) + 0.5
    ii = jax.lax.broadcasted_iota(jnp.float32, (oh, ow), 0) + 0.5
    lx = (coeffs_ref[p, 0] * jj + coeffs_ref[p, 1] * ii
          + coeffs_ref[p, 2]).reshape(oh * ow, 1)
    ly = (coeffs_ref[p, 3] * jj + coeffs_ref[p, 4] * ii
          + coeffs_ref[p, 5]).reshape(oh * ow, 1)

    lane = jax.lax.broadcasted_iota(jnp.float32, (oh * ow, TILE), 1)
    if bilinear:
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(ly - lane))
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(lx - lane))
    else:
        wy = (jnp.round(ly) == lane).astype(jnp.float32)
        wx = (jnp.round(lx) == lane).astype(jnp.float32)

    dma.wait()
    g = jnp.dot(wy, tile_ref[:], preferred_element_type=jnp.float32)
    out_ref[0] = jnp.sum(g * wx, axis=1).reshape(oh, ow)


@functools.partial(jax.jit,
                   static_argnames=("out_hw", "method", "interpret"))
def sample_patches_pyramid(pyramid: jax.Array, scales: jax.Array,
                           levels: jax.Array, boxes: jax.Array,
                           angles: jax.Array,
                           out_hw: Tuple[int, int] = (64, 64),
                           method: str = "nearest",
                           interpret: bool = False) -> jax.Array:
    """Extracts B rotated patches, each from its own pyramid level.

    Semantics match ops.patches.extract_patches_rotate (canvas-space
    ``boxes`` [x0, y0, x1, y1] inclusive, ``angles`` in degrees sampling the
    patch rotated CCW), except samples are read from pyramid level
    ``levels[b]`` (canvas coordinate u <-> level coordinate u/s - 0.5 per
    ops.pyramid.build_pyramid).

    Args:
        pyramid: (L, lh, lw) float32 levels, lh/lw >= TILE.
        scales: (L,) float32 ladder scales (level texel = s canvas pixels).
        levels: (B,) int32 level index per patch.
        boxes/angles: as in extract_patches_rotate.
        method: "nearest" or "bilinear" (in LEVEL space).

    Returns (B, oh, ow) float32 patches.
    """
    L, lh, lw = pyramid.shape
    if lh < TILE or lw < TILE:
        raise ValueError(f"pyramid levels {lh}x{lw} smaller than {TILE}")
    oh, ow = out_hw
    levels = levels.astype(jnp.int32)
    s_k = scales.astype(jnp.float32)[levels]

    x0, y0, x1, y1 = (boxes[:, i].astype(jnp.float32) for i in range(4))
    bw = x1 + 1.0 - x0
    bh = y1 + 1.0 - y0
    cx = x0 + bw * 0.5
    cy = y0 + bh * 0.5
    rad = jnp.deg2rad(angles).astype(jnp.float32)
    co = jnp.cos(rad)
    si = jnp.sin(rad)

    # Tile origin: center the tile on the patch center (level coords).
    lcx = cx / s_k - 0.5
    lcy = cy / s_k - 0.5
    oxf = jnp.clip(jnp.round(lcx) - TILE // 2, 0, lw - TILE)
    oyf = jnp.clip(jnp.round(lcy) - TILE // 2, 0, lh - TILE)
    origins = jnp.stack([oyf, oxf], axis=1).astype(jnp.int32)

    # us(i,j) = cx + co*(x0 - cx + fx*bw) - si*(y0 - cy + fy*bh) with
    # fx = (j+.5)/ow (ops/patches.py math); level x = us/s_k - 0.5 - ox.
    ax = co * bw / (ow * s_k)
    bx = -si * bh / (oh * s_k)
    cx0 = (cx + co * (x0 - cx) - si * (y0 - cy)) / s_k - 0.5 - oxf
    ay = si * bw / (ow * s_k)
    by = co * bh / (oh * s_k)
    cy0 = (cy + si * (x0 - cx) + co * (y0 - cy)) / s_k - 0.5 - oyf
    coeffs = jnp.stack([ax, bx, cx0, ay, by, cy0], axis=1)

    B = boxes.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, oh, ow), lambda p, lv, og, cf: (p, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((TILE, TILE), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kern = functools.partial(_gather_kernel, oh=oh, ow=ow,
                             bilinear=(method == "bilinear"))
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, oh, ow), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(levels, origins, coeffs, pyramid.astype(jnp.float32))


def gather_flops(n_patches: int, oh: int = 64, ow: int = 64) -> int:
    """Analytic MXU FLOPs of the kernel (the one-hot matmul dominates)."""
    return 2 * n_patches * oh * ow * TILE
