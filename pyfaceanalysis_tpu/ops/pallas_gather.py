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
  engine/cascade.py discard rules), so a fixed 128x256 tile always covers it.
- Per patch (one grid program each): DMA the tile HBM->VMEM, then perform
  the warp as an exact one-hot (nearest) or tent-weight (bilinear) MATMUL
  gather: out[o] = sum_l Wx[o,l] * (Wy @ tile)[o,l]. The separable
  row/column weight product reproduces nearest/bilinear sampling exactly for
  an arbitrary affine warp while running on the MXU instead of a scalar
  gather unit the TPU does not have.
- HBM memrefs are (8, 128)-tiled, so DMA origins must be 8-aligned
  (sublane) and 128-aligned (lane): origins are snapped DOWN to the tiling
  grid and the tile is 128 rows x 256 lanes so the patch stays covered
  after the snap (y slack 7 + extent 111 < 128; x slack 127 + 111 < 256).
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

TILE_H = 128   # tile rows; origin 8-aligned
TILE_W = 256   # tile lanes; origin 128-aligned
# Back-compat alias used by tests / size checks (the guaranteed-covered
# patch extent is governed by the 128-row dimension).
TILE = TILE_H


def _gather_kernel(levels_ref, oy_ref, ox_ref, rolls_ref, coeffs_ref,
                   pyr_ref, out_ref, tiles_ref, sems, *, oh: int, ow: int,
                   bilinear: bool, n_prog: int):
    # All scalar-prefetch operands are 1-D: SMEM pads every ROW of a 2-D
    # array to its allocation granule, which blows the 1MB SMEM budget.
    #
    # Two-slot DMA pipeline across grid steps: step p waits on the tile that
    # step p-1 prefetched and prefetches the tile for p+1 before computing,
    # so the HBM copy latency hides behind the sampling math (scratch
    # persists across sequential grid steps on TPU). One-copy-per-program
    # with start->wait in the same step serialized ~2-3us of DMA latency
    # into every patch.
    p = pl.program_id(0)

    def dma(q, slot):
        lev = levels_ref[q]
        # Origins are host-snapped onto the (8, 128) memref tiling grid; the
        # multiple_of hints let Mosaic prove the DMA slice is tile-aligned.
        oy = pl.multiple_of(oy_ref[q], 8)
        ox = pl.multiple_of(ox_ref[q], 128)
        return pltpu.make_async_copy(
            pyr_ref.at[lev, pl.ds(oy, TILE_H), pl.ds(ox, TILE_W)],
            tiles_ref.at[slot], sems.at[slot])

    @pl.when(p == 0)
    def _prologue():
        dma(0, 0).start()

    @pl.when(p + 1 < n_prog)
    def _prefetch():
        dma(p + 1, (p + 1) % 2).start()

    # The patch's x-window inside the 256-lane tile is rotated to lane 0 by
    # a dynamic roll (rolls_ref, host-computed; lx is already tile-rolled
    # relative), so only WIN=128 lanes participate in the weights and the
    # sampling product -- half the VPU weight work and half the MXU product
    # of the full-tile formulation.
    WIN = TILE_H
    dma(p, p % 2).wait()
    tile = pltpu.roll(tiles_ref[p % 2], -rolls_ref[p], axis=1)[:, :WIN]
    tile16 = tile.astype(jnp.bfloat16)
    c = [coeffs_ref[6 * p + k] for k in range(6)]

    # The sampling product runs in OUTPUT-PIXEL CHUNKS of CH rows: the
    # monolithic (oh*ow, TILE_H) weight build needed ~14 MB of scoped VMEM
    # for its temporaries, which stalled the whole pipeline on allocation
    # pressure -- measured 8.1 us/patch monolithic vs 2.8 us/patch chunked
    # (identical output). Chunking bounds live temporaries to ~0.5 MB each.
    rows_ch = max(1, 1024 // ow)     # whole output rows per chunk
    row_starts = list(range(0, oh, rows_ch))
    for r0 in row_starts:
        rows = min(rows_ch, oh - r0)  # final chunk may be partial
        CH = rows * ow
        # Tile-relative continuous level coordinates of the chunk's output
        # pixels: lx = Ax*(j+.5) + Bx*(i+.5) + Cx (linear in the output
        # grid; coefficients computed host-side, prefetched via SMEM).
        # Built directly in the flattened (CH, 1) layout -- Mosaic does
        # not lower a (rows, ow) -> (CH, 1) shape cast.
        o = jax.lax.broadcasted_iota(jnp.int32, (CH, 1), 0)
        ii = (o // ow).astype(jnp.float32) + (float(r0) + 0.5)
        jj = (o % ow).astype(jnp.float32) + 0.5
        lane_h = jax.lax.broadcasted_iota(
            jnp.int32, (CH, TILE_H), 1).astype(jnp.float32)
        lane_w = jax.lax.broadcasted_iota(
            jnp.int32, (CH, WIN), 1).astype(jnp.float32)
        lx = c[0] * jj + c[1] * ii + c[2]
        ly = c[3] * jj + c[4] * ii + c[5]
        if bilinear:
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(ly - lane_h))
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(lx - lane_w))
        else:
            wy = (jnp.round(ly) == lane_h).astype(jnp.float32)
            wx = (jnp.round(lx) == lane_w).astype(jnp.float32)
        # bf16 MXU for the dominant (CH, TILE_H) @ (TILE_H, WIN) product
        # (2x f32 rate). Nearest one-hot weights are exact in bf16; tile
        # texels round to ~0.2% -- below the uint8 quantization the canvas
        # came from. Accumulation stays f32.
        g = jnp.dot(wy.astype(jnp.bfloat16), tile16,
                    preferred_element_type=jnp.float32)
        # Output as (rows, ow) ROWS: a (CH, 1) column output tiles as
        # (8, 128) vregs with one useful lane -- every downstream reader
        # then pays 128x the bandwidth (measured 1.4 ms per consumer
        # fusion).
        out_ref[0, r0:r0 + rows, :] = (
            jnp.sum(g * wx, axis=1).reshape(rows, ow))


def _snap_down(v, m):
    return (v // m) * m


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
        pyramid: (L, lh, lw) float32 levels; lh % 8 == 0, lh >= 128,
            lw % 128 == 0, lw >= 256 (DMA tiling alignment, see module doc).
        scales: (L,) float32 ladder scales (level texel = s canvas pixels).
        levels: (B,) int32 level index per patch.
        boxes/angles: as in extract_patches_rotate.
        method: "nearest" or "bilinear" (in LEVEL space).

    Returns (B, oh, ow) float32 patches.
    """
    L, lh, lw = pyramid.shape
    if lh < TILE_H or lw < TILE_W or lh % 8 or lw % 128:
        raise ValueError(
            f"pyramid levels {lh}x{lw} must be >= {TILE_H}x{TILE_W} and "
            f"(8, 128)-aligned")
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

    # Tile origin: cover the patch center, snapped DOWN onto the (8, 128)
    # memref tiling grid (the x tile is 256 wide so the <=127 snap plus the
    # <=56-texel patch half-extent still fit).
    lcx = jnp.round(cx / s_k - 0.5).astype(jnp.int32)
    lcy = jnp.round(cy / s_k - 0.5).astype(jnp.int32)
    oxi = _snap_down(jnp.clip(lcx - 56, 0, lw - TILE_W), 128)
    oyi = _snap_down(jnp.clip(lcy - 56, 0, lh - TILE_H), 8)

    # The patch's x-extent starts at up to snap-slack + clip lanes into the
    # 256-lane tile; the kernel rolls it to lane 0 so the sampling window is
    # 128 lanes. Out-of-level samples keep zero weights: their rolled lx
    # falls outside [0, 128) exactly as the unrolled lx fell outside the
    # level extent (levels are zero-padded, so any wrapped texel a valid
    # sample could touch is a true texel).
    # 4 texels of left margin inside the 128-lane window: the worst-case
    # half-extent (55.6 texels at max scale drift + 0.5 center rounding)
    # touches 56.1, and a window starting exactly at lcx-56 would zero
    # boundary samples the 256-lane formulation kept.
    rolls = jnp.maximum(lcx - 60 - oxi, 0)

    # us(i,j) = cx + co*(x0 - cx + fx*bw) - si*(y0 - cy + fy*bh) with
    # fx = (j+.5)/ow (ops/patches.py math); level x = us/s_k - 0.5 - ox -
    # roll (the roll moves the window to lane 0).
    oxf = (oxi + rolls).astype(jnp.float32)
    oyf = oyi.astype(jnp.float32)
    ax = co * bw / (ow * s_k)
    bx = -si * bh / (oh * s_k)
    cx0 = (cx + co * (x0 - cx) - si * (y0 - cy)) / s_k - 0.5 - oxf
    ay = si * bw / (ow * s_k)
    by = co * bh / (oh * s_k)
    cy0 = (cy + si * (x0 - cx) + co * (y0 - cy)) / s_k - 0.5 - oyf
    coeffs = jnp.stack([ax, bx, cx0, ay, by, cy0], axis=1).reshape(-1)

    B = boxes.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(B,),
        in_specs=[
            # The pyramid must STAY in HBM (a 1000px-canvas pyramid is ~17MB,
            # over VMEM) -- tiles are DMA'd per patch inside the kernel.
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((1, oh, ow), lambda p, *_: (p, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, TILE_H, TILE_W), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kern = functools.partial(_gather_kernel, oh=oh, ow=ow,
                             bilinear=(method == "bilinear"), n_prog=B)
    flat = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, oh, ow), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(levels, oyi, oxi, rolls, coeffs, pyramid.astype(jnp.float32))
    return flat.reshape(B, oh, ow)


def gather_flops(n_patches: int, oh: int = 64, ow: int = 64) -> int:
    """Analytic MXU FLOPs of the kernel (the one-hot matmul dominates)."""
    return 2 * n_patches * oh * ow * TILE_H * (TILE_W // TILE_H + 1)
