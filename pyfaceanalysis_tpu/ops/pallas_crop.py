"""Pallas TPU kernel: batched axis-aligned crops from the scale pyramid.

The iter-0 grid extraction (ops.pyramid.crop_patches) as 2048 vmapped
``lax.dynamic_slice`` ops lowers to a sequential while loop of per-patch
update-slices (~6 ms/image on a v5e -- each tiny slice pays full dispatch
latency inside the loop). This kernel replaces it with, per patch:

- one (72, 256) tile DMA whose origin sits on the (8, 128) HBM memref
  tiling grid (y snapped down by <= 7 rows, x by <= 127 lanes; the extra
  extent keeps the 64x64 window covered after snapping), two-slot
  pipelined across grid steps so copy latency hides behind compute;
- two dynamic ROLLS (``pltpu.roll``) that shift the window residue
  (dy, dx) to the tile origin -- no gathers, no matmuls, pure lane/sublane
  rotation on the VPU;
- a static (64, 64) corner copy to the output block.

Crops must lie inside their level (guaranteed by engine.cascade
make_grid_state, which falls back to the rotated gather otherwise).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CTILE_H = 72    # 64 + up to 7 rows of y-snap residue, 8-aligned
CTILE_W = 256   # 64 + up to 127 lanes of x-snap residue, 128-aligned


def _crop_kernel(levels_ref, oy_ref, ox_ref, dy_ref, dx_ref, pyr_ref,
                 out_ref, tiles_ref, sems, *, oh: int, ow: int, n_prog: int):
    p = pl.program_id(0)

    def dma(q, slot):
        lev = levels_ref[q]
        oy = pl.multiple_of(oy_ref[q], 8)
        ox = pl.multiple_of(ox_ref[q], 128)
        return pltpu.make_async_copy(
            pyr_ref.at[lev, pl.ds(oy, CTILE_H), pl.ds(ox, CTILE_W)],
            tiles_ref.at[slot], sems.at[slot])

    @pl.when(p == 0)
    def _prologue():
        dma(0, 0).start()

    @pl.when(p + 1 < n_prog)
    def _prefetch():
        dma(p + 1, (p + 1) % 2).start()

    dma(p, p % 2).wait()
    tile = tiles_ref[p % 2]
    # Lane shift: dynamic roll (axis=1 lowers correctly). Sublane shift:
    # pltpu.roll with a DYNAMIC shift on axis=0 is miscompiled on v5e
    # (verified: static/zero shifts fine, any dynamic sublane shift wrong;
    # interpret mode correct) -- use an exact one-hot row-selection matmul
    # instead (f32, (oh, CTILE_H) @ (CTILE_H, ow): ~0.1 ms for a full
    # 2048-window grid).
    shifted = pltpu.roll(tile, -dx_ref[p], axis=1)[:, :ow]
    rows = jax.lax.broadcasted_iota(jnp.int32, (oh, CTILE_H), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (oh, CTILE_H), 1)
    wy = (cols == rows + dy_ref[p]).astype(jnp.float32)
    out_ref[0, :, :] = jnp.dot(wy, shifted,
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit, static_argnames=("patch_hw", "interpret"))
def crop_patches_pallas(pyramid: jax.Array, crops: jax.Array,
                        patch_hw: Tuple[int, int] = (64, 64),
                        interpret: bool = False) -> jax.Array:
    """crops: (B, 3) int32 [level, y, x] -> (B, h, w) contiguous crops.

    Semantics match ops.pyramid.crop_patches for in-level crops (the XLA
    path clamps out-of-level starts; here they must be in-level).
    """
    L, lh, lw = pyramid.shape
    if lh < CTILE_H or lw < CTILE_W or lh % 8 or lw % 128:
        raise ValueError(
            f"pyramid levels {lh}x{lw} must be >= {CTILE_H}x{CTILE_W} and "
            f"(8, 128)-aligned")
    oh, ow = patch_hw
    if oh > 64 or ow > 64:
        raise ValueError("crop kernel supports patches up to 64x64")
    B = crops.shape[0]
    levels = crops[:, 0].astype(jnp.int32)
    y = jnp.clip(crops[:, 1].astype(jnp.int32), 0, lh - oh)
    x = jnp.clip(crops[:, 2].astype(jnp.int32), 0, lw - ow)
    oy = jnp.minimum((y // 8) * 8, lh - CTILE_H)
    ox = jnp.minimum((x // 128) * 128, lw - CTILE_W)
    dy = y - oy
    dx = x - ox

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((1, oh, ow), lambda p, *_: (p, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, CTILE_H, CTILE_W), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kern = functools.partial(_crop_kernel, oh=oh, ow=ow, n_prog=B)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, oh, ow), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(levels, oy, ox, dy, dx, pyramid.astype(jnp.float32))
    return out
