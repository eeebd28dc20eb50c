"""Pallas rotated-gather kernel vs the XLA reference path.

Runs in interpreter mode on the CPU test platform; the compiled path is
exercised on real TPU hardware by tools/profile_stages.py and bench.py.

Tolerances: the kernel's sampling matmul runs in bfloat16 (2x MXU rate;
ops/pallas_gather.py) -- texel values round to ~2^-9 relative, half the
1/255 quantum the uint8-decoded canvas carries, so BF16_TOL bounds the
difference vs the f32 XLA gather without hiding real sampling errors
(which are whole-texel-sized).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyfaceanalysis_tpu.ops.pallas_gather import (
    TILE_H, TILE_W, sample_patches_pyramid,
)
from pyfaceanalysis_tpu.ops.patches import extract_patches_rotate
from pyfaceanalysis_tpu.ops.pyramid import build_pyramid

BF16_TOL = dict(rtol=0, atol=6e-3)


def _rand_image(key, h=TILE_H, w=TILE_W):
    return jax.random.uniform(key, (h, w), jnp.float32)


def test_matches_canvas_gather_at_unit_scale():
    """At ladder scale 1.0 a pyramid level IS the canvas, so the kernel must
    reproduce extract_patches_rotate(..., nearest) exactly."""
    key = jax.random.PRNGKey(0)
    img = _rand_image(key)
    pyr = build_pyramid(img, (1.0,), (TILE_H, TILE_W))
    rng = np.random.RandomState(1)
    B = 24
    # Boxes inside the level, sides 40-64, angles +-22.5 deg.
    side = rng.uniform(40, 64, B)
    x0 = rng.uniform(25, TILE_W - 33 - side)
    y0 = rng.uniform(25, 95 - side)
    boxes = jnp.asarray(
        np.stack([x0, y0, x0 + side - 1, y0 + side - 1], 1), jnp.float32)
    angles = jnp.asarray(rng.uniform(-22.5, 22.5, B), jnp.float32)

    want = extract_patches_rotate(img, boxes, angles, (64, 64),
                                  method="nearest")
    got = sample_patches_pyramid(pyr, jnp.ones((1,)),
                                 jnp.zeros((B,), jnp.int32), boxes, angles,
                                 (64, 64), method="nearest", interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               **BF16_TOL)


def test_non64_out_hw_matches_canvas_gather():
    """The chunked sampling loop handles output widths that do not divide
    the 1024-pixel chunk (e.g. 96) and partial final chunks."""
    key = jax.random.PRNGKey(5)
    img = _rand_image(key)
    pyr = build_pyramid(img, (1.0,), (TILE_H, TILE_W))
    boxes = jnp.asarray([[30.0, 28.0, 93.0, 91.0],
                         [40.5, 35.25, 90.5, 85.25]], jnp.float32)
    angles = jnp.asarray([10.0, -17.5], jnp.float32)
    for hw in [(96, 96), (64, 96), (40, 24)]:
        want = extract_patches_rotate(img, boxes, angles, hw,
                                      method="bilinear")
        got = sample_patches_pyramid(pyr, jnp.ones((1,)),
                                     jnp.zeros((2,), jnp.int32), boxes,
                                     angles, hw, method="bilinear",
                                     interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   **BF16_TOL)


def test_bilinear_matches_canvas_gather_at_unit_scale():
    key = jax.random.PRNGKey(2)
    img = _rand_image(key)
    pyr = build_pyramid(img, (1.0,), (TILE_H, TILE_W))
    boxes = jnp.asarray([[30.0, 28.0, 93.0, 91.0],
                         [40.5, 35.25, 90.5, 85.25]], jnp.float32)
    angles = jnp.asarray([10.0, -17.5], jnp.float32)
    want = extract_patches_rotate(img, boxes, angles, (64, 64),
                                  method="bilinear")
    got = sample_patches_pyramid(pyr, jnp.ones((1,)),
                                 jnp.zeros((2,), jnp.int32), boxes, angles,
                                 (64, 64), method="bilinear", interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), **BF16_TOL)


def test_multi_level_selection():
    """A patch on a coarser level samples the nearest-resized level texels:
    compare against an explicit jnp emulation of the level-space warp."""
    key = jax.random.PRNGKey(3)
    img = _rand_image(key, 256, 256)
    scales = (1.0, 2.0)
    pyr = build_pyramid(img, scales, (256, 256))
    B = 8
    rng = np.random.RandomState(4)
    side = rng.uniform(100, 128, B)       # ~2x ladder scale boxes
    x0 = rng.uniform(20, 220 - side)
    y0 = rng.uniform(20, 220 - side)
    boxes = jnp.asarray(
        np.stack([x0, y0, x0 + side - 1, y0 + side - 1], 1), jnp.float32)
    angles = jnp.asarray(rng.uniform(-20, 20, B), jnp.float32)
    levels = jnp.ones((B,), jnp.int32)

    got = sample_patches_pyramid(pyr, jnp.asarray(scales), levels, boxes,
                                 angles, (64, 64), method="nearest",
                                 interpret=True)

    # Emulation: canvas sample coords -> level coords -> nearest level texel.
    lev = np.asarray(pyr[1])
    x0n, y0n = np.asarray(boxes[:, 0]), np.asarray(boxes[:, 1])
    bw = np.asarray(boxes[:, 2]) + 1 - x0n
    bh = np.asarray(boxes[:, 3]) + 1 - y0n
    cx, cy = x0n + bw / 2, y0n + bh / 2
    fx = (np.arange(64) + 0.5) / 64
    rad = np.deg2rad(np.asarray(angles))
    want = np.zeros((B, 64, 64), np.float32)
    for b in range(B):
        u = x0n[b] + fx[None, :] * bw[b]
        v = y0n[b] + fx[:, None] * bh[b]
        du, dv = u - cx[b], v - cy[b]
        us = cx[b] + np.cos(rad[b]) * du - np.sin(rad[b]) * dv
        vs = cy[b] + np.sin(rad[b]) * du + np.cos(rad[b]) * dv
        # round-half-even to match jnp.round
        lxc = us / 2.0 - 0.5
        lyc = vs / 2.0 - 0.5
        ix = np.rint(lxc).astype(int)
        iy = np.rint(lyc).astype(int)
        inb = (ix >= 0) & (ix < 256) & (iy >= 0) & (iy < 256)
        want[b] = np.where(inb, lev[np.clip(iy, 0, 255),
                                    np.clip(ix, 0, 255)], 0.0)
        # Coordinates within float noise of a .5 rounding tie may legally
        # round either way (the kernel evaluates the same affine map with a
        # different operation order); exclude them from the comparison.
        tie = (np.abs(lxc - np.floor(lxc) - 0.5) < 1e-4) | \
              (np.abs(lyc - np.floor(lyc) - 0.5) < 1e-4)
        want[b] = np.where(tie, np.asarray(got)[b], want[b])
    np.testing.assert_allclose(np.asarray(got), want, **BF16_TOL)


def test_out_of_level_samples_are_zero():
    img = _rand_image(jax.random.PRNGKey(5))
    pyr = build_pyramid(img, (1.0,), (TILE_H, TILE_W))
    # Box hanging off the top-left corner of the level.
    boxes = jnp.asarray([[-30.0, -25.0, 33.0, 38.0]], jnp.float32)
    angles = jnp.zeros((1,), jnp.float32)
    got = sample_patches_pyramid(pyr, jnp.ones((1,)),
                                 jnp.zeros((1,), jnp.int32), boxes, angles,
                                 (64, 64), method="nearest", interpret=True)
    want = extract_patches_rotate(img, boxes, angles, (64, 64),
                                  method="nearest")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), **BF16_TOL)


def test_rejects_small_pyramid():
    img = _rand_image(jax.random.PRNGKey(6), 64, 64)
    pyr = build_pyramid(img, (1.0,), (64, 64))
    with pytest.raises(ValueError):
        sample_patches_pyramid(pyr, jnp.ones((1,)), jnp.zeros((1,), jnp.int32),
                               jnp.zeros((1, 4)), jnp.zeros((1,)),
                               (64, 64), interpret=True)


def test_run_cascade_pallas_refinement_path():
    """Plumbing test: run_cascade with pallas_refine="interpret" must execute
    the refinement extraction through the kernel and agree with the XLA
    canvas-gather path at unit ladder scale (where level == canvas and
    the snapped grid makes both samplings identical)."""
    from test_engine import _const_classifier, _identity_net

    from pyfaceanalysis_tpu.config import DetectorConfig, NetGeometry
    from pyfaceanalysis_tpu.engine import cascade as cascade_mod

    geom = NetGeometry()
    img = _rand_image(jax.random.PRNGKey(7), 160, 160)
    pyr = build_pyramid(img, (1.0,), (160, 256))
    specs, params = _identity_net()
    # Disc (grid crop) -> PosX (no-op shift) -> Disc (REFINEMENT extraction).
    plan = (cascade_mod.StagePlan("Disc", 0, True, 0, 0, 4),
            cascade_mod.StagePlan("PosX", 0, False, -1, 1, 4),
            cascade_mod.StagePlan("Disc", 1, True, 0, 2, 4))
    clfs = (_const_classifier(0.5), _const_classifier(0.0),
            _const_classifier(0.5))
    n = 4
    boxes = np.asarray([[8, 8, 71, 71], [40, 30, 103, 93],
                        [70, 60, 133, 123], [16, 80, 79, 143]], np.float32)
    crops = jnp.asarray(
        np.stack([np.zeros(n), boxes[:, 1], boxes[:, 0]], 1).astype(np.int32))
    state = cascade_mod.CascadeState(
        boxes=jnp.asarray(boxes), angles=jnp.zeros(n),
        mask=jnp.ones(n, bool), conf=jnp.ones(n, jnp.float32),
        orig_cx=jnp.asarray((boxes[:, 0] + boxes[:, 2]) / 2),
        orig_cy=jnp.asarray((boxes[:, 1] + boxes[:, 3]) / 2),
        max_dx=jnp.full(n, 12.5), max_dy=jnp.full(n, 6.25),
        base_side=jnp.full(n, np.hypot(64, 64)))
    outs = {}
    for mode in ("interpret", "off"):
        cfg = DetectorConfig(bucket_sizes=(n,), mid_compact=0,
                             pallas_refine=mode)
        outs[mode] = cascade_mod.run_cascade(
            plan, (specs,), geom, cfg, (64, 64), img, ((params[0],),),
            clfs, state, pyramid=pyr, crops=crops,
            pyr_scales=jnp.ones((1,)))
    for a, b in zip(outs["interpret"], outs["off"]):
        if a is not None:
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       **BF16_TOL)


def test_eye_level_selection():
    """engine.eyes._eye_levels: finest level whose pitch keeps the rotated
    box inside the kernel tile; native (1.0) for small boxes; coarsest as
    the fallback for gigantic boxes."""
    from pyfaceanalysis_tpu.engine.eyes import _eye_levels

    scales = jnp.asarray([1.35, 1.74, 2.23, 2.87, 1.0])  # ladder + native
    bw = jnp.asarray([40.0, 79.9, 120.0, 200.0, 1000.0])
    lev, no_cover = (np.asarray(a) for a in _eye_levels(scales, bw))
    assert lev[0] == 4        # needs s >= 0.5 -> native 1.0 is finest
    assert lev[1] == 4        # 79.9/80 < 1.0
    assert lev[2] == 1        # needs s >= 1.5 -> 1.74 (1.35 is too fine)
    assert scales[lev[2]] >= 120.0 / 80.0
    assert scales[lev[3]] >= 200.0 / 80.0
    assert lev[4] == 3        # nothing >= 12.5 -> coarsest (2.87)
    # coverage flag: only the gigantic box needs the XLA fallback
    assert list(no_cover) == [False, False, False, False, True]
    # every selected covered level keeps the extent inside the 128-row
    # tile (|angle| <= 24.75 deg -> extent <= 1.327 * box_w)
    ext = bw * 1.327 / scales[lev]
    assert np.all(np.asarray(ext)[:4] <= 111)


def test_crop_kernel_matches_dynamic_slice():
    """ops.pallas_crop.crop_patches_pallas == ops.pyramid.crop_patches for
    in-level crops (arbitrary y/x residues against the (8, 128) snap)."""
    from pyfaceanalysis_tpu.ops.pallas_crop import crop_patches_pallas
    from pyfaceanalysis_tpu.ops.pyramid import crop_patches

    key = jax.random.PRNGKey(11)
    img = _rand_image(key, 256, 384)
    pyr = build_pyramid(img, (1.0, 2.0), (256, 384))
    rng = np.random.RandomState(12)
    B = 32
    lev = rng.randint(0, 2, B)
    yy = rng.randint(0, 256 - 64, B)
    xx = rng.randint(0, 384 - 64, B)
    crops = jnp.asarray(np.stack([lev, yy, xx], 1), jnp.int32)
    want = crop_patches(pyr, crops, (64, 64))
    got = crop_patches_pallas(pyr, crops, (64, 64), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=0)
