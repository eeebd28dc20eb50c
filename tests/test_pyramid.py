"""Tests for the scale-pyramid crop extraction fast path."""

import numpy as np
import jax.numpy as jnp

from pyfaceanalysis_tpu.config import DetectorConfig, NetGeometry
from pyfaceanalysis_tpu.engine import cascade as cascade_mod
from pyfaceanalysis_tpu.ops.patches import extract_patches_rotate
from pyfaceanalysis_tpu.ops.pyramid import (build_pyramid,
                                            build_pyramid_batch,
                                            crop_patches)


def test_level0_scale1_is_identity():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(64, 80).astype(np.float32))
    pyr = build_pyramid(img, (1.0,), (64, 80))
    np.testing.assert_allclose(np.asarray(pyr[0]), np.asarray(img), atol=1e-6)


def test_crop_matches_gather_extraction():
    """Pyramid crops must equal the rotated-gather nearest extraction for
    aligned, unrotated boxes at the level scale."""
    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.rand(256, 256).astype(np.float32))
    s = 2.0
    pyr = build_pyramid(img, (1.0, s), (256, 256))
    # box at level-1 origin (10, 6): image coords (20, 12), side 64*s.
    lx, ly = 6, 10
    box = jnp.asarray([[lx * s, ly * s, lx * s + 64 * s - 1.0,
                        ly * s + 64 * s - 1.0]], jnp.float32)
    ref = np.asarray(extract_patches_rotate(img, box, jnp.zeros(1), (64, 64),
                                            method="nearest"))[0]
    got = np.asarray(crop_patches(pyr, jnp.asarray([[1, ly, lx]], jnp.int32),
                                  (64, 64)))[0]
    assert (got == ref).mean() > 0.99    # identical up to rounding ties


def test_batched_pyramid_matches_per_image_concat():
    """build_pyramid_batch must reproduce the image-major concatenation of
    per-image pyramids (the layout the fused cascade's folded crop levels
    index)."""
    rng = np.random.RandomState(2)
    imgs = jnp.asarray(rng.rand(3, 96, 112).astype(np.float32))
    scales = (1.0, 1.5, 2.25)
    hw = (128, 128)
    ref = jnp.concatenate([build_pyramid(imgs[i], scales, hw)
                           for i in range(3)], axis=0)
    got = build_pyramid_batch(imgs, scales, hw)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_grid_state_crops_consistent_with_boxes():
    """Snapped grid boxes must equal crop origin * scale."""
    geom = NetGeometry()
    cfg = DetectorConfig(smallest_face=0.25, bucket_sizes=(4096,))
    state, n, pyr = cascade_mod.make_grid_state(400, 300, geom, cfg)
    assert pyr is not None
    crops = np.asarray(pyr.crops)[:n]
    boxes = np.asarray(state.boxes)[:n]
    for i in range(0, n, max(n // 20, 1)):
        s = pyr.scales[crops[i, 0]]
        np.testing.assert_allclose(boxes[i, 0], crops[i, 2] * s, rtol=1e-5)
        np.testing.assert_allclose(boxes[i, 1], crops[i, 1] * s, rtol=1e-5)
        # Box side = 64 * s (inclusive coords).
        np.testing.assert_allclose(boxes[i, 2] - boxes[i, 0] + 1.0, 64 * s,
                                   rtol=1e-5)
