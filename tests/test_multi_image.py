"""Multi-image extraction (per-box image index, the reference's
``extract_subimages_rotate(images, indices, ...)`` API)."""

import numpy as np
import jax.numpy as jnp

from pyfaceanalysis_tpu.ops.patches import extract_patches_rotate


def test_image_idx_selects_correct_image():
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(3, 100, 100).astype(np.float32))
    boxes = jnp.asarray([[10.0, 10.0, 41.0, 41.0]] * 3)
    angles = jnp.zeros(3)
    idx = jnp.asarray([0, 1, 2], jnp.int32)
    multi = np.asarray(extract_patches_rotate(imgs, boxes, angles, (32, 32),
                                              method="nearest",
                                              image_idx=idx))
    for i in range(3):
        single = np.asarray(extract_patches_rotate(
            imgs[i], boxes[:1], angles[:1], (32, 32), method="nearest"))[0]
        np.testing.assert_allclose(multi[i], single, atol=1e-6)


def test_image_idx_bilinear():
    rng = np.random.RandomState(1)
    imgs = jnp.asarray(rng.rand(2, 64, 64).astype(np.float32))
    boxes = jnp.asarray([[5.0, 5.0, 36.5, 36.5]] * 2)
    angles = jnp.asarray([10.0, -7.0])
    idx = jnp.asarray([1, 0], jnp.int32)
    multi = np.asarray(extract_patches_rotate(imgs, boxes, angles, (16, 16),
                                              image_idx=idx))
    for i, im_i in enumerate([1, 0]):
        single = np.asarray(extract_patches_rotate(
            imgs[im_i], boxes[i:i + 1], angles[i:i + 1], (16, 16)))[0]
        np.testing.assert_allclose(multi[i], single, atol=1e-6)
