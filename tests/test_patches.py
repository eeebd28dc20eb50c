"""Tests of the batched rotated patch gather."""

import numpy as np

from pyfaceanalysis_tpu.ops.patches import (extract_centered_patch,
                                            extract_patches_rotate)
from pyfaceanalysis_tpu.ops.contrast import (contrast_enhance_patches,
                                             contrast_normalize_avg_std)


def test_identity_crop_nearest():
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(32, 48)).astype(np.float32)
    # Box covering exactly pixels [4..11] x [2..9] (inclusive), no resize.
    boxes = np.array([[4.0, 2.0, 11.0, 9.0]])
    out = np.asarray(extract_patches_rotate(img, boxes, np.zeros(1), (8, 8),
                                            method="nearest"))
    np.testing.assert_allclose(out[0], img[2:10, 4:12], atol=1e-6)


def test_identity_crop_bilinear():
    rng = np.random.default_rng(1)
    img = rng.uniform(size=(32, 48)).astype(np.float32)
    boxes = np.array([[4.0, 2.0, 11.0, 9.0]])
    out = np.asarray(extract_patches_rotate(img, boxes, np.zeros(1), (8, 8),
                                            method="bilinear"))
    np.testing.assert_allclose(out[0], img[2:10, 4:12], atol=1e-6)


def test_downscale_averages():
    # A 2x checkerboard downscaled 2x bilinearly gives the mean.
    img = np.zeros((16, 16), np.float32)
    img[::2, ::2] = 1.0
    img[1::2, 1::2] = 1.0
    boxes = np.array([[0.0, 0.0, 15.0, 15.0]])
    out = np.asarray(extract_patches_rotate(img, boxes, np.zeros(1), (8, 8)))
    np.testing.assert_allclose(out[0], 0.5, atol=1e-6)


def test_rotation_90_degrees():
    rng = np.random.default_rng(2)
    img = rng.uniform(size=(33, 33)).astype(np.float32)
    # Centered 11x11 box rotated by 90 degrees == transpose+flip of the crop.
    boxes = np.array([[11.0, 11.0, 21.0, 21.0]])
    base = np.asarray(extract_patches_rotate(img, boxes, np.zeros(1), (11, 11),
                                             method="nearest"))[0]
    rot = np.asarray(extract_patches_rotate(img, boxes, np.array([90.0]),
                                            (11, 11), method="nearest"))[0]
    # Sampling grid rotated +90deg: out(i, j) samples source at center +
    # R(90)(du, dv) = (-dv, du) -> rot[i, j] == base[j, n-1-i].
    np.testing.assert_allclose(rot, np.flip(base, axis=1).T, atol=1e-6)


def test_out_of_bounds_zero_fill():
    img = np.ones((16, 16), np.float32)
    boxes = np.array([[-8.0, -8.0, 7.0, 7.0]])
    out = np.asarray(extract_patches_rotate(img, boxes, np.zeros(1), (16, 16),
                                            method="nearest"))
    # Top-left quadrant out of image -> 0; bottom-right in image -> 1.
    assert out[0, 0, 0] == 0.0
    assert out[0, 15, 15] == 1.0


def test_batched_shapes():
    img = np.zeros((64, 64), np.float32)
    B = 17
    boxes = np.tile(np.array([[0.0, 0.0, 31.0, 31.0]]), (B, 1))
    out = extract_patches_rotate(img, boxes, np.zeros(B), (64, 64))
    assert out.shape == (B, 64, 64)


def test_extract_centered_patch():
    rng = np.random.default_rng(3)
    img = rng.uniform(size=(260, 256)).astype(np.float32)
    out = np.asarray(extract_centered_patch(img, 1.0, 10.0, 20.0, 0.0, 0.0,
                                            (96, 96)))
    np.testing.assert_allclose(out[0], img[10:106, 20:116], atol=1e-6)


def test_contrast_normalize_avg_std():
    rng = np.random.default_rng(4)
    p = rng.uniform(0, 255, size=(5, 64)).astype(np.float32)
    out = np.asarray(contrast_normalize_avg_std(p, 137.5, 0.4 * 255))
    assert out.min() >= 0.0 and out.max() <= 255.0
    # Unclipped rows should land on the target mean.
    mild = rng.normal(size=(3, 4096)).astype(np.float32) * 1 + 128
    out2 = np.asarray(contrast_normalize_avg_std(mild, 137.5, 10.0))
    np.testing.assert_allclose(out2.mean(axis=1), 137.5, atol=0.5)
    np.testing.assert_allclose(out2.std(axis=1), 10.0, atol=0.5)


def test_contrast_enhance_patches():
    rng = np.random.default_rng(5)
    p = rng.uniform(size=(4, 8, 8)).astype(np.float32)
    out = np.asarray(contrast_enhance_patches(p, obj_avg=0.11, obj_std=0.15))
    flat = out.reshape(4, -1)
    np.testing.assert_allclose(flat.mean(axis=1), 0.11, atol=1e-4)
    np.testing.assert_allclose(flat.std(axis=1), 0.15, atol=1e-3)


def test_age_patch_composed_affine_matches_two_stage():
    """The ARG head samples its 96x96 patch directly from the source via a
    composed source->Z->patch affine (engine/heads._sample_age_patches).
    Golden: the original two-stage path (full Z-frame gather with the
    head's -0.5 pixel-center convention, then extract_centered_patch).
    On a LINEAR ramp bilinear sampling is exact at every stage, so the
    two must agree to float tolerance; on smooth natural-ish content they
    agree to ~1e-2 (single vs double bilinear filter support)."""
    import jax.numpy as jnp
    from pyfaceanalysis_tpu.engine.heads import _sample_age_patches
    from pyfaceanalysis_tpu.training.datasets import (AGE_SAMPLING, Z_SIZE,
                                                      age_patch_constants)

    H, W = 240, 296
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    ramp = (0.3 * xx / W + 0.5 * yy / H + 0.1)
    smooth = (0.5 + 0.25 * np.sin(2 * np.pi * xx / 37.0)
              * np.cos(2 * np.pi * yy / 23.0)
              + 0.15 * np.sin(2 * np.pi * (xx + yy) / 53.0)
              ).astype(np.float32)
    images = jnp.asarray(np.stack([ramp, smooth]))

    centers = np.array([[150.0, 120.0], [140.0, 110.0]], np.float32)
    angles = np.array([7.0, -12.0], np.float32)
    sfs = np.array([0.55, 0.42], np.float32)
    idx = np.array([0, 1], np.int32)

    got = np.asarray(_sample_age_patches(images, jnp.asarray(centers),
                                         jnp.asarray(angles),
                                         jnp.asarray(sfs),
                                         jnp.asarray(idx)))

    # Two-stage reference: Z-frame gather with the head's pixel-center
    # convention (sx - 0.5), then the centered crop.
    zh, zw = Z_SIZE
    fr, fc, tx, ty = age_patch_constants()
    flat = np.asarray(images).reshape(2, -1)
    want = []
    for f in range(2):
        X = np.arange(zw, dtype=np.float32) - (zw - 1) / 2.0
        Y = np.arange(zh, dtype=np.float32) - (zh - 1) / 2.0
        u = X[None, :] * sfs[f]
        v = Y[:, None] * sfs[f]
        rad = np.deg2rad(angles[f])
        c, s = np.cos(rad), np.sin(rad)
        sx = centers[f, 0] + c * u - s * v
        sy = centers[f, 1] + s * u + c * v
        px, py = sx - 0.5, sy - 0.5
        ix0 = np.floor(px).astype(np.int32)
        iy0 = np.floor(py).astype(np.int32)
        tx_, ty_ = px - ix0, py - iy0

        def tap(iy, ix, f=f):
            inb = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
            lin = np.clip(iy, 0, H - 1) * W + np.clip(ix, 0, W - 1)
            return np.where(inb, flat[f][lin], 0.0)

        top = tap(iy0, ix0) * (1 - tx_) + tap(iy0, ix0 + 1) * tx_
        bot = tap(iy0 + 1, ix0) * (1 - tx_) + tap(iy0 + 1, ix0 + 1) * tx_
        z = (top * (1 - ty_) + bot * ty_).astype(np.float32)
        patch = np.asarray(extract_centered_patch(
            jnp.asarray(z), AGE_SAMPLING, fr, fc, tx, ty, (96, 96)))[0]
        want.append(patch)

    np.testing.assert_allclose(got[0], want[0], atol=2e-5)   # exact: ramp
    assert np.abs(got[1] - want[1]).max() < 2e-2              # smooth
