"""Mined hard-negative plumbing: RealFaceSource.load_mined /
sample_mined_patches and the disc_dataset mined background class
(tools/mine_hard_negatives.py -> pfa-train --mined_negatives)."""

import os

import numpy as np
import pytest

from pyfaceanalysis_tpu.config import NetGeometry
from pyfaceanalysis_tpu.training import datasets
from pyfaceanalysis_tpu.training.real import RealFaceSource


@pytest.fixture(scope="module")
def photo_and_files(tmp_path_factory):
    from PIL import Image
    d = tmp_path_factory.mktemp("mined")
    rng = np.random.RandomState(0)
    arr = (rng.rand(200, 160) * 255).astype(np.uint8)
    photo = str(d / "fake_photo.png")
    Image.fromarray(arr, mode="L").save(photo)
    gt = str(d / "gt.txt")
    with open(gt, "w") as f:
        # one annotated face: eyes + nose + mouth (8-float row)
        f.write(photo + "\n")
        f.write("60.0 80.0 97.0 80.0 78.0 100.0 78.0 122.0\n")
    mined = str(d / "mined.txt")
    with open(mined, "w") as f:
        f.write("# mined hard negatives: filename x0 y0 x1 y1 angle\n")
        f.write(f"{photo} 10.0 130.0 70.0 190.0 5.0\n")
        f.write(f"{os.path.basename(photo)} 100.0 10.0 150.0 60.0 -12.0\n")
        f.write(str(d / "unknown.png") + " 0 0 10 10 0\n")  # skipped
    return photo, gt, mined


def test_load_mined_and_sample(photo_and_files):
    _, gt, mined = photo_and_files
    rs = RealFaceSource(gt, verbose=False, mined_file=mined)
    assert rs.num_mined == 2          # unknown photo's box skipped
    patches = np.asarray(rs.sample_mined_patches(0, 16, (64, 64)))
    assert patches.shape == (16, 64, 64)
    assert np.isfinite(patches).all()
    assert patches.min() >= 0.0 and patches.max() <= 1.0
    assert patches.std() > 0.01       # actual photo texture, not padding
    # deterministic per seed
    again = np.asarray(rs.sample_mined_patches(0, 16, (64, 64)))
    np.testing.assert_array_equal(patches, again)


def test_sample_mined_requires_boxes(photo_and_files):
    _, gt, _ = photo_and_files
    rs = RealFaceSource(gt, verbose=False)
    assert rs.num_mined == 0
    with pytest.raises(ValueError):
        rs.sample_mined_patches(0, 4)


def test_disc_dataset_mined_background(photo_and_files):
    import jax
    _, gt, mined = photo_and_files
    rs = RealFaceSource(gt, verbose=False, mined_file=mined)
    geom = NetGeometry(subimage_width=64, subimage_height=64)
    key = jax.random.PRNGKey(0)
    x0, cls0, avg0 = datasets.disc_dataset(
        key, 6, 4, geom, real_source=rs, real_frac=0.2, real_bg_frac=0.3,
        mined_frac=0.0)
    x1, cls1, avg1 = datasets.disc_dataset(
        key, 6, 4, geom, real_source=rs, real_frac=0.2, real_bg_frac=0.3,
        mined_frac=0.5)
    n_bg0 = int((cls0 == 9).sum())
    n_bg1 = int((cls1 == 9).sum())
    assert n_bg1 == n_bg0 + int(n_bg0 * 0.5)
    # graded face classes are untouched
    assert int((cls0 != 9).sum()) == int((cls1 != 9).sum())
    assert x1.shape[0] == len(cls1) and x1.shape[1] == 64 * 64
    np.testing.assert_array_equal(avg0, avg1)


def test_sample_age_zframes(photo_and_files, tmp_path):
    """Real-anchor age Z-frames: deploy-path extraction shape/labels,
    deterministic under seed, and leave-one-out exclusion."""
    photo, gt, _ = photo_and_files
    attrs = str(tmp_path / "attrs.txt")
    with open(attrs, "w") as f:
        f.write("# basename age race gender\n")
        f.write(os.path.basename(photo) + " 78 White Female\n")
    rs = RealFaceSource(gt, verbose=False)

    flat, labels = rs.sample_age_zframes(0, 6, attrs_file=attrs)
    flat = np.asarray(flat)
    assert flat.shape == (6, 96 * 96)
    # age clipped to the decoder's 57.8y ladder ceiling
    np.testing.assert_allclose(labels["age"], 57.8)
    np.testing.assert_allclose(labels["race"], 2.0)
    np.testing.assert_allclose(labels["gender"], 1.0)
    # eye jitter + variants: samples differ from each other
    assert np.abs(flat[0] - flat[1]).max() > 1e-4
    # deterministic under the seed
    again, _ = rs.sample_age_zframes(0, 6, attrs_file=attrs)
    np.testing.assert_array_equal(flat, np.asarray(again))
    # contrast enhancement applied (zero mean / 0.16 std per patch)
    assert abs(flat.mean()) < 1e-3
    np.testing.assert_allclose(flat.std(axis=1), 0.16, atol=1e-3)

    # excluding the only photo leaves no usable faces
    with pytest.raises(ValueError):
        rs.sample_age_zframes(0, 2, attrs_file=attrs,
                              exclude=os.path.basename(photo))
