"""Tests for IO: output format, batch files, ground truth, artifacts,
legacy classifier pickles."""

import glob
import os

import numpy as np
import jax.numpy as jnp
import pytest

from pyfaceanalysis_tpu.engine.detector import Detection
from pyfaceanalysis_tpu.io import artifacts, writers
from pyfaceanalysis_tpu.io.legacy import (
    find_filenames_beginning_with,
    gaussian_regressor_from_legacy,
)
from pyfaceanalysis_tpu.models import builder
from pyfaceanalysis_tpu.models.init import random_network_params
from pyfaceanalysis_tpu.ops.gaussian import GaussianRegressor

from conftest import REFERENCE_DIR, reference_available


def _detection(**kw):
    base = dict(box=(10.4, 20.6, 50.2, 60.8), angle=1.5,
                eye_left=(20.1, 30.2), eye_right=(40.9, 30.1),
                confidence=0.125, age=33.46, age_std=2.0,
                race_value=1.5, gender_value=-0.5)
    base.update(kw)
    return Detection(**base)


class TestOutputWriter:
    def test_row_format(self, tmp_path):
        """Byte-for-byte the reference's format string
        (FaceDetectUpdated.py:1263-1274)."""
        path = str(tmp_path / "out.txt")
        writers.write_detections(path, [_detection()])
        line = open(path).read()
        assert line == ("10, 21, 50, 61, 1.500000, 20, 30, 41, 30, "
                        "33.5, White, Male, 0.125000 \n")

    def test_append_mode(self, tmp_path):
        path = str(tmp_path / "out.txt")
        writers.write_detections(path, [_detection()])
        writers.write_detections(path, [_detection()])
        assert len(open(path).readlines()) == 2

    def test_eye_swap(self, tmp_path):
        path = str(tmp_path / "out.txt")
        writers.write_detections(path, [_detection(age=None)],
                                 right_screen_eye_first=True)
        fields = open(path).read().split(",")
        assert int(fields[5]) == 41 and int(fields[7]) == 20

    def test_no_arg_columns(self, tmp_path):
        path = str(tmp_path / "out.txt")
        writers.write_detections(path, [_detection()],
                                 write_age_race_gender_confidence=False)
        assert len(open(path).read().split(",")) == 9


class TestBatchFile:
    def test_roundtrip(self, tmp_path):
        p = tmp_path / "batch.txt"
        p.write_text("a.jpg\nout_a.txt\nb.jpg\nout_b.txt\n")
        imgs, outs = writers.read_batch_file(str(p))
        assert imgs == ["a.jpg", "b.jpg"]
        assert outs == ["out_a.txt", "out_b.txt"]


class TestGroundTruthLoader:
    def test_six_float_format(self, tmp_path):
        p = tmp_path / "coords.txt"
        p.write_text("img0.jpg\n100 50 137 50 118.5 92\n")
        files, coords = writers.load_true_coordinates("", str(p))
        assert files == ["img0.jpg"]
        row = coords[0]
        np.testing.assert_allclose(row[0:4], [100, 50, 137, 50])
        # Face box side = dist_eyes * 128 * 0.825 / 37 = 37*2.8541 = 105.6
        np.testing.assert_allclose(row[12] - row[10], 37 * 128 * 0.825 / 37,
                                   rtol=1e-6)


class TestArtifacts:
    def test_network_roundtrip(self, tmp_path):
        net = random_network_params(
            builder.build_higsfa(16, base_field=4, d=4, top_dim=6), seed=3)
        path = str(tmp_path / "net.npz")
        artifacts.save_network(path, net)
        loaded = artifacts.load_network(path)
        assert len(loaded.specs) == len(net.specs)
        x = np.random.RandomState(0).rand(4, 256).astype(np.float32)
        np.testing.assert_allclose(np.asarray(net.execute(jnp.asarray(x))),
                                   np.asarray(loaded.execute(jnp.asarray(x))),
                                   rtol=1e-5)

    def test_classifier_roundtrip(self, tmp_path):
        rng = np.random.RandomState(0)
        clf = GaussianRegressor.fit(rng.randn(300, 4),
                                    rng.randint(0, 3, 300),
                                    avg_labels=np.array([1.0, 2.0, 3.0]))
        path = str(tmp_path / "clf.npz")
        artifacts.save_classifier(path, clf, 4)
        loaded = artifacts.load_classifier(path)
        x = jnp.asarray(rng.randn(16, 4), jnp.float32)
        np.testing.assert_allclose(np.asarray(clf.regression(x)),
                                   np.asarray(loaded.regression(x)),
                                   rtol=1e-5)


@pytest.mark.skipif(not reference_available(), reason="no reference checkout")
class TestLegacyPickles:
    """Every shipped reference classifier must load and regress finitely
    within its documented label range (SURVEY.md 2.2)."""

    def test_load_all_shipped(self):
        paths = sorted(glob.glob(os.path.join(
            REFERENCE_DIR, "SavedClassifiers", "*.pckl")))
        assert len(paths) >= 19
        for p in paths:
            clf = gaussian_regressor_from_legacy(p)
            D = clf.input_dim
            rng = np.random.RandomState(0)
            x = jnp.asarray(rng.randn(8, D), jnp.float32)
            reg = np.asarray(clf.regression(x))
            assert np.isfinite(reg).all(), p
            lo = float(np.asarray(clf.avg_labels).min())
            hi = float(np.asarray(clf.avg_labels).max())
            assert (reg >= lo - 1e-3).all() and (reg <= hi + 1e-3).all(), p

    def test_age_classifier_range(self):
        paths = glob.glob(os.path.join(REFERENCE_DIR, "SavedClassifiers",
                                       "*AgeGeneralize.pckl"))
        assert paths
        clf = gaussian_regressor_from_legacy(paths[0])
        avg = np.asarray(clf.avg_labels)
        assert 16.0 < avg.min() < 18.0 and 56.0 < avg.max() < 59.0

    def test_find_filenames(self):
        out = find_filenames_beginning_with(
            os.path.join(REFERENCE_DIR, "Pipelines"), "Pipeline",
            extension=".txt")
        assert any("Pipeline_experimental" in p for p in out)
