"""Slow tests: production-artifact quality + trainer mechanics.

Run explicitly with:  pytest tests/test_trained_pipeline.py -m slow
Excluded from the default suite (pytest.ini markers).

Quality assertions run against the SHIPPED artifacts (SavedNetworksTPU/ in
the repo) -- training a CPU-sized pipeline in-test proved too noisy to gate
on. A separate smoke test exercises ``train_pipeline`` end to end at tiny
sizes with mechanics-only assertions.
"""

import os

import numpy as np
import jax
import pytest

pytestmark = pytest.mark.slow

REPO_ARTIFACTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "SavedNetworksTPU")

needs_artifacts = pytest.mark.skipif(
    not os.path.isdir(REPO_ARTIFACTS),
    reason="no shipped artifacts (run pfa-train)")


@needs_artifacts
def test_pose_regressors_track_labels():
    from pyfaceanalysis_tpu.engine.detector import DetectionModel
    from pyfaceanalysis_tpu.training import datasets
    from pyfaceanalysis_tpu.config import NetGeometry
    import jax.numpy as jnp

    model = DetectionModel.load(REPO_ARTIFACTS)
    calib = getattr(model, "calibration", {}) or {}
    cnorm = bool(calib.get("detection_contrast_normalize", False))
    # The xy specialists train/run at full grid jitter; the angle/scale
    # specialists at narrow positional jitter (their stages run after the
    # PosX/PosY corrections) -- evaluate each stage's classifier on ITS
    # network's features at ITS input distribution (trainer pose_plan).
    x_wide, lab_wide = datasets.pose_dataset(
        jax.random.PRNGKey(7), 16, 16, NetGeometry(), 40.0, 20.0, 22.5,
        contrast_normalize=cnorm)
    x_narrow, lab_narrow = datasets.pose_dataset(
        jax.random.PRNGKey(9), 16, 16, NetGeometry(), 12.0, 10.0, 22.5,
        contrast_normalize=cnorm)

    # Thresholds reflect the renderer-v2 + blur-randomization training data
    # (much harder scenes than round 1: textures, yaw, patch-level blur).
    for stage, lab, thresh, (x, labels) in [
            ("PosX0", "dx", 0.5, (x_wide, lab_wide)),
            ("PosY0", "dy", 0.3, (x_wide, lab_wide)),
            ("PAng0", "ang", 0.3, (x_narrow, lab_narrow)),
            ("Scale0", "scale", 0.1, (x_narrow, lab_narrow))]:
        feats = np.asarray(jax.jit(model.network_for(stage).execute)(x))
        clf = model.classifier(stage)
        pred = np.asarray(clf.regression(
            jnp.asarray(feats[:, :clf.input_dim])))
        corr = np.corrcoef(pred, labels[lab])[0, 1]
        assert corr > thresh, f"{stage}: corr {corr:.2f} with {lab}"


@needs_artifacts
def test_disc_separates_faces_from_background():
    from pyfaceanalysis_tpu.engine.detector import DetectionModel
    from pyfaceanalysis_tpu.training import datasets
    from pyfaceanalysis_tpu.config import NetGeometry
    import jax.numpy as jnp

    model = DetectionModel.load(REPO_ARTIFACTS)
    calib = getattr(model, "calibration", {}) or {}
    x, cls, avg = datasets.disc_dataset(
        jax.random.PRNGKey(8), 12, 16, NetGeometry(),
        contrast_normalize=bool(
            calib.get("detection_contrast_normalize", False)))
    net = model.network_for("Disc1")
    feats = np.asarray(jax.jit(net.execute)(x))
    clf = model.classifier("Disc1")
    pred = np.asarray(clf.regression(jnp.asarray(feats[:, :clf.input_dim])))
    centered = pred[cls <= 1]
    background = pred[cls == 9]
    assert centered.mean() + 0.3 < background.mean()


@needs_artifacts
def test_detects_rendered_face():
    from pyfaceanalysis_tpu.config import DetectorConfig
    from pyfaceanalysis_tpu.engine.detector import DetectionModel, FaceDetector
    from pyfaceanalysis_tpu.engine.nms import relative_eye_error_np
    from pyfaceanalysis_tpu.training import synth

    model = DetectionModel.load(REPO_ARTIFACTS)
    det = FaceDetector(model, DetectorConfig(smallest_face=0.25))
    img, attrs = synth.render_face(jax.random.PRNGKey(1234),
                                   canvas_hw=(280, 280), face_size=100.0,
                                   center=(140.0, 140.0))
    out = det.detect(np.asarray(img), estimate_attributes=False)
    true_eyes = np.concatenate([np.asarray(attrs["eye_l"]),
                                np.asarray(attrs["eye_r"])])
    errs = [relative_eye_error_np(np.array([*d.eye_left, *d.eye_right]),
                                  true_eyes) for d in out]
    assert errs and min(errs) < 0.25, f"no acceptable detection: {errs}"


def test_train_pipeline_mechanics(tmp_path):
    """Tiny end-to-end training run: every artifact gets written, loads,
    and the loaded model detects WITHOUT errors (quality not asserted)."""
    from pyfaceanalysis_tpu.training.trainer import TrainConfig, train_pipeline
    from pyfaceanalysis_tpu.config import DetectorConfig
    from pyfaceanalysis_tpu.engine.detector import DetectionModel, FaceDetector

    out = str(tmp_path / "trained")
    cfg = TrainConfig(num_faces=16, steps_per_face=10, disc_faces=16,
                      disc_steps=10, eye_faces=12, eye_steps=10,
                      age_samples=200, train_final_disc=False)
    train_pipeline(out, cfg, verbose=False)
    model = DetectionModel.load(out)
    assert len(model.classifiers) == 22
    assert "last_cut_off_face" in model.calibration
    det = FaceDetector(model, DetectorConfig(smallest_face=0.4))
    res = det.detect(np.random.RandomState(0).rand(120, 120)
                     .astype(np.float32))
    assert isinstance(res, list)

