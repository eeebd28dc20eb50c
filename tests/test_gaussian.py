"""Golden tests of the Gaussian soft-regressor.

Verifies against (a) hand-computed MDP GaussianClassifier posteriors in
NumPy, and (b) the reference's shipped classifier pickles when available.
"""

import glob
import os

import numpy as np
import pytest

from pyfaceanalysis_tpu.ops.gaussian import GaussianRegressor
from tests.conftest import REFERENCE_DIR, reference_available


def mdp_reference_regression(x, means, inv_covs, sqrt_det_covs, priors,
                             avg_labels, estimate_std=False):
    """Literal NumPy transcription of mdp GaussianClassifier semantics:
    P(c|x) ~ prior * (2pi)^(-D/2)/sqrt_det_cov * exp(-maha/2), then
    regression = posterior . avg_labels."""
    B, D = x.shape
    C = len(means)
    probs = np.zeros((B, C))
    for c in range(C):
        diff = x - means[c]
        maha = np.einsum("bd,de,be->b", diff, inv_covs[c], diff)
        probs[:, c] = (priors[c] * (2 * np.pi) ** (-D / 2) / sqrt_det_covs[c]
                       * np.exp(-0.5 * maha))
    post = probs / probs.sum(axis=1, keepdims=True)
    reg = post @ avg_labels
    if not estimate_std:
        return reg
    second = post @ (np.asarray(avg_labels) ** 2)
    return reg, np.sqrt(np.maximum(second - reg ** 2, 0.0))


def random_classifier(rng, C=7, D=5):
    means = rng.normal(size=(C, D))
    covs = []
    for _ in range(C):
        A = rng.normal(size=(D, D))
        covs.append(A @ A.T + 0.5 * np.eye(D))
    covs = np.array(covs)
    inv_covs = np.linalg.inv(covs)
    sqrt_det = np.sqrt(np.linalg.det(covs))
    priors = rng.uniform(0.5, 2.0, size=C)
    priors /= priors.sum()
    avg_labels = rng.normal(size=C) * 10
    return means, inv_covs, sqrt_det, priors, avg_labels


def test_regression_matches_mdp_semantics():
    rng = np.random.default_rng(0)
    means, inv_covs, sqrt_det, priors, avg_labels = random_classifier(rng)
    x = rng.normal(size=(32, means.shape[1]))
    ref = mdp_reference_regression(x, means, inv_covs, sqrt_det, priors,
                                   avg_labels)
    reg = GaussianRegressor.create(means, inv_covs, sqrt_det, priors,
                                   avg_labels)
    out = np.asarray(reg.regression(x.astype(np.float32)))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_regression_estimate_std():
    rng = np.random.default_rng(1)
    means, inv_covs, sqrt_det, priors, avg_labels = random_classifier(rng)
    x = rng.normal(size=(16, means.shape[1]))
    ref_reg, ref_std = mdp_reference_regression(
        x, means, inv_covs, sqrt_det, priors, avg_labels, estimate_std=True)
    reg = GaussianRegressor.create(means, inv_covs, sqrt_det, priors,
                                   avg_labels)
    out, std = reg.regression(x.astype(np.float32), estimate_std=True)
    np.testing.assert_allclose(np.asarray(out), ref_reg, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(std), ref_std, rtol=2e-3, atol=2e-3)


def test_posteriors_sum_to_one():
    rng = np.random.default_rng(2)
    means, inv_covs, sqrt_det, priors, avg_labels = random_classifier(rng)
    reg = GaussianRegressor.create(means, inv_covs, sqrt_det, priors,
                                   avg_labels)
    x = rng.normal(size=(8, means.shape[1])).astype(np.float32)
    p = np.asarray(reg.posteriors(x))
    np.testing.assert_allclose(p.sum(axis=1), 1.0, atol=1e-5)
    assert (p >= 0).all()


def test_fit_recovers_classes():
    rng = np.random.default_rng(3)
    # Three well-separated Gaussian blobs; regression should interpolate the
    # class labels smoothly and classify cleanly.
    centers = np.array([[-5.0, 0.0], [0.0, 5.0], [5.0, 0.0]])
    xs, ys = [], []
    for i, c in enumerate(centers):
        xs.append(rng.normal(size=(200, 2)) * 0.5 + c)
        ys.append(np.full(200, i))
    x = np.concatenate(xs)
    y = np.concatenate(ys)
    reg = GaussianRegressor.fit(x, y, avg_labels=np.array([-1.0, 0.0, 1.0]))
    pred = np.asarray(reg.regression(centers.astype(np.float32)))
    np.testing.assert_allclose(pred, [-1.0, 0.0, 1.0], atol=1e-2)
    cls = np.asarray(reg.classify(x.astype(np.float32)))
    assert (cls == y).mean() > 0.99


@pytest.mark.skipif(not reference_available(),
                    reason="reference pickles not mounted")
def test_legacy_pickles_convert_and_agree():
    from pyfaceanalysis_tpu.io.legacy import (
        gaussian_regressor_from_legacy, load_legacy_pickle)

    paths = sorted(glob.glob(
        os.path.join(REFERENCE_DIR, "SavedClassifiers", "*.pckl")))
    assert len(paths) >= 19  # the reference ships 19 classifier pickles
    rng = np.random.default_rng(4)
    for path in paths[::4]:  # spot-check a spread of classifiers
        obj = load_legacy_pickle(path)
        d = obj.__dict__
        means = np.asarray(d["means"], np.float64)
        inv_covs = np.asarray(d["inv_covs"], np.float64)
        sqrt_det = np.asarray(d["_sqrt_def_covs"], np.float64)
        priors = np.asarray(d["p"], np.float64)
        avg_labels = np.asarray(d["avg_labels"], np.float64)
        C, D = means.shape

        reg = gaussian_regressor_from_legacy(path)
        assert reg.num_classes == C and reg.input_dim == D

        # Probe near the class means (far-away probes underflow in the
        # NumPy reference formula).
        x = means[rng.integers(0, C, size=24)] + rng.normal(size=(24, D)) * 0.1
        ref = mdp_reference_regression(x, means, inv_covs, sqrt_det, priors,
                                       avg_labels)
        out = np.asarray(reg.regression(x.astype(np.float32)))
        span = max(avg_labels.max() - avg_labels.min(), 1.0)
        np.testing.assert_allclose(out, ref, atol=5e-3 * span)


class TestRidgeHead:
    """Optional linear decoder for the pose stages (ops.ridge)."""

    def test_fit_recovers_linear_map_and_clips(self):
        import jax.numpy as jnp

        from pyfaceanalysis_tpu.ops.ridge import RidgeRegressor
        rng = np.random.default_rng(3)
        w_true = rng.normal(size=6)
        x = rng.normal(size=(500, 9)).astype(np.float32)  # 3 extra dims
        y = x[:, :6] @ w_true + 0.7
        clf = RidgeRegressor.fit(x, y, input_dim=6, reg=1e-8)
        assert clf.input_dim == 6
        pred = np.asarray(clf.regression(jnp.asarray(x[:, :6])))
        np.testing.assert_allclose(pred, np.clip(y, y.min(), y.max()),
                                   atol=1e-3)
        # Off-manifold inputs clip to the training label range (the
        # Gaussian head's convex-combination envelope).
        far = np.asarray(clf.regression(jnp.asarray(
            100.0 * np.ones((1, 6), np.float32))))
        assert y.min() - 1e-5 <= far[0] <= y.max() + 1e-5
        out, std = clf.regression(jnp.asarray(x[:, :6]), estimate_std=True)
        assert std.shape == out.shape and float(std[0]) < 0.1

    def test_artifact_roundtrip(self, tmp_path):
        import jax.numpy as jnp

        from pyfaceanalysis_tpu.io import artifacts
        from pyfaceanalysis_tpu.ops.ridge import RidgeRegressor
        rng = np.random.default_rng(4)
        x = rng.normal(size=(200, 5)).astype(np.float32)
        y = x @ rng.normal(size=5) + 1.0
        clf = RidgeRegressor.fit(x, y, input_dim=5)
        path = str(tmp_path / "clf_PosX9.npz")
        artifacts.save_classifier(path, clf, 5)
        back = artifacts.load_classifier(path)
        assert type(back).__name__ == "RidgeRegressor"
        np.testing.assert_allclose(
            np.asarray(back.regression(jnp.asarray(x))),
            np.asarray(clf.regression(jnp.asarray(x))), rtol=1e-6)
