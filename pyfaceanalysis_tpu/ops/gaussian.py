"""Gaussian classifier used as a soft regressor -- the cascade "decoder".

Numerically reproduces ``mdp.nodes.GaussianClassifier`` +
``cuicuilco.patch_mdp``'s monkey-patched ``regression(y, avg_labels,
estimate_std=)`` (consumed at FaceDetectUpdated.py:719, face_analysis.py:1071,
1263-1290):

    P(c | x) ~ prior_c * (2*pi)^(-D/2) / sqrt_det_cov_c
               * exp(-1/2 (x - mu_c)^T inv_cov_c (x - mu_c))
    regression(x) = sum_c P(c | x) * avg_labels_c
    std(x)        = sqrt(sum_c P(c | x) * avg_labels_c^2 - regression(x)^2)

TPU design: the per-class Mahalanobis quadratic form is expanded to three
MXU-friendly contractions -- x^T A x via one (B,D)x(D, C*D) matmul and an
elementwise reduce, the cross term as a single matmul against the (C*D -> C)
folded ``A mu`` vectors, and a precomputed constant ``mu^T A mu``. Posteriors
come from a log-softmax (the (2*pi)^(-D/2) constant cancels).

Parameters are a pytree so a whole cascade of classifiers can live inside one
jitted stage function.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np


class GaussianRegressor(NamedTuple):
    """Parameters of one Gaussian classifier / soft regressor.

    Mirrors the attributes of the shipped ``SavedClassifiers/*.pckl``
    (SURVEY.md section 2.2): ``means`` (C, D), ``inv_covs`` (C, D, D),
    ``_sqrt_def_covs`` (C,), priors ``p`` (C,), ``avg_labels`` (C,).
    Precomputed fields keep ``regression`` to two matmuls.
    """

    means: jax.Array            # (C, D)
    inv_covs: jax.Array         # (C, D, D)
    log_norm: jax.Array         # (C,) = log(prior_c) - log(sqrt_det_cov_c)
    avg_labels: jax.Array       # (C,)

    @property
    def num_classes(self) -> int:
        return self.means.shape[0]

    @property
    def input_dim(self) -> int:
        """Feature truncation width (classifier ``input_dim``,
        FaceDetectUpdated.py:709)."""
        return self.means.shape[1]

    @staticmethod
    def create(means, inv_covs, sqrt_det_covs, priors, avg_labels,
               dtype=jnp.float32) -> "GaussianRegressor":
        means = jnp.asarray(means, dtype)
        inv_covs = jnp.asarray(inv_covs, dtype)
        sqrt_det_covs = np.asarray(sqrt_det_covs, np.float64)
        priors = np.asarray(priors, np.float64)
        log_norm = jnp.asarray(np.log(priors) - np.log(sqrt_det_covs), dtype)
        return GaussianRegressor(means, inv_covs, log_norm,
                                 jnp.asarray(avg_labels, dtype))

    @staticmethod
    def fit(x, labels, avg_labels=None, reg: float = 1e-3,
            dtype=jnp.float32) -> "GaussianRegressor":
        """Trains per-class Gaussians (the reference trains them via MDP's
        GaussianClassifier; cuicuilco feeds class indices with per-class mean
        labels as ``avg_labels``).

        Args:
            x: (N, D) features.
            labels: (N,) integer class indices in [0, C).
            avg_labels: (C,) regression target per class; defaults to the
                class index as float.
            reg: relative Tikhonov term: ``reg * mean(diag(cov))`` is added
                to each covariance diagonal (guards small/degenerate classes).
        """
        x = np.asarray(x, np.float64)
        labels = np.asarray(labels)
        classes = np.unique(labels)
        C, D = len(classes), x.shape[1]
        means = np.zeros((C, D))
        inv_covs = np.zeros((C, D, D))
        log_sqrt_det = np.zeros(C)
        priors = np.zeros(C)
        for i, c in enumerate(classes):
            xc = x[labels == c]
            priors[i] = len(xc) / len(x)
            means[i] = xc.mean(axis=0)
            cov = np.cov(xc, rowvar=False, bias=False)
            cov = np.atleast_2d(cov)
            scale = max(np.trace(cov) / D, 1e-12)
            cov = cov + (reg * scale + 1e-12) * np.eye(D)
            inv_covs[i] = np.linalg.inv(cov)
            log_sqrt_det[i] = 0.5 * np.linalg.slogdet(cov)[1]
        if avg_labels is None:
            avg_labels = classes.astype(np.float64)
        log_norm = jnp.asarray(np.log(priors) - log_sqrt_det, dtype)
        return GaussianRegressor(jnp.asarray(means, dtype),
                                 jnp.asarray(inv_covs, dtype), log_norm,
                                 jnp.asarray(avg_labels, dtype))

    def log_posteriors(self, x: jax.Array) -> jax.Array:
        """(B, D) -> (B, C) unnormalized log posteriors.

        Uses the centered form (x - mu)^T A (x - mu) rather than the expanded
        x^T A x - 2 x^T A mu + mu^T A mu: the expanded form loses several
        digits to cancellation in float32 when ||x|| >> ||x - mu||, which is
        exactly the regime of well-matched patches. The (B, C, D) diff
        contraction is still one fused MXU-friendly einsum.
        """
        diff = x[:, None, :] - self.means[None, :, :]          # (B, C, D)
        dA = jnp.einsum("bcd,cde->bce", diff, self.inv_covs,
                        preferred_element_type=jnp.float32)
        maha = jnp.einsum("bce,bce->bc", dA, diff)
        # Guard float32 overflow on far-off-manifold inputs: an infinite
        # quadratic form would make every logit -inf and the softmax NaN;
        # clamping keeps the posterior well-defined (winner still wins).
        maha = jnp.clip(maha, 0.0, 3.0e37)
        return self.log_norm[None, :] - 0.5 * maha

    def posteriors(self, x: jax.Array) -> jax.Array:
        logp = self.log_posteriors(x)
        # Stable softmax around the per-row max; rows whose every logit
        # underflows fall back to the winner-take-all class, never NaN.
        logp = logp - jax.lax.stop_gradient(logp.max(axis=-1, keepdims=True))
        p = jnp.exp(jnp.maximum(logp, -80.0))
        return p / p.sum(axis=-1, keepdims=True)

    def regression(self, x: jax.Array, estimate_std: bool = False
                   ) -> Union[jax.Array, Tuple[jax.Array, jax.Array]]:
        """Soft regression output (B,), optionally with posterior label std.

        Features beyond ``input_dim`` must already be truncated by the caller
        (the reference truncates ``sl[:, 0:classifier.input_dim]``).
        """
        p = self.posteriors(x)
        reg = p @ self.avg_labels
        if not estimate_std:
            return reg
        second = p @ (self.avg_labels ** 2)
        var = jnp.maximum(second - reg ** 2, 0.0)
        return reg, jnp.sqrt(var)

    def classify(self, x: jax.Array) -> jax.Array:
        """Hard class index (argmax posterior), mirror of MDP ``label()``."""
        return jnp.argmax(self.log_posteriors(x), axis=-1)
