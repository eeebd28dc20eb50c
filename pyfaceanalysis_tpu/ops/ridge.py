"""Linear ridge head: an optional decoder for the pose-refinement stages.

The reference decodes slow features with Gaussian-classifier soft
regression (``GaussianClassifier.regression``, consumed at
FaceDetectUpdated.py:719); :class:`ops.gaussian.GaussianRegressor` keeps
that exact behavior and stays the default. This module adds a TPU-friendly
alternative the reference does not have: measured on both synthetic
held-out sets and real annotated anchors, a ridge readout of the SAME
features decodes pose labels substantially better than the Gaussian head
(e.g. PosX1 on real anchors: corr 0.50 Gaussian vs 0.79 ridge,
tools/probe_step_damping.py), because the full-covariance class Gaussians
saturate at the label extremes when features drift off-manifold.

Outputs are clipped to the training label range, mirroring the Gaussian
head's convex-combination bound so the cascade's discard gates see the
same output envelope. ``regression`` is call-compatible with
``GaussianRegressor.regression`` (``estimate_std`` returns the training
residual std, a constant -- ridge has no per-sample posterior).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np


class RidgeRegressor(NamedTuple):
    w: jax.Array          # (D,)
    b: jax.Array          # ()
    clip_lo: jax.Array    # () training label min
    clip_hi: jax.Array    # () training label max
    resid_std: jax.Array  # () training residual std (estimate_std constant)
    # Convenience mirror of the Gaussian head's decoded-label table: the
    # cascade/probes read avg_labels only for the label RANGE; expose the
    # clip bounds the same way.

    @property
    def input_dim(self) -> int:
        return self.w.shape[0]

    @property
    def avg_labels(self) -> jax.Array:
        """Label-range stand-in ([lo, hi]) for range-reading callers."""
        return jnp.stack([self.clip_lo, self.clip_hi])

    @staticmethod
    def fit(x, y, input_dim: int, reg: float = 1e-3,
            dtype=jnp.float32) -> "RidgeRegressor":
        """Least squares with L2 ``reg`` (relative to the mean feature
        scale) on the first ``input_dim`` features."""
        x = np.asarray(x, np.float64)[:, :input_dim]
        y = np.asarray(y, np.float64)
        xm = x.mean(axis=0)
        ym = y.mean()
        xc = x - xm
        g = xc.T @ xc
        lam = reg * np.trace(g) / max(g.shape[0], 1)
        w = np.linalg.solve(g + lam * np.eye(g.shape[0]), xc.T @ (y - ym))
        pred = xc @ w + ym
        resid = float(np.sqrt(np.mean((pred - y) ** 2)))
        b = float(ym - xm @ w)
        return RidgeRegressor(jnp.asarray(w, dtype), jnp.asarray(b, dtype),
                              jnp.asarray(float(y.min()), dtype),
                              jnp.asarray(float(y.max()), dtype),
                              jnp.asarray(resid, dtype))

    def regression(self, x: jax.Array, estimate_std: bool = False
                   ) -> Union[jax.Array, Tuple[jax.Array, jax.Array]]:
        out = jnp.clip(x @ self.w + self.b, self.clip_lo, self.clip_hi)
        if not estimate_std:
            return out
        return out, jnp.broadcast_to(self.resid_std, out.shape)
