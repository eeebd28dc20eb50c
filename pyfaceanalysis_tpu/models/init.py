"""Deterministic random initialization of network/classifier params.

Used by compile checks, benchmarks on untrained topologies, and as the
starting point for on-device refresh training. Orthonormal per-field
projections keep activations O(1) through the stack.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from pyfaceanalysis_tpu.models.network import HierarchicalNetwork
from pyfaceanalysis_tpu.models.sfa import LinearNode
from pyfaceanalysis_tpu.ops.gaussian import GaussianRegressor


def random_network_params(net: HierarchicalNetwork, seed: int = 0
                          ) -> HierarchicalNetwork:
    """Fills ``net.params`` with orthonormal random projections."""
    rng = np.random.RandomState(seed)
    params: List[LinearNode] = []
    import dataclasses
    for spec in net.specs:
        de = spec.expansion.output_dim(spec.field_size)
        F = spec.num_fields
        W = np.zeros((F, de, spec.out_dim), np.float32)
        for f in range(F):
            q, _ = np.linalg.qr(rng.randn(de, spec.out_dim))
            W[f] = q[:, :spec.out_dim]
        mean = rng.randn(F, de).astype(np.float32) * 0.01
        params.append(LinearNode(jnp.asarray(mean), jnp.asarray(W)))
    return dataclasses.replace(net, params=params)


def random_classifier(input_dim: int, num_classes: int,
                      avg_lo: float, avg_hi: float,
                      seed: int = 0) -> GaussianRegressor:
    rng = np.random.RandomState(seed)
    means = rng.randn(num_classes, input_dim)
    covs = np.stack([np.eye(input_dim)] * num_classes)
    return GaussianRegressor.create(
        means, covs, np.ones(num_classes),
        np.full(num_classes, 1.0 / num_classes),
        np.linspace(avg_lo, avg_hi, num_classes))
