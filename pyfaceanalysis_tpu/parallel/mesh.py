"""Mesh construction + sharded cascade execution."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pyfaceanalysis_tpu.engine import cascade as cascade_mod


def make_mesh(n_devices: Optional[int] = None,
              axes: Tuple[str, ...] = ("data",),
              shape: Optional[Tuple[int, ...]] = None) -> Mesh:
    """A mesh over the first ``n_devices`` devices (default: all)."""
    devices = jax.devices()[: n_devices or len(jax.devices())]
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axes) - 1)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axes)


def shard_batch(mesh: Mesh, tree, axis: str = "data"):
    """Places every leaf with sharding along its leading (batch) axis."""
    def place(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(place, tree)


def replicate(mesh: Mesh, tree):
    def place(x):
        return jax.device_put(x, NamedSharding(mesh, P()))
    return jax.tree_util.tree_map(place, tree)


def sharded_cascade(mesh: Mesh, plan, specs_tuple, geom, cfg, patch_hw,
                    image, net_params, clf_params,
                    state: cascade_mod.CascadeState
                    ) -> cascade_mod.CascadeState:
    """Runs the detection cascade with the patch batch sharded over
    ``mesh``'s "data" axis; weights and the image are replicated.

    The jitted program is the SAME single-chip cascade -- XLA's SPMD
    partitioner splits the batch dimension of every gather/GEMM; no
    collectives are needed until the caller gathers the result.
    """
    state = shard_batch(mesh, state)
    image = replicate(mesh, image)
    net_params = replicate(mesh, net_params)
    clf_params = replicate(mesh, clf_params)
    return cascade_mod.run_cascade(plan, specs_tuple, geom, cfg, patch_hw,
                                   image, net_params, clf_params, state)
