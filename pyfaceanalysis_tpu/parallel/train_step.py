"""Sharded GSFA training step (dp over samples x tp over receptive fields).

One "training step" of this model family = accumulate graph covariances over
a data batch and re-solve the per-field generalized eigenproblems:

    B_f = cov over samples of x[:, f, :]          (data-parallel reduction)
    A_f = cov over samples of dx[:, f, :]         (temporal-difference graph)
    W_f = smallest generalized eigenvectors of (A_f, B_f)

Sharding: the sample axis is split over the mesh's "data" axis (each device
reduces its shard; XLA inserts the psum), and the field axis over "model"
(per-field (D, D) covariance blocks and eigensolves are independent -- the
tensor-parallel split natural to a block-diagonal model). The whole step is
one jitted program; ``jax.lax.linalg.eigh`` runs batched per shard.

Used by the multi-chip dry run (__graft_entry__.dryrun_multichip) and as the
on-device refresh path for continual training.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@partial(jax.jit, static_argnames=("out_dim",))
def gsfa_step(x: jax.Array, out_dim: int) -> Tuple[jax.Array, jax.Array]:
    """(N, F, D) samples -> (mean (F, D), W (F, D, out_dim)).

    Temporal graph: consecutive samples are graph neighbors. All-float32;
    the eigensolve is regularized for stability on device.
    """
    n = x.shape[0]
    mean = x.mean(axis=0)
    xc = x - mean
    B = jnp.einsum("nfd,nfe->fde", xc, xc,
                   preferred_element_type=jnp.float32) / (n - 1)
    dx = xc[1:] - xc[:-1]
    A = jnp.einsum("nfd,nfe->fde", dx, dx,
                   preferred_element_type=jnp.float32) / (n - 1)

    D = x.shape[-1]
    eye = jnp.eye(D)
    trB = jnp.trace(B, axis1=-2, axis2=-1)[:, None, None] / D
    Breg = B + 1e-5 * trB * eye
    evals, evecs = jnp.linalg.eigh(Breg)                  # (F, D), (F, D, D)
    wh = evecs / jnp.sqrt(jnp.maximum(evals, 1e-10))[:, None, :]
    M = jnp.einsum("fde,fdg,fgh->feh", wh, A, wh)
    M = (M + jnp.swapaxes(M, -1, -2)) * 0.5
    _, V = jnp.linalg.eigh(M)
    W = jnp.einsum("fde,feo->fdo", wh, V[..., :out_dim])
    return mean, W


def sharded_gsfa_step(mesh: Mesh, x, out_dim: int):
    """Places (N, F, D) with N over "data" and F over "model", then runs
    :func:`gsfa_step` under the mesh -- the canonical multi-chip training
    step of the framework."""
    x = jax.device_put(x, NamedSharding(mesh, P("data", "model", None)))
    with jax.sharding.use_mesh(mesh) if hasattr(jax.sharding, "use_mesh") \
            else _null():
        return gsfa_step(x, out_dim)


class _null:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False


def sharded_train_network(mesh: Mesh, net, x, graph: str = "serial",
                          labels=None, num_groups: int = 50,
                          label_weights=None, verbose: bool = False):
    """The PRODUCTION trainer's layer-wise step under a data mesh.

    Unlike :func:`gsfa_step` (a self-contained temporal-graph demo kept for
    the minimal dp x tp example), this drives the real
    ``training.trainer.train_network`` -- serial/clustered graph moments
    (models.moments), iGSFA solves, the lot -- with the sample axis sharded
    over ``mesh``'s "data" axis. ``pfa-train --data_mesh=N`` and the
    multi-chip dry run both go through here, so the path the dry run
    validates IS the path the trainer runs.
    """
    from pyfaceanalysis_tpu.training.trainer import train_network
    return train_network(net, x, graph=graph, labels=labels,
                         num_groups=num_groups, label_weights=label_weights,
                         verbose=verbose, mesh=mesh)
