"""Hierarchical SFA networks as stacks of batched block-diagonal GEMMs.

The reference's "Non-Linear Ultra Thin 11 Layer Network" is an MDP hinet of
switchboards + per-receptive-field SFA nodes (SURVEY.md 2.3, call site
``flow.execute`` FaceDetectUpdated.py:699). TPU-native re-design:

- A layer owns a static (F, k) gather map ("switchboard") from the previous
  layer's flat output, a nonlinear :class:`Expansion`, and a trained affine
  :class:`LinearNode` with per-field weights (F, k_exp, d).
- Executing a layer is one gather + one einsum ``bfi,fio->bfo`` -- a
  block-diagonal matmul that XLA tiles straight onto the MXU, with the
  expansion fused into the producer.
- The whole network is a pytree (list of LinearNode) + static specs, so a
  cascade of networks lives inside a single jitted stage function.

Layer topologies are built by :mod:`pyfaceanalysis_tpu.models.builder`.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pyfaceanalysis_tpu.models.expansion import Expansion
from pyfaceanalysis_tpu.models.sfa import LinearNode


@dataclasses.dataclass(frozen=True)
class LayerSpec:
    """Static description of one layer (hashable; jit-safe as a closure).

    ``field_indices``: (F, k) indices into the previous layer's flattened
    output (field-major). ``node``: "sfa" | "pca" | "igsfa" -- which solver
    trains this layer. ``graph``: training-graph override (None = the
    trainer's task graph). ``out_dim``: features per field.
    """

    field_indices: Tuple[Tuple[int, ...], ...]
    expansion: Expansion
    out_dim: int
    node: str = "sfa"
    slow_dim: Optional[int] = None      # for igsfa: slow features kept
    # Post-projection clipping (in output-std units; outputs are whitened to
    # unit variance by the solver). Without it, whitened near-null directions
    # drift off-manifold at inference and the per-layer nonlinear expansions
    # compound the blow-up exponentially -- the same reason the reference's
    # MDP networks interleave clipping nodes. None disables.
    clip: Optional[float] = 4.0

    @property
    def num_fields(self) -> int:
        return len(self.field_indices)

    @property
    def field_size(self) -> int:
        return len(self.field_indices[0])

    def indices_array(self) -> np.ndarray:
        return np.asarray(self.field_indices, np.int32)


@dataclasses.dataclass
class HierarchicalNetwork:
    """Specs + trained params for a full network.

    ``execute`` mirrors the reference's ``flow.execute``: (B, D_in) flat
    pixel rows -> (B, D_out) slow features.
    """

    specs: Tuple[LayerSpec, ...]
    params: List[LinearNode]
    input_hw: Tuple[int, int]

    @property
    def out_dim(self) -> int:
        last = self.specs[-1]
        return last.num_fields * last.out_dim

    def execute(self, x: jax.Array) -> jax.Array:
        """(B, h*w) -> (B, out_dim). Pure function of (params, x); jit-safe."""
        return apply_network(self.specs, self.params, x)

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.execute(x)


def apply_layer(spec: LayerSpec, node: LinearNode, x: jax.Array,
                compute_dtype=None) -> jax.Array:
    """(B, P) flat -> (B, F * out_dim) flat."""
    idx = jnp.asarray(spec.indices_array())
    fields = jnp.take(x, idx, axis=1)            # (B, F, k)
    expanded = spec.expansion(fields)            # (B, F, k_exp)
    y = node(expanded, compute_dtype=compute_dtype)  # (B, F, d)
    if spec.clip is not None:
        y = jnp.clip(y, -spec.clip, spec.clip)
    return y.reshape(y.shape[0], -1)


def apply_network(specs: Sequence[LayerSpec], params: Sequence[LinearNode],
                  x: jax.Array, compute_dtype=None) -> jax.Array:
    """Runs all layers. ``compute_dtype=jnp.bfloat16`` casts the GEMM
    OPERANDS only (accumulation stays f32 via preferred_element_type) --
    the v5e MXU's bf16 path peaks at 4x the f32 rate; expansions, clipping
    and the regression heads stay f32. Opt-in (DetectorConfig.matmul_dtype)
    until the quality gate passes on hardware."""
    for spec, node in zip(specs, params):
        x = apply_layer(spec, node, x, compute_dtype=compute_dtype)
    return x
