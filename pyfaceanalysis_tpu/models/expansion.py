"""Nonlinear feature expansions for SFA layers.

The reference's networks interleave linear SFA/PCA projections with nonlinear
expansions (cuicuilco ``nonlinear_expansion``, imported at
FaceDetectUpdated.py:24-46 to satisfy unpickling; the "Non-Linear Ultra Thin
11 Layer Network" names in Pipelines/Pipeline_experimental.txt). We define our
own expansion family rather than porting cuicuilco's:

- ``identity``: x
- ``spow``:     [x, sign(x) * |x|^e] with e = 0.8 -- the classic "0.8Exp"
                compressive expansion; doubles the dimension.
- ``qt{k}``:    [x, upper-triangular products x_i * x_j for i <= j < k] --
                quadratic terms restricted to the first k components to bound
                the dimension blow-up.

All expansions are shape-static elementwise/outer-product ops that XLA fuses
into the surrounding GEMMs; they operate on the trailing axis so the same
code serves (B, D) flat batches and (B, F, D) per-field layer inputs.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Expansion:
    """A named nonlinear expansion of the trailing feature axis.

    ``name`` is one of ``identity``, ``spow`` or ``qt{k}`` (e.g. ``qt8``).
    """

    name: str = "identity"
    exponent: float = 0.8

    def output_dim(self, d: int) -> int:
        if self.name == "identity":
            return d
        if self.name == "spow":
            return 2 * d
        if self.name.startswith("qt"):
            k = min(int(self.name[2:]), d)
            return d + k * (k + 1) // 2
        raise ValueError(f"unknown expansion {self.name!r}")

    def __call__(self, x):
        x = jnp.asarray(x)
        if self.name == "identity":
            return x
        if self.name == "spow":
            e = jnp.sign(x) * jnp.abs(x) ** self.exponent
            return jnp.concatenate([x, e], axis=-1)
        if self.name.startswith("qt"):
            k = min(int(self.name[2:]), x.shape[-1])
            head = x[..., :k]
            # Upper-triangular (i <= j) products, flattened in a fixed order.
            iu, ju = np.triu_indices(k)
            prods = head[..., iu] * head[..., ju]
            return jnp.concatenate([x, prods], axis=-1)
        raise ValueError(f"unknown expansion {self.name!r}")
