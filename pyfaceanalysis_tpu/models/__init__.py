"""Model zoo: SFA/GSFA/PCA nodes, nonlinear expansions, hierarchical networks.

TPU-native replacement for the external cuicuilco/MDP node-and-flow engine the
reference delegates to (SURVEY.md section 2.3): a network is a pytree of
per-layer weights executed as batched block-diagonal GEMMs, and training is
covariance accumulation (MXU matmuls) + a generalized symmetric eigenproblem.
"""

from pyfaceanalysis_tpu.models.expansion import Expansion  # noqa: F401
from pyfaceanalysis_tpu.models.network import (  # noqa: F401
    HierarchicalNetwork,
    LayerSpec,
)
from pyfaceanalysis_tpu.models.sfa import LinearNode  # noqa: F401
