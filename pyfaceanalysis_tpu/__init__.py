"""pyfaceanalysis_tpu: a TPU-native (JAX/XLA/Pallas) face-analysis framework.

Re-implements the capabilities of PyFaceAnalysis (face detection, eye
localization, and age/race/gender estimation via cascades of hierarchical
Slow Feature Analysis networks + Gaussian soft-regressors) as an idiomatic
JAX framework:

- patches live as fixed-shape ``(B, h, w)`` tensors with validity masks;
  "discarding" a patch is a mask update, never a dynamic reshape,
- patch extraction is a batched rotated bilinear/nearest gather on device,
- HiGSFA flows execute as stacks of per-layer batched GEMMs (receptive-field
  nodes as block-diagonal matmuls) with fused nonlinear expansions,
- Gaussian classifier regression is a batched Mahalanobis quadratic form +
  log-softmax posterior dotted with per-class average labels,
- scale-out is ``shard_map`` over a 1-D data mesh of the patch batch.

Reference behavior: AlbertoEsc/PyFaceAnalysis (``FaceDetectUpdated.py``,
``face_analysis.py``, ``face_normalization_tools.py``); see SURVEY.md.
"""

__version__ = "0.1.0"

from pyfaceanalysis_tpu import geometry  # noqa: F401
from pyfaceanalysis_tpu.config import DetectorConfig  # noqa: F401
from pyfaceanalysis_tpu.utils.compile_cache import (  # noqa: F401
    enable_persistent_compilation_cache,
)

# NOTE: the persistent XLA compile cache is enabled by the CLI entry points
# (apps/*, bench.py), not at package import -- a host application embedding
# this package keeps full control of its own jax config (ADVICE r2).
