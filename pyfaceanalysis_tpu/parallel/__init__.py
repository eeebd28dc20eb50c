"""Multi-chip scale-out: device meshes, sharded inference and training.

The reference is strictly single-process (SURVEY.md 2.4: MKL threads only;
its ThreadScheduler and parallel patch extractor are commented out). The
inherent parallelism of the workload is data parallelism over patches (all
windows are independent until the NMS barrier) and over images in batch
mode. This package maps both onto ``jax.sharding``:

- inference: the patch batch axis is sharded over a 1-D "data" mesh; XLA
  partitions every gather/GEMM automatically, and the only cross-device
  traffic is the final (tiny) mask/box gather at the NMS boundary.
- training: GSFA covariance accumulation is data-parallel over samples
  ("data" axis) and model-parallel over receptive fields ("model" axis --
  per-field covariance blocks and eigensolves are independent, the natural
  tensor-parallel split of a block-diagonal model).

There is no pipeline/sequence/expert dimension in this model family (no
sequential layer pipeline deep enough to justify PP; no attention/sequence
axis; no experts), so dp x tp is the complete sharding story.
"""

from pyfaceanalysis_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    sharded_cascade,
)
