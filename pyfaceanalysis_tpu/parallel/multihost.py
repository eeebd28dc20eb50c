"""Multi-host batch sweep: embarrassingly parallel image batches over DCN.

SURVEY.md section 2.4: the reference's only throughput amortization is
single-process batch mode; the TPU-native scale-out story is (a) patch
parallelism over ICI within a host (parallel.mesh) and (b) IMAGE
parallelism over hosts/processes via ``jax.distributed`` -- images are
independent until their own NMS, so no cross-host collective is needed in
the detection path at all; hosts simply take disjoint slices of the batch
file and write disjoint outputs.

Usage (one process per host):

    pfa-detect --batch=big.txt --distributed=1 \
        [--coordinator=HOST:PORT --num_processes=N --process_id=K]

With no coordinator arguments, standard cluster auto-detection
(``jax.distributed.initialize()`` with env configuration) is used.
Single-process invocations degrade to the identity split, so the same code
path runs everywhere (and in CI).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> Tuple[int, int]:
    """Brings up jax.distributed (DCN rendezvous) and returns
    (process_id, num_processes). Safe to call when single-process: returns
    (0, 1) without initializing anything."""
    import jax

    if coordinator is None and num_processes is None:
        # Not explicitly distributed: stay single-process unless a cluster
        # environment is detected by JAX itself.
        try:
            return jax.process_index(), jax.process_count()
        except RuntimeError:                           # pragma: no cover
            return 0, 1
    kwargs = {}
    if coordinator:
        kwargs["coordinator_address"] = coordinator
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    return jax.process_index(), jax.process_count()


def shard_work(items: Sequence, process_id: int, num_processes: int
               ) -> List:
    """Deterministic contiguous-strided split of a work list: host k takes
    items k, k+N, k+2N, ... (keeps per-host batches spread across the file
    so early/late images balance)."""
    return list(items[process_id::num_processes])


def shard_batch_files(image_filenames: Sequence[str],
                      output_filenames: Sequence[str],
                      process_id: int, num_processes: int
                      ) -> Tuple[List[str], List[str]]:
    """Splits a batch-mode work list across processes; outputs are disjoint
    so no coordination is needed at write time."""
    return (shard_work(image_filenames, process_id, num_processes),
            shard_work(output_filenames, process_id, num_processes))
