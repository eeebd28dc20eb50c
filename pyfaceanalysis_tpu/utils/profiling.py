"""Profiling facade: phase timers (utils.benchmark) + jax.profiler traces.

The reference's observability is the label-keyed ``Benchmark`` timer table
(benchmarking.py:11-108). On TPU the interesting time is on DEVICE, which
host timers cannot attribute -- this module adds the jax.profiler hooks:

    with trace("/tmp/pfa-trace"):           # xplane dump for xprof/tensorboard
        detector.detect(image)

    with annotate("cascade"):               # named region inside a trace
        ...

Traces are written as xplane protos under the given directory; inspect with
``tensorboard --logdir`` or xprof. Device-time *numbers* for quick looks
come from tools/profile_stages.py (dispatch-pipelined timing) instead.
"""

from __future__ import annotations

import contextlib
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False) -> Iterator[None]:
    """jax.profiler.trace wrapper (no-op if profiling is unavailable)."""
    import jax

    try:
        with jax.profiler.trace(log_dir,
                                create_perfetto_link=create_perfetto_link):
            yield
    except Exception as e:                              # pragma: no cover
        print(f"[profiling] trace unavailable ({e}); running unprofiled")
        yield


def annotate(name: str):
    """Named trace region (TraceAnnotation); usable as context manager."""
    import jax

    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def maybe_trace(log_dir: Optional[str]) -> Iterator[None]:
    """trace(log_dir) when a directory is given, else a no-op."""
    if log_dir:
        with trace(log_dir):
            yield
    else:
        yield
