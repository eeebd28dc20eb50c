"""Persistent XLA compilation cache for the CLI entry points.

The reference amortizes model-load cost with batch mode
(README.md:45-57); the analogous cold-start cost here is XLA compilation
of the fused cascade (~100 s on a tunneled TPU for a fresh process).
JAX's persistent compilation cache makes every process after the first
pay only cache-lookup time, which matters for the reference's
one-image-per-invocation CLI usage pattern.

Opt out with ``PFA_NO_COMPILE_CACHE=1``; relocate with
``PFA_COMPILE_CACHE_DIR``.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "pyfaceanalysis_tpu", "xla")

_enabled = False


def enable_persistent_compilation_cache() -> bool:
    """Idempotently turns on JAX's on-disk compilation cache."""
    global _enabled
    if _enabled or os.environ.get("PFA_NO_COMPILE_CACHE"):
        return _enabled
    cache_dir = os.environ.get("PFA_COMPILE_CACHE_DIR", _DEFAULT_DIR)
    try:
        import jax

        # Respect a cache the host application already configured
        # (ADVICE r2: never clobber pre-set jax config).
        if getattr(jax.config, "jax_compilation_cache_dir", None):
            _enabled = True
            return _enabled
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache every program that took >1 s to compile, regardless of
        # serialized size (the default size floor skips small programs
        # that still cost seconds of XLA time).
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _enabled = True
    except Exception:          # pragma: no cover - cache is best-effort
        _enabled = False
    return _enabled
