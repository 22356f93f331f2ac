"""Persistent XLA compilation cache setup.

The dominant cost of a cold time-to-solve is jit compilation (on the remote
TPU tunnel a large einsum graph can take minutes).  JAX's persistent
compilation cache keys the serialized executable on the HLO, so re-running
the same configuration is ~free.  Analog of the reference relying on
ahead-of-time C++ compilation (there is no runtime-compile tax to pay there);
here the cache removes it after the first run.
"""

from __future__ import annotations

import os

__all__ = ["enable_persistent_cache"]

_DEFAULT_DIR = os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache")


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Enable the JAX persistent compilation cache; returns the cache dir.

    Safe to call multiple times and before/after backend initialization.
    Returns None if the running JAX does not support the cache options.
    """
    import jax

    cache_dir = os.path.abspath(path or os.environ.get("L3STER_TPU_JAX_CACHE", _DEFAULT_DIR))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        try:
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        except Exception:
            pass
        try:
            jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
        except Exception:
            pass
    except Exception:
        return None
    return cache_dir
