"""Persistent XLA compilation cache.

First compiles through the device tunnel cost 20-150 s per program (the
phase-diagram sweep's 80-period scan took minutes); the persistent cache
reuses them across processes.  Called by the CLI, bench, and config
runners; library users can call ``enable_compilation_cache()`` themselves.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.expanduser("~"), ".cache",
                            "timecrystal_tpu_xla")
_enabled_path: str | None = None


def enable_compilation_cache(directory: str | None = None) -> str:
    """Idempotently enable the JAX persistent compilation cache.

    Re-invoking with a DIFFERENT directory reconfigures jax (an early
    library call must not silently pin a later explicit redirect to the
    default path while returning the requested one)."""
    global _enabled_path
    import jax

    path = directory or os.environ.get("TCTPU_XLA_CACHE", _DEFAULT_DIR)
    if _enabled_path == path:
        return path
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _enabled_path = path
    except Exception:
        pass  # older jax or unsupported backend: silently skip
    return path
