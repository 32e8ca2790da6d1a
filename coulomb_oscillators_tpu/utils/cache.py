"""Persistent XLA compilation cache.

The single-core host pays 1-5 minutes per large XLA/Mosaic compile (the
padded force program at N=1M unrolls L2L/L2P over L levels).  The
persistent cache makes every re-run of an identical program a disk hit,
which is what turns bench/profile iteration from ~30 min into ~2 min.
Call :func:`enable_compile_cache` before building engines; safe to call
multiple times (idempotent).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.environ.get("CO_JAX_CACHE_DIR", "/root/.jax_cache")
_enabled = False


def enable_compile_cache(path: str = _DEFAULT_DIR) -> None:
    global _enabled
    if _enabled:
        return
    import jax

    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _enabled = True
    except Exception:
        pass  # older jax / read-only fs: run uncached
