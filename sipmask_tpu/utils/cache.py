"""Persistent XLA compilation cache.

Model graphs here take 30-300s to compile; enabling JAX's persistent cache
makes every entry point (bench, CLI tools, tests) reuse compilations across
processes. Repo-local by default (``.jax_cache/``, gitignored); override
with SIPMASK_CACHE_DIR.
"""

from __future__ import annotations

import os

import jax

_enabled = False


def enable_compile_cache(cache_dir: str | None = None) -> str:
    global _enabled
    if cache_dir is None:
        cache_dir = os.environ.get("SIPMASK_CACHE_DIR") or os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache")
    if not _enabled:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _enabled = True
    return cache_dir
