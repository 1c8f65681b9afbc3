"""Persistent XLA compilation cache.

The fused sliced pipeline compiles in ~1 minute on a healthy TPU link and up
to ~5 minutes when the remote-compile service is congested. Enabling JAX's
persistent compilation cache makes every subsequent process start-up hit the
on-disk executable (measured 0.8s -> 0.02s for a toy jit; minutes -> seconds
for the full pipeline), which de-flakes benchmarks and CLI start-up.
"""
from __future__ import annotations

import os

DEFAULT_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    import jax

    cache_dir = cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR", DEFAULT_CACHE_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
