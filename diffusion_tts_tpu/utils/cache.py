"""Persistent XLA compilation cache.

The axon TPU backend remote-compiles; large UNet graphs take 30-200s per
(shape, program) the first time. The persistent cache brings repeat
compiles down to seconds across processes. Call enable_compilation_cache()
before the first jit execution (bench.py, main.py, train.py, and the
driver entry points all do).
"""
from __future__ import annotations

import os

import jax

DEFAULT_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), ".jax_cache")


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    explicit = cache_dir is not None
    cache_dir = cache_dir or os.environ.get("DTTS_JAX_CACHE") or DEFAULT_CACHE_DIR
    # CPU AOT executables are host-machine-feature-specific; sharing one
    # dir between the (remote) TPU backend and local CPU runs makes XLA
    # load mismatched AOT results (SIGILL warnings). Key by backend — for
    # the env-provided DTTS_JAX_CACHE too, or the exact failure this split
    # exists to prevent recurs for anyone setting the var. An explicit
    # argument is the caller's responsibility (tests pin a CPU-only dir).
    if not explicit and jax.default_backend() == "cpu":
        cache_dir = cache_dir + "_localcpu"
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    return cache_dir


__all__ = ["enable_compilation_cache"]
