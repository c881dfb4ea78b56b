"""Persistent XLA compilation cache (compiles via the axon remote-compile
service are slow and highly variable — cache them across processes)."""

import os

import jax


def enable_compilation_cache(path: str | None = None) -> None:
    path = path or os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
