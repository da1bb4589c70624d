"""Runtime configuration helpers (compilation cache, platform pinning)."""

from __future__ import annotations

import os


def setup_cache(path: str = "/root/jax_cache") -> None:
    """Enable JAX's persistent compilation cache.

    On the benchmark harness the TPU sits behind a remote-compile tunnel
    where even trivial XLA compiles take minutes; the persistent cache
    amortizes them across processes (measured 205s -> ~0s for a cached
    program).
    """
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
