"""Runtime configuration helpers (compilation cache, platform pinning)."""

from __future__ import annotations

import os


def setup_cache(path: str = "/root/jax_cache", per_host: bool = False) -> None:
    """Enable JAX's persistent compilation cache.

    On the benchmark harness the TPU sits behind a remote-compile tunnel
    where even trivial XLA compiles take minutes; the persistent cache
    amortizes them across processes (measured 205s -> ~0s for a cached
    program).

    ``per_host=True`` suffixes the cache directory with a fingerprint of
    this host's CPU feature flags.  XLA:CPU caches AOT machine code keyed
    WITHOUT the target machine features, so entries written on one host
    generation fail to load on another (``cpu_aot_loader`` error spam +
    a full recompile per program — a CPU-platform test suite measured
    minutes slower against a stale cache).  Use it for any cache a
    CPU-pinned process writes; the TPU cache's programs are compiled for
    the chip and stay valid across host swaps.
    """
    import jax

    if per_host:
        path = f"{path}-{_host_fingerprint()}"
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def _host_fingerprint() -> str:
    """Short stable hash of this host's CPU identity (see setup_cache).

    Hashes the feature flags AND the family/model/stepping/model-name
    lines: two microarchitectures can share a flag set while LLVM tunes
    them differently, so flags alone under-key the cache.  (Note:
    ``cpu_aot_loader`` errors about +prefer-no-scatter/+prefer-no-gather
    are NOT a cross-host signal by themselves — the loader rejects those
    tuning pseudo-features even on the writing host, while the outer
    serialized-executable cache still loads; see BENCHMARKS.md
    "measurement traps".)"""
    import hashlib

    keys = ("flags", "Features", "model name", "cpu family", "model\t",
            "model:", "stepping")
    parts = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(keys) and ":" in line:
                    key, val = line.split(":", 1)
                    entry = f"{key.strip()}={val.strip()}"
                    if entry not in parts:
                        parts.append(entry)
                if line.strip() == "" and parts:
                    break  # first core's block is enough
    except OSError:
        pass
    if not parts:
        import platform

        parts = [platform.processor()]
    return hashlib.md5("|".join(sorted(parts)).encode()).hexdigest()[:10]
