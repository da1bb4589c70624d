"""Test harness: run JAX on CPU with 8 virtual devices.

Multi-chip sharding is validated on a fake CPU mesh (the standard JAX
pattern, SURVEY.md §4d); the real-TPU path is exercised by bench.py and the
driver's dry runs.  Must run before any jax import.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
