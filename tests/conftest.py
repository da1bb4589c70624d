"""Test harness: run JAX on CPU with 8 virtual devices.

Multi-chip sharding is validated on a fake CPU mesh (the standard JAX
pattern, SURVEY.md §4d); the real-TPU path is exercised by bench.py and the
driver's dry runs.

The surrounding environment boots a real-TPU "axon" PJRT plugin from
sitecustomize and pins ``jax_platforms=axon,cpu`` *before* conftest runs,
so env vars are too late — override the config directly (backends are not
initialized until first use, so this is safe here).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from remap_tpu.utils.runtime import setup_cache  # noqa: E402

setup_cache("/root/jax_cache_cpu", per_host=True)

import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """Two-tier suite: ``-m quick`` is the fast, full-coverage tier.

    Everything under tests/differential/ (compiled-reference oracles) is
    slow by construction; other tests are quick unless explicitly marked
    ``slow`` (the scale/invariance batteries whose mechanisms are also
    covered by a faster test).  Expected walls in docs/USAGE.md."""
    for item in items:
        if "differential" in str(item.path):
            item.add_marker(pytest.mark.slow)
        elif item.get_closest_marker("slow") is None:
            item.add_marker(pytest.mark.quick)
