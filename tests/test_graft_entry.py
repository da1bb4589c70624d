"""Driver contract: entry() compile-checks and dryrun_multichip runs."""

import sys
import os

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft  # noqa: E402


def test_entry_is_jittable():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out.atlas.ndim == 4
    assert out.offsets.shape[:2] == out.matched.shape


def test_dryrun_multichip_8():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device fake mesh (conftest sets it up)")
    graft.dryrun_multichip(8)


def test_dryrun_multichip_2():
    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    graft.dryrun_multichip(2)
