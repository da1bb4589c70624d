"""Shared fixtures for the compiled-reference differential suite."""

import pytest

from tests.differential import ref_full


@pytest.fixture(scope="session")
def ref_binary(tmp_path_factory):
    """The full C++ reference compiled once per session (~1-2 min on this
    host); shared by the e2e and fuzz differentials."""
    out = tmp_path_factory.mktemp("refbin")
    return ref_full.build_reference(out)
