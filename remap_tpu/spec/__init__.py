"""Pure-NumPy executable specification of the reference pipeline.

Every module here re-states, in plain NumPy, the exact observable semantics
of the corresponding C++ module in /root/reference/src — including its
quirks (off-by-one processing bounds, exclusive bbox fills, wrap-around
counts).  The JAX device kernels in ``remap_tpu.ops`` are tested bit-exactly
against this spec; the spec itself is tested against tiny hand-computed
cases.  The reference ships no tests (SURVEY.md §4), so this package is the
ground truth for "pixel-exact vs the C++ reference".

The spec is written for clarity and testability, not speed.
"""
