"""Invariants of the capture-wear transforms (utils.wear).

The compiled-reference differential on worn clips lives in
tests/differential/test_ref_wear.py; these are the fast checks that the
wear model itself does what its docstrings say — frames and camera stay
aligned, damage is bounded and deterministic — so a differential
failure can only mean pipeline behavior, never a drifting generator.
"""

import numpy as np

from remap_tpu.utils import gameplay, wear


def _session():
    return gameplay.play_session(seed=5, n_frames=60, frame_hw=(120, 160))


def test_lag_duplicates_are_byte_identical():
    s = _session()
    rng = np.random.default_rng(0)
    w = wear.with_lag(s, rng, dup_prob=0.2)
    assert len(w.frames) > len(s.frames)
    assert len(w.frames) == len(w.camera)
    # every frame in the worn stream is one of the originals, in order,
    # and a repeated camera entry always carries a repeated frame
    j = 0
    for f, c in zip(w.frames, w.camera):
        while not np.array_equal(f, s.frames[j]):
            j += 1
        assert c == s.camera[j]


def test_drops_keep_endpoints_and_alignment():
    s = _session()
    rng = np.random.default_rng(1)
    w = wear.with_drops(s, rng, drop_prob=0.3)
    assert len(w.frames) < len(s.frames)
    assert len(w.frames) == len(w.camera)
    assert np.array_equal(w.frames[0], s.frames[0])
    assert np.array_equal(w.frames[-1], s.frames[-1])
    # surviving (frame, camera) pairs are original pairs
    j = 0
    for f, c in zip(w.frames, w.camera):
        while not np.array_equal(f, s.frames[j]):
            j += 1
        assert c == s.camera[j]


def test_tears_are_two_frame_compositions():
    s = _session()
    rng = np.random.default_rng(2)
    w = wear.with_tears(s, rng, tear_prob=0.5)
    assert len(w.frames) == len(s.frames)
    torn = 0
    for i in range(1, len(s.frames)):
        f = w.frames[i]
        if np.array_equal(f, s.frames[i]):
            continue
        torn += 1
        # rows must split cleanly: a prefix from frame i, suffix from i-1
        rows_new = (f == s.frames[i]).all(axis=1)
        rows_old = (f == s.frames[i - 1]).all(axis=1)
        assert (rows_new | rows_old).all()
        split = int(np.argmin(rows_new)) if not rows_new.all() else len(f)
        assert rows_new[:split].all() and rows_old[split:].all()
    assert torn >= 5  # tear_prob=0.5 over 59 candidates


def test_specks_bounded_per_frame():
    s = _session()
    rng = np.random.default_rng(3)
    w = wear.with_specks(s, rng, per_frame=9)
    for a, b in zip(w.frames, s.frames):
        d = int((a != b).sum())
        assert 0 < d <= 9 or d == 0  # collisions/no-op flips allowed
    assert any((a != b).any() for a, b in zip(w.frames, s.frames))


def test_specks_respect_region():
    s = _session()
    rng = np.random.default_rng(6)
    w = wear.with_specks(s, rng, per_frame=20, region=(10, 50, 20, 100))
    touched = False
    for a, b in zip(w.frames, s.frames):
        d = np.argwhere(a != b)
        if d.size:
            touched = True
            assert d[:, 0].min() >= 10 and d[:, 0].max() < 50
            assert d[:, 1].min() >= 20 and d[:, 1].max() < 100
    assert touched


def test_worn_is_deterministic():
    s = _session()
    a = wear.worn(s, seed=7)
    b = wear.worn(s, seed=7)
    assert len(a.frames) == len(b.frames) == len(a.camera)
    for fa, fb in zip(a.frames, b.frames):
        np.testing.assert_array_equal(fa, fb)
    assert a.camera == b.camera
