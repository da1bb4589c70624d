"""RLE codec: hand-checked opcodes + round trips (nic.hpp)."""

import numpy as np
import pytest

from remap_tpu.spec import nic


def rt(img):
    h, w = img.shape
    out = nic.decompress(nic.compress(img), w, h)
    np.testing.assert_array_equal(out, img)


def test_repeat_short():
    # "aaa" -> single repeat opcode ((3-3)<<4)|a (nic.hpp:35-37).
    img = np.full((1, 3), 0xA, dtype=np.uint8)
    assert nic.compress(img) == bytes([0x0A])
    rt(img)


def test_repeat_six():
    img = np.full((1, 6), 0x3, dtype=np.uint8)
    assert nic.compress(img) == bytes([0x33])
    rt(img)


def test_repeat_long():
    img = np.full((1, 7), 0x3, dtype=np.uint8)
    # 0x40 | (1 << 4) | 3, then length byte 7 (nic.hpp:38-44).
    assert nic.compress(img) == bytes([0x53, 0x07])
    rt(img)


def test_repeat_very_long():
    img = np.full((1, 300), 0x9, dtype=np.uint8)
    assert nic.compress(img) == bytes([0x69, 300 & 0xFF, 300 >> 8])
    rt(img)


def test_literals():
    img = np.array([[1, 2, 3, 4, 5]], dtype=np.uint8)
    # literal run of 5: 0x80|5 then packed nibbles 12 34 50.
    assert nic.compress(img) == bytes([0x85, 0x12, 0x34, 0x50])
    rt(img)


def test_literal_then_repeat():
    img = np.array([[1, 2, 7, 7, 7, 7]], dtype=np.uint8)
    # literal "12" then repeat 7 x4.
    assert nic.compress(img) == bytes([0x82, 0x12, 0x17])
    rt(img)


def test_pairs_do_not_break_literals():
    img = np.array([[1, 2, 2, 3, 4]], dtype=np.uint8)
    # double pixels stay literal (only >=3 becomes a repeat).
    assert nic.compress(img) == bytes([0x85, 0x12, 0x23, 0x40])
    rt(img)


@pytest.mark.parametrize("seed", range(5))
def test_roundtrip_random(seed):
    rng = np.random.default_rng(seed)
    rt(rng.integers(0, 16, size=(37, 53), dtype=np.uint8))


@pytest.mark.parametrize("seed", range(5))
def test_roundtrip_runs(seed):
    rng = np.random.default_rng(100 + seed)
    # run-heavy image: repeat each value a random number of times
    vals = rng.integers(0, 16, size=400, dtype=np.uint8)
    reps = rng.integers(1, 40, size=400)
    flat = np.repeat(vals, reps)[: 64 * 64]
    rt(flat.reshape(64, 64))


def test_roundtrip_constant():
    rt(np.full((64, 64), 7, dtype=np.uint8))


def test_roundtrip_long_literal():
    # > 63 distinct-ish pixels forces the 0xC0 two-byte literal opcode.
    rng = np.random.default_rng(7)
    row = rng.integers(0, 16, size=500, dtype=np.uint8)
    # break up accidental triples
    for i in range(2, 500):
        if row[i] == row[i - 1] == row[i - 2]:
            row[i] = (row[i] + 1) % 16
    rt(row.reshape(1, 500))
