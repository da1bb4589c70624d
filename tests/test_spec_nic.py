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


def test_roundtrip_giant_runs():
    """Runs beyond the 16-bit repeat opcode and literals beyond the
    14-bit literal opcode split into multiple opcodes.

    The reference cannot represent either: its uint16 rep_len wraps at
    65536 and pops an empty literal buffer (nic.hpp:57 — heap overflow,
    confirmed under ASan on a solid 388x312 frame), and a >=16384-pixel
    literal run overflows 0xC0's length field into the opcode bits
    (nic.hpp:25).  Our split keeps the stream decodable by the
    unmodified decoder and is byte-identical to the reference on every
    input the reference survives (PARITY.md)."""
    from remap_tpu.spec import nic

    cases = [
        np.full((312, 388), 7, np.uint8),                 # 121056-px run
        np.concatenate(
            [np.full(65536, 3, np.uint8), np.full(16, 1, np.uint8)]
        ).reshape(4, -1),
        np.concatenate(
            [np.full(131073, 9, np.uint8), np.full(15, 1, np.uint8)]
        ).reshape(4, -1),
        # 40000-px literal run with no >=3 repeat anywhere
        (np.indices((200, 200)).sum(0) % 2 * 5).astype(np.uint8),
    ]
    for img in cases:
        h, w = img.shape
        s = nic.compress(img)
        np.testing.assert_array_equal(nic.decompress(s, w, h), img)


def test_native_matches_spec_on_giant_runs():
    from remap_tpu.io import codec
    from remap_tpu.spec import nic

    img = np.full((312, 388), 7, np.uint8)
    n = codec.compress(img)      # native when buildable, else spec
    assert bytes(n) == nic.compress(img)
    np.testing.assert_array_equal(codec.decompress(n, 388, 312), img)
