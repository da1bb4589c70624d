"""IO layer: feeds, PNG, codec backends, checkpoints."""

import os

import numpy as np
import pytest

from remap_tpu.core import palette
from remap_tpu.io import codec, frames as frames_io, png as png_io
from remap_tpu.spec import nic


def test_raw_feed_numeric_order_and_crop(tmp_path):
    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 16, size=(20, 30), dtype=np.uint8) for _ in range(12)]
    # shuffled names: 0..11 written as 10, 9, ... ensures stoi ordering
    for i, img in enumerate(imgs):
        img.tofile(tmp_path / str(i))
    feed = frames_io.RawDirectoryFeed(str(tmp_path), 30, 20)
    got = list(feed)
    assert len(got) == 12
    for a, b in zip(got, imgs):
        np.testing.assert_array_equal(a, b)

    from remap_tpu.core.geometry import Rect

    cropped = feed.with_crop(Rect(left=2, top=3, right=28, bottom=18))
    c0 = next(iter(cropped))
    np.testing.assert_array_equal(c0, imgs[0][3:18, 2:28])


def test_raw_feed_short_file_blank(tmp_path):
    (tmp_path / "0").write_bytes(b"\x01\x02")
    feed = frames_io.RawDirectoryFeed(str(tmp_path), 10, 8)
    np.testing.assert_array_equal(feed.read(0), np.zeros((8, 10), np.uint8))


def test_png_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 16, size=(15, 21), dtype=np.uint8)
    path = str(tmp_path / "m.png")
    png_io.write_map(path, img)
    from PIL import Image

    back = np.asarray(Image.open(path).convert("RGB"))
    np.testing.assert_array_equal(back, palette.native_to_rgb(img))
    # nearest-palette inversion restores the codes
    np.testing.assert_array_equal(frames_io.rgb_to_native(back), img)


def test_pure_zlib_png(tmp_path):
    rng = np.random.default_rng(2)
    rgb = rng.integers(0, 255, size=(9, 13, 3), dtype=np.uint8)
    path = str(tmp_path / "z.png")
    png_io._write_png_zlib(path, rgb)
    from PIL import Image

    np.testing.assert_array_equal(np.asarray(Image.open(path)), rgb)


def test_native_codec_matches_spec():
    if codec._native_lib() is None:
        pytest.skip("native codec not built")
    rng = np.random.default_rng(3)
    for _ in range(5):
        vals = rng.integers(0, 16, size=200, dtype=np.uint8)
        reps = rng.integers(1, 30, size=200)
        img = np.repeat(vals, reps)[: 48 * 52].reshape(48, 52)
        assert codec.compress(img) == nic.compress(img)
        np.testing.assert_array_equal(
            codec.decompress(codec.compress(img), 52, 48), img
        )


def _both_decoders():
    """Both production decode paths: the NumPy spec and (when built)
    the native C++ codec behind codec.decompress."""
    paths = [("spec", nic.decompress)]
    if codec._native_lib() is not None:
        paths.append(("native", codec.decompress))
    return paths


def test_decompress_rejects_damage():
    """Truncated/corrupt packs raise ValueError on BOTH decode paths —
    the reference decoder (nic.hpp:107-166) overreads or overwrites on
    the same inputs; real dumps may be damaged."""
    rng = np.random.default_rng(4)
    vals = rng.integers(0, 16, size=400, dtype=np.uint8)
    reps = rng.integers(1, 40, size=400)
    img = np.repeat(vals, reps)[: 64 * 50].reshape(50, 64)
    pack = nic.compress(img)
    for name, dec in _both_decoders():
        np.testing.assert_array_equal(dec(pack, 64, 50), img)
        for cut in range(0, len(pack), 7):
            with pytest.raises(ValueError):
                dec(pack[:cut], 64, 50)
        # a trailing opcode would write past the frame
        with pytest.raises(ValueError):
            dec(pack + bytes([0x35]), 64, 50)
        # an oversized repeat run (65535 px) ahead of valid data
        with pytest.raises(ValueError):
            dec(bytes([0x40 | (2 << 4) | 1, 0xFF, 0xFF]) + pack, 64, 50)


def test_decompress_fuzz_never_crashes():
    """Arbitrary byte blobs: clean ValueError or a well-formed frame —
    never a crash or an out-of-range palette index.  (Before this
    round the native decoder read past a truncated source buffer.)"""
    rng = np.random.default_rng(5)
    for _ in range(300):
        blob = rng.integers(
            0, 256, size=int(rng.integers(1, 400)), dtype=np.uint8
        ).tobytes()
        for name, dec in _both_decoders():
            try:
                out = dec(blob, 64, 50)
            except ValueError:
                continue
            assert out.shape == (50, 64) and (out < 16).all(), name


def test_checkpoint_roundtrip(tmp_path):
    from remap_tpu.config import PipelineConfig
    from remap_tpu.io import checkpoint
    from remap_tpu.pipeline import collect
    from remap_tpu.utils import testing

    clip = testing.simple_clip(n_frames=6, frame_hw=(64, 96), seed=51)
    cfg = PipelineConfig(
        screen_width=96, screen_height=64,
        region_capacity=2048, frame_batch=4, store_medians=True,
    )
    res = collect.collect(clip.frames, cfg)
    checkpoint.save(str(tmp_path), "collect", res.fragments)
    loaded = checkpoint.load(str(tmp_path), "collect")
    assert len(loaded) == len(res.fragments)
    for a, b in zip(loaded, res.fragments):
        np.testing.assert_array_equal(a.dots, b.dots)
        assert [(r.number, r.position) for r in a.frames] == [
            (r.number, r.position) for r in b.frames
        ]
        np.testing.assert_array_equal(a.store.image(2), b.store.image(2))
        np.testing.assert_array_equal(a.store.median(3), b.store.median(3))

    # the "filtered" tag skips the store (arf reads only dot canvases);
    # resume then reconstructs fragments with store=None
    checkpoint.save(
        str(tmp_path), "filtered", res.fragments, include_store=False
    )
    import os

    assert not os.path.exists(tmp_path / "filtered" / "store.npz")
    loaded2 = checkpoint.load(str(tmp_path), "filtered")
    assert all(f.store is None for f in loaded2)
    for a, b in zip(loaded2, res.fragments):
        np.testing.assert_array_equal(a.dots, b.dots)


def test_indexed_png_fast_path(tmp_path):
    """Palette-indexed PNGs map codes through the palette LUT exactly —
    even when the PNG's palette is a permutation of the native one."""
    from PIL import Image

    rng = np.random.default_rng(3)
    codes = rng.integers(0, 16, size=(12, 18), dtype=np.uint8)
    perm = rng.permutation(16).astype(np.uint8)

    img = Image.fromarray(perm[codes], mode="P")
    pal = np.zeros((256, 3), np.uint8)
    inv = np.argsort(perm)
    pal[:16] = palette.NATIVE_TO_RGB[inv]
    img.putpalette(pal.reshape(-1).tolist())
    path = str(tmp_path / "7.png")
    img.save(path)

    feed = frames_io.PngDirectoryFeed(str(tmp_path))
    out = feed.read(0)
    np.testing.assert_array_equal(out, codes)


def test_native_feed_packed_batch_parity(tmp_path):
    """native/feed.cpp batch reader == NumPy pack of read() frames,
    including crop, odd widths, and the short-file->blank quirk."""
    from remap_tpu.core.geometry import Rect
    from remap_tpu.io import frames as fio

    rng = np.random.default_rng(3)
    H, W = 31, 45
    imgs = rng.integers(0, 16, size=(6, H, W), dtype=np.uint8)
    for i in range(6):
        (tmp_path / str(i)).write_bytes(imgs[i].tobytes())
    (tmp_path / "6").write_bytes(b"xx")   # short -> blank (nil.hpp:20-22)

    feed = fio.RawDirectoryFeed(str(tmp_path), W, H)

    def ref_pack(ims):
        if ims.shape[-1] % 2:
            ims = np.pad(ims, ((0, 0), (0, 0), (0, 1)))
        return (ims[:, :, 0::2] << 4) | ims[:, :, 1::2]

    exp = ref_pack(np.concatenate([imgs, np.zeros((1, H, W), np.uint8)]))
    np.testing.assert_array_equal(feed.read_packed_batch(0, 7), exp)

    crop = Rect(left=3, top=2, right=36, bottom=19)
    cf = feed.with_crop(crop)
    exp_c = ref_pack(imgs[1:5, 2:19, 3:36])
    np.testing.assert_array_equal(cf.read_packed_batch(1, 4), exp_c)
    assert cf.out_dims == (17, 33)

    # the NumPy fallback must agree bit-for-bit
    lib = fio._FEED_LIB
    fio._FEED_LIB = None
    try:
        np.testing.assert_array_equal(cf.read_packed_batch(1, 4), exp_c)
    finally:
        fio._FEED_LIB = lib


def test_raw_feed_masks_out_of_range_bytes(tmp_path):
    """Damaged dumps with bytes >15 must not corrupt NEIGHBOR pixels
    through the nibble packing (the reference packs unmasked,
    nic.hpp:8-105); both the NumPy and native batch paths mask."""
    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, size=(20, 30), dtype=np.uint8)
    (tmp_path / "0").write_bytes(img.tobytes())
    feed = frames_io.RawDirectoryFeed(str(tmp_path), 30, 20)
    np.testing.assert_array_equal(feed.read(0), img & 0x0F)
    packed = feed.read_packed_batch(0, 1)
    expect = img & 0x0F
    ref = (expect[:, 0::2] << 4) | expect[:, 1::2]
    np.testing.assert_array_equal(packed[0], ref)
