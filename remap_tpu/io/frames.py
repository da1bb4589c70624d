"""Frame feeds: raw captures and PNG directories.

The reference reads a directory of raw frame dumps — one byte per pixel of
4-bit palette indices, numerically-named files sorted by ``stoi`` —
optionally cropping to the action window (nil.hpp:13-32, main.cpp:16-52,
204-213).  ``RawDirectoryFeed`` reproduces that contract;
``PngDirectoryFeed`` additionally accepts paletted/RGB PNG frames
(BASELINE.json config 1 speaks of PNG clips) by nearest-palette mapping.

Feeds are plain iterators of [H, W] uint8 arrays plus batch helpers used
by the streaming collector.
"""

from __future__ import annotations

import ctypes
import os
import re
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from remap_tpu.core import palette
from remap_tpu.core.geometry import Rect

_FEED_LIB: Optional[ctypes.CDLL] = None
_FEED_LIB_TRIED = False


def _native_feed() -> Optional[ctypes.CDLL]:
    """Build/load the native batch reader (native/feed.cpp) on first use;
    None -> callers fall back to the NumPy path."""
    global _FEED_LIB, _FEED_LIB_TRIED
    if _FEED_LIB_TRIED:
        return _FEED_LIB
    _FEED_LIB_TRIED = True
    native_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native"
    )
    path = os.path.join(native_dir, "libremapfeed.so")
    if not os.path.exists(path) and os.path.exists(
        os.path.join(native_dir, "Makefile")
    ):
        import subprocess

        proc = subprocess.run(
            ["make", "-C", native_dir], capture_output=True, check=False
        )
        if proc.returncode != 0:
            import logging

            logging.getLogger(__name__).warning(
                "native feed build failed (rc=%d); frame reads fall back "
                "to the NumPy path\n%s",
                proc.returncode,
                proc.stderr.decode(errors="replace")[-2000:],
            )
    if os.path.exists(path):
        lib = ctypes.CDLL(path)
        lib.feed_read_packed_batch.restype = ctypes.c_int
        lib.feed_read_packed_batch.argtypes = [
            ctypes.c_char_p,
            ctypes.c_size_t,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        _FEED_LIB = lib
    else:
        import logging

        logging.getLogger(__name__).warning(
            "native feed library not found at %s; using NumPy reader", path
        )
    return _FEED_LIB


def _numeric_sort(names: Sequence[str]) -> List[str]:
    """Sort by leading integer in the filename (main.cpp:210-212)."""

    def key(name: str) -> int:
        m = re.search(r"\d+", os.path.basename(name))
        if m is None:
            raise ValueError(f"frame file has no numeric name: {name}")
        return int(m.group())

    return sorted(names, key=key)


class RawDirectoryFeed:
    """Raw one-byte-per-pixel frames of fixed screen dimensions."""

    def __init__(
        self,
        directory: str,
        width: int,
        height: int,
        crop: Optional[Rect] = None,
    ):
        self.directory = directory
        self.width = width
        self.height = height
        self.crop = crop
        self.files = _numeric_sort(
            os.path.join(directory, f) for f in os.listdir(directory)
        )

    def __len__(self) -> int:
        return len(self.files)

    def read(self, index: int) -> np.ndarray:
        data = np.fromfile(self.files[index], dtype=np.uint8)
        if data.size < self.width * self.height:
            # unreadable/short files yield a blank frame (nil.hpp:20-22)
            img = np.zeros((self.height, self.width), np.uint8)
        else:
            # mask to the 4-bit contract: an out-of-range byte in a
            # damaged dump would otherwise corrupt its NEIGHBOR through
            # the nibble packing (v<<4 | v2) — the reference inherits
            # exactly that corruption (nic.hpp:8-105 packs unmasked);
            # identity on every in-contract input
            img = data[: self.width * self.height].reshape(
                self.height, self.width
            ) & 0x0F
        if self.crop is not None:
            c = self.crop
            img = img[c.top : c.bottom, c.left : c.right]
        return img

    def __iter__(self) -> Iterator[np.ndarray]:
        for i in range(len(self.files)):
            yield self.read(i)

    def with_crop(self, crop: Rect) -> "RawDirectoryFeed":
        feed = RawDirectoryFeed.__new__(RawDirectoryFeed)
        feed.directory = self.directory
        feed.width = self.width
        feed.height = self.height
        feed.crop = crop
        feed.files = self.files
        return feed

    @property
    def out_dims(self) -> Tuple[int, int]:
        """(height, width) of produced frames (crop-aware)."""
        if self.crop is not None:
            c = self.crop
            return c.bottom - c.top, c.right - c.left
        return self.height, self.width

    def read_packed_batch(self, start: int, count: int) -> np.ndarray:
        """Read frames [start, start+count) cropped and packed two pixels
        per byte — [count, ch, ceil(cw/2)] uint8, identical to
        ``pack_nibbles_batch`` of the ``read()`` images.  Uses the native
        threaded reader (native/feed.cpp) when available."""
        ch, cw = self.out_dims
        if self.crop is not None:
            left, top = self.crop.left, self.crop.top
        else:
            left, top = 0, 0
        paths = self.files[start : start + count]
        count = len(paths)
        row_bytes = (cw + 1) // 2
        lib = _native_feed()
        if lib is not None and count:
            stride = max(len(p.encode()) for p in paths) + 1
            buf = np.zeros((count, stride), np.uint8)
            for i, p in enumerate(paths):
                e = p.encode()
                buf[i, : len(e)] = np.frombuffer(e, np.uint8)
            out = np.empty((count, ch, row_bytes), np.uint8)
            rc = lib.feed_read_packed_batch(
                buf.ctypes.data_as(ctypes.c_char_p),
                stride,
                count,
                self.width,
                self.height,
                left,
                top,
                cw,
                ch,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            )
            if rc == 0:
                return out
        imgs = np.stack(
            [self.read(start + i) for i in range(count)]
        ) if count else np.zeros((0, ch, cw), np.uint8)
        if cw % 2:
            imgs = np.pad(imgs, ((0, 0), (0, 0), (0, 1)))
        return (imgs[:, :, 0::2] << 4) | imgs[:, :, 1::2]


class PngDirectoryFeed:
    """PNG frames mapped to the 16-color palette (nearest RGB)."""

    def __init__(self, directory: str, crop: Optional[Rect] = None):
        self.directory = directory
        self.crop = crop
        self.files = _numeric_sort(
            os.path.join(directory, f)
            for f in os.listdir(directory)
            if f.lower().endswith(".png")
        )

    def __len__(self) -> int:
        return len(self.files)

    def read(self, index: int) -> np.ndarray:
        from PIL import Image

        img = Image.open(self.files[index])
        if img.mode == "P":
            # palette-indexed fast path: map each palette entry to its
            # nearest native color ONCE (exact when the palette is the
            # C64 palette, in any order), then index — no per-pixel RGB
            # quantization
            out = _palette_lut(img)[np.asarray(img)]
        else:
            out = rgb_to_native(np.asarray(img.convert("RGB")))
        if self.crop is not None:
            c = self.crop
            out = out[c.top : c.bottom, c.left : c.right]
        return out

    def __iter__(self) -> Iterator[np.ndarray]:
        for i in range(len(self.files)):
            yield self.read(i)

    def with_crop(self, crop: Rect) -> "PngDirectoryFeed":
        feed = PngDirectoryFeed.__new__(PngDirectoryFeed)
        feed.directory = self.directory
        feed.crop = crop
        feed.files = self.files
        return feed


def _palette_lut(img) -> np.ndarray:
    """[256] uint8 LUT: PNG palette code -> nearest native color."""
    pal = img.getpalette() or []
    arr = np.zeros((256, 3), np.uint8)
    flat = np.array(pal, np.uint8)[: 256 * 3]
    arr[: len(flat) // 3] = flat.reshape(-1, 3)
    return rgb_to_native(arr[None, :, :])[0]


def rgb_to_native(rgb: np.ndarray) -> np.ndarray:
    """[H, W, 3] uint8 -> nearest palette index (squared-distance)."""
    pal = palette.NATIVE_TO_RGB.astype(np.int32)  # [16, 3]
    px = rgb.astype(np.int32)
    d = ((px[:, :, None, :] - pal[None, None, :, :]) ** 2).sum(-1)
    return d.argmin(-1).astype(np.uint8)


def batches(
    feed, batch: int
) -> Iterator[Tuple[List[int], np.ndarray]]:
    """Yield (frame_numbers, [B, H, W]) chunks from any frame iterator."""
    nums: List[int] = []
    imgs: List[np.ndarray] = []
    for i, img in enumerate(feed):
        nums.append(i)
        imgs.append(img)
        if len(imgs) == batch:
            yield nums, np.stack(imgs)
            nums, imgs = [], []
    if imgs:
        yield nums, np.stack(imgs)
