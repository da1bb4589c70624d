"""Frame codecs: packed nibbles (default) and reference-format RLE.

The reference keeps every frame in RAM as custom 4-bit RLE
(nic.hpp:8-166); this framework's default store packs two pixels per byte
(pipeline.state) — O(1) access, trivially vectorized.  The RLE codec is
still provided for byte-compatible interchange and smaller footprints on
run-heavy content; a C++ implementation (native/codec.cpp via ctypes)
accelerates it when built, with the NumPy spec as fallback.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

from remap_tpu.spec import nic as _spec_nic

_LIB: Optional[ctypes.CDLL] = None
_LIB_TRIED = False


def _native_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    native_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native"
    )
    path = os.path.join(native_dir, "libremapcodec.so")
    if not os.path.exists(path) and os.path.exists(
        os.path.join(native_dir, "Makefile")
    ):
        import subprocess

        proc = subprocess.run(
            ["make", "-C", native_dir],
            capture_output=True,
            check=False,
        )
        if proc.returncode != 0:
            import logging

            logging.getLogger(__name__).warning(
                "native codec build failed (rc=%d); falling back to the "
                "NumPy spec codec\n%s",
                proc.returncode,
                proc.stderr.decode(errors="replace")[-2000:],
            )
    if os.path.exists(path):
        lib = ctypes.CDLL(path)
        lib.rle_compress.restype = ctypes.c_size_t
        lib.rle_compress.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.rle_decompress.restype = ctypes.c_size_t
        lib.rle_decompress.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_size_t,
        ]
        _LIB = lib
    return _LIB


def compress(image: np.ndarray) -> bytes:
    """4-bit RLE, byte-exact with the reference format (nic.hpp:8-105)."""
    lib = _native_lib()
    if lib is None:
        return _spec_nic.compress(image)
    flat = np.ascontiguousarray(image, dtype=np.uint8).reshape(-1)
    # worst case: every other pixel distinct -> < n bytes + opcodes
    out = np.empty(flat.size + flat.size // 32 + 16, np.uint8)
    n = lib.rle_compress(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        flat.size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out[:n].tobytes()


#: the native decoder's malformed-stream sentinel (SIZE_MAX)
_BAD = ctypes.c_size_t(-1).value


def decompress(pack: bytes, width: int, height: int) -> np.ndarray:
    """Strict full-frame decode.

    Raises ValueError on truncated or corrupt packs instead of
    inheriting the reference decoder's out-of-bounds reads/writes
    (nic.hpp:107-166 trusts the stream unconditionally) — real dumps
    may be damaged, and the production ingest path must fail cleanly
    on untrusted bytes."""
    lib = _native_lib()
    if lib is None:
        return _spec_nic.decompress(pack, width, height)
    src = np.frombuffer(pack, np.uint8)
    out = np.zeros(width * height, np.uint8)
    n = lib.rle_decompress(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        src.size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.size,
    )
    if n != out.size:
        got = 0 if n == _BAD else n
        raise ValueError(
            f"corrupt or truncated RLE pack: decoded {got} of "
            f"{out.size} pixels"
        )
    return out.reshape(height, width)
