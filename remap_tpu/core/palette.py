"""Palette tables: native 4-bit codes <-> RGB <-> luminance-ordered values.

The pipeline operates on "native" 4-bit palette indices.  Median filtering
needs a *total order by luminance*, so native codes are remapped to "ordered
values" (rank by intensity) before histogramming, and back after
(cpl.hpp:163-226).  RGB output uses the hardcoded 16-entry C64 palette
(cpl.hpp:77-92).

**Channel-swap quirk** (found by the randomized compiled-reference fuzz,
round 3): the reference's ordering intensity is ``0.3*B + 0.59*G +
0.11*R`` — luma-like coefficients applied to *swapped* channels.  Its
``blend_to_pack`` returns the blend word's bytes positionally as
``(byte0, byte1, byte2)`` = (blue, green, red) (cpl.hpp:99-102 with the
``blue | green<<8 | red<<16`` layout of cpl.hpp:109-114), and
``pack_to_intensity`` then binds them to parameters named ``(red, green,
blue)`` (cpl.hpp:116-120) — so red receives the blue byte and vice
versa.  The resulting rank table was extracted from the compiled binary
and is reproduced here exactly; it shifts 10 of the 16 C64 ranks vs the
unswapped order and changes ~3.5%% of median pixels on busy content
(which is how the fuzz caught it — the medians feed fde's foreground
contours).

All tables are tiny (16 entries) and exposed both as NumPy arrays (host/spec
code) and as constants ready to be captured by jitted functions.
"""

from __future__ import annotations

import sys

import numpy as np

#: 0x00RRGGBB words, C64 palette (cpl.hpp:77-92).
NATIVE_TO_BLEND = np.array(
    [
        0x00000000, 0x00FFFFFF, 0x0068372B, 0x0070A4B2,
        0x006F3D86, 0x00588D43, 0x00352879, 0x00B8C76F,
        0x006F4F25, 0x00433900, 0x009A6759, 0x00444444,
        0x006C6C6C, 0x009AD284, 0x006C5EB5, 0x00959595,
    ],
    dtype=np.uint32,
)

def _intensity(rgb: np.ndarray) -> np.ndarray:
    """The reference's ordering intensity in [0,1], float32: ``0.3*B +
    0.59*G + 0.11*R`` — luma coefficients over *channel-swapped* bytes
    (cpl.hpp:99-120, see the module docstring; verified against the
    table extracted from the compiled binary)."""
    r = rgb[:, 0].astype(np.float32)
    g = rgb[:, 1].astype(np.float32)
    b = rgb[:, 2].astype(np.float32)
    return (
        np.float32(0.3) * b + np.float32(0.59) * g + np.float32(0.11) * r
    ) / np.float32(255.0)


def _derive(blend: np.ndarray):
    """All tables from 16 blend words: ([16,3] RGB, intensity,
    ordered->native, native->ordered).

    ordered->native is the ascending-intensity permutation
    (cpl.hpp:164-182); a STABLE sort ranks intensity ties (e.g. ZX
    black/bright-black) by native code order — deterministic where the
    reference's consteval std::sort never sees a tie on its one
    (tie-free) palette.  native->ordered is the inverse permutation
    (cpl.hpp:187-205)."""
    rgb = np.stack(
        [
            (blend >> 16).astype(np.uint8),
            (blend >> 8).astype(np.uint8),
            blend.astype(np.uint8),
        ],
        axis=1,
    )
    intensity = _intensity(rgb)
    ordered_to_native = np.argsort(intensity, kind="stable").astype(np.uint8)
    native_to_ordered_t = np.empty(16, dtype=np.uint8)
    native_to_ordered_t[ordered_to_native] = np.arange(16, dtype=np.uint8)
    return rgb, intensity, ordered_to_native, native_to_ordered_t


#: [16, 3] uint8 (R, G, B); per-code intensity; the two rank permutations.
(NATIVE_TO_RGB, NATIVE_INTENSITY,
 ORDERED_TO_NATIVE, NATIVE_TO_ORDERED) = _derive(NATIVE_TO_BLEND)


# ---------------------------------------------------------------------------
# Custom palettes.  The reference hardcodes the C64 palette (cpl.hpp:77-92);
# real captures come from other machines too, so the active palette is
# swappable.  All derived tables are recomputed; consumers read them as
# module attributes at trace time, so `set_palette` also clears JAX's
# compilation caches (jitted programs bake the tables in as constants).
# ---------------------------------------------------------------------------

#: Built-in presets: name -> 16 x 0x00RRGGBB.
PRESETS = {
    "c64": NATIVE_TO_BLEND.copy(),
    # ZX Spectrum: 8 basic + 8 bright (colors 8/0 both black, as on the
    # machine — an intensity TIE, resolved by native-code order below).
    "zx": np.array(
        [
            0x00000000, 0x000000D7, 0x00D70000, 0x00D700D7,
            0x0000D700, 0x0000D7D7, 0x00D7D700, 0x00D7D7D7,
            0x00000000, 0x000000FF, 0x00FF0000, 0x00FF00FF,
            0x0000FF00, 0x0000FFFF, 0x00FFFF00, 0x00FFFFFF,
        ],
        dtype=np.uint32,
    ),
    # the canonical CGA/EGA 16-color text palette
    "ega": np.array(
        [
            0x00000000, 0x000000AA, 0x0000AA00, 0x0000AAAA,
            0x00AA0000, 0x00AA00AA, 0x00AA5500, 0x00AAAAAA,
            0x00555555, 0x005555FF, 0x0055FF55, 0x0055FFFF,
            0x00FF5555, 0x00FF55FF, 0x00FFFF55, 0x00FFFFFF,
        ],
        dtype=np.uint32,
    ),
}


def set_palette(blend, *, _clear_caches: bool = True) -> None:
    """Install a 16-entry palette as the active one.

    ``blend``: a preset name (``'c64'``/``'zx'``/``'ega'``), an array of
    16 ``0x00RRGGBB`` words, or a [16, 3] uint8 RGB array.  Affects the
    luminance-order tables (and with them medians/keypoints) and PNG
    input/output.  Call BEFORE running the pipeline; compiled programs
    bake the tables in, so the JAX compilation cache is cleared."""
    global NATIVE_TO_BLEND, NATIVE_TO_RGB, NATIVE_INTENSITY
    global ORDERED_TO_NATIVE, NATIVE_TO_ORDERED
    if isinstance(blend, str):
        try:
            blend = PRESETS[blend]
        except KeyError:
            raise ValueError(
                f"unknown palette preset {blend!r}; "
                f"have {sorted(PRESETS)}"
            ) from None
    blend = np.asarray(blend)
    if blend.shape == (16, 3):
        blend = (
            (blend[:, 0].astype(np.uint32) << 16)
            | (blend[:, 1].astype(np.uint32) << 8)
            | blend[:, 2].astype(np.uint32)
        )
    if blend.shape != (16,):
        raise ValueError(
            f"palette must be 16 blend words or [16, 3] RGB, "
            f"got shape {blend.shape}"
        )
    blend = blend.astype(np.uint32)
    NATIVE_TO_BLEND = blend
    (NATIVE_TO_RGB, NATIVE_INTENSITY,
     ORDERED_TO_NATIVE, NATIVE_TO_ORDERED) = _derive(blend)
    if _clear_caches and "jax" in sys.modules:
        # jitted programs bake the tables in as constants; if jax was
        # never imported, nothing is baked yet and importing it here
        # would initialize a backend before the caller configures one
        import jax

        jax.clear_caches()


def load_palette_file(path: str) -> np.ndarray:
    """Read a palette file: 16 ``RRGGBB`` hex colors (optionally
    ``#``-prefixed), one per line; ``;`` or ``//`` comments allowed."""
    words = []
    with open(path) as f:
        for line in f:
            line = line.split(";")[0].split("//")[0].strip()
            if not line:
                continue
            words.append(int(line.lstrip("#"), 16) & 0x00FFFFFF)
    if len(words) != 16:
        raise ValueError(f"{path}: expected 16 colors, got {len(words)}")
    return np.array(words, dtype=np.uint32)


def native_to_ordered(image: np.ndarray) -> np.ndarray:
    """Remap native codes to luminance ranks (cpl.hpp:211-213)."""
    return NATIVE_TO_ORDERED[image]


def ordered_to_native(image: np.ndarray) -> np.ndarray:
    """Remap luminance ranks back to native codes (cpl.hpp:215-217)."""
    return ORDERED_TO_NATIVE[image]


def native_to_rgb(image: np.ndarray) -> np.ndarray:
    """[H, W] native codes -> [H, W, 3] uint8 RGB (main.cpp:255-259)."""
    return NATIVE_TO_RGB[image]
