"""Core tables and region-band layout."""

import numpy as np

from remap_tpu.core import palette
from remap_tpu.core.regions import make_layout


def test_palette_tables_are_inverse_permutations():
    assert sorted(palette.ORDERED_TO_NATIVE) == list(range(16))
    assert np.array_equal(
        palette.NATIVE_TO_ORDERED[palette.ORDERED_TO_NATIVE], np.arange(16)
    )


def test_palette_no_intensity_ties():
    assert len(set(palette.NATIVE_INTENSITY.tolist())) == 16


def test_palette_known_order():
    # The COMPILED REFERENCE's ordering, extracted from the binary by the
    # round-3 fuzz differential: intensity = 0.3*B + 0.59*G + 0.11*R —
    # the reference's blend_to_pack hands (blue, green, red) positionally
    # to pack_to_intensity(red, green, blue) (cpl.hpp:99-120), silently
    # swapping channels.  The unswapped Rec.601-style order differs at
    # 10 of 16 ranks (e.g. blue(6) ranks 3rd here, not 1st after black).
    expected = [0, 9, 2, 6, 11, 8, 4, 10, 12, 5, 14, 15, 3, 7, 13, 1]
    assert palette.ORDERED_TO_NATIVE.tolist() == expected
    assert palette.NATIVE_TO_ORDERED.tolist() == [
        0, 15, 2, 12, 6, 9, 3, 13, 5, 1, 7, 4, 8, 14, 10, 11,
    ]


def test_rgb_roundtrip():
    img = np.arange(16, dtype=np.uint8).reshape(4, 4)
    rgb = palette.native_to_rgb(img)
    assert rgb.shape == (4, 4, 3)
    assert tuple(rgb[0, 1]) == (0xFF, 0xFF, 0xFF)
    assert tuple(rgb[0, 2]) == (0x68, 0x37, 0x2B)


def test_layout_nes():
    # Hand-traced from kpe.hpp:84-90/157-192 for 256x240, grid 4x2, ov 16.
    lo = make_layout(256, 240, 4, 2, 16)
    assert lo.x_spans == ((2, 74), (58, 146), (130, 218), (202, 254))
    assert lo.y_spans == ((2, 131), (115, 236))
    assert lo.x_proc == (2, 254)
    assert lo.y_proc == (2, 236)
    assert lo.region_index(3, 1) == 7
    assert lo.sections_of_x(60) == [0, 1]
    assert lo.sections_of_x(100) == [1]
    assert lo.sections_of_y(120) == [0, 1]


def test_layout_c64():
    # 388x312: rw = 97-8 = 89, rh = 156-8 = 148.
    lo = make_layout(388, 312, 4, 2, 16)
    assert lo.x_spans == ((2, 107), (91, 212), (196, 317), (301, 386))
    assert lo.y_spans == ((2, 167), (151, 308))


def test_layout_single_region():
    # fgs uses a 1x1 grid with overlap 0 (fgs.hpp:17).
    lo = make_layout(100, 80, 1, 1, 0)
    assert lo.x_spans == ((2, 98),)
    assert lo.y_spans == ((2, 76),)


# ---------------------------------------------------------------------------
# Custom palettes (new surface: the reference hardcodes C64, cpl.hpp:77-92)
# ---------------------------------------------------------------------------

import contextlib


@contextlib.contextmanager
def _active_palette(name_or_blend):
    palette.set_palette(name_or_blend, _clear_caches=False)
    try:
        yield
    finally:
        palette.set_palette("c64", _clear_caches=False)


def test_set_palette_recomputes_tables_and_restores():
    c64_order = palette.ORDERED_TO_NATIVE.copy()
    with _active_palette("ega"):
        assert sorted(palette.ORDERED_TO_NATIVE) == list(range(16))
        np.testing.assert_array_equal(
            palette.NATIVE_TO_ORDERED[palette.ORDERED_TO_NATIVE],
            np.arange(16),
        )
        # EGA 15 (white) is the brightest, 0 (black) the darkest
        assert palette.ORDERED_TO_NATIVE[0] == 0
        assert palette.ORDERED_TO_NATIVE[-1] == 15
        assert palette.NATIVE_TO_RGB[9].tolist() == [0x55, 0x55, 0xFF]
    np.testing.assert_array_equal(palette.ORDERED_TO_NATIVE, c64_order)


def test_set_palette_tie_break_is_native_code_order():
    """ZX black (0) and bright-black (8) share an intensity; the stable
    sort ranks the smaller native code first — deterministic where the
    reference's consteval sort never sees a tie."""
    with _active_palette("zx"):
        ranks = palette.NATIVE_TO_ORDERED
        assert palette.NATIVE_INTENSITY[0] == palette.NATIVE_INTENSITY[8]
        assert ranks[0] + 1 == ranks[8]
        assert ranks[0] == 0


def test_set_palette_accepts_rgb_and_rejects_bad_shapes():
    import pytest

    rgb = palette.NATIVE_TO_RGB.copy()
    with _active_palette(rgb):  # [16, 3] RGB round-trips to the same tables
        np.testing.assert_array_equal(palette.NATIVE_TO_RGB, rgb)
    with pytest.raises(ValueError):
        palette.set_palette(np.zeros((15,), np.uint32), _clear_caches=False)
    with pytest.raises(ValueError):
        palette.set_palette("amiga", _clear_caches=False)


def test_load_palette_file(tmp_path):
    lines = ["; test palette"] + [
        f"#{int(w):06X}" for w in palette.PRESETS["ega"]
    ]
    f = tmp_path / "pal.txt"
    f.write_text("\n".join(lines) + "\n")
    np.testing.assert_array_equal(
        palette.load_palette_file(str(f)), palette.PRESETS["ega"]
    )


def test_spec_pipeline_under_custom_palette():
    """The NumPy oracle reconstructs a map under a non-C64 palette: the
    luminance-order tables (and with them medians/keypoints) really do
    re-derive from the active palette."""
    from remap_tpu.spec import pipeline as spec_pipeline
    from remap_tpu.utils import testing

    rng = np.random.default_rng(5)
    world = testing.make_world(120, 160, rng)
    path = testing.make_camera_path(12, (120, 160), (48, 64), rng,
                                    max_step=3)
    clip = testing.render_clip(world, path, (48, 64), rng=rng)
    with _active_palette("ega"):
        maps = spec_pipeline.build([np.asarray(f) for f in clip.frames])
    assert len(maps) == 1
