"""Golden end-to-end spec tests on synthetic clips with known geometry."""

import numpy as np
import pytest

from remap_tpu.core.regions import make_layout
from remap_tpu.spec import arf, aws, fdf, fgs, frc
from remap_tpu.utils import testing


@pytest.fixture(scope="module")
def clip():
    return testing.simple_clip(
        n_frames=20, frame_hw=(64, 96), world_hw=(160, 224), seed=5
    )


def test_collect_single_fragment_recovers_world(clip):
    h, w = clip.frames[0].shape
    layout = make_layout(w, h, 4, 2, 16)
    frags = frc.collect(clip.frames, layout)
    assert len(frags) == 1
    frag = frags[0]
    assert len(frag.frames) == len(clip.frames)

    # frame blit positions must equal camera positions relative to first
    x0, y0 = clip.positions[0]
    zx, zy = frag.zero
    assert (zx, zy) == (0, 0)  # normalized
    expected = [
        (x - x0, y - y0) for (x, y) in clip.positions
    ]
    got = [f.position for f in frag.frames]
    # normalize: positions were rebased by the canvas origin; the minimum
    # position maps to the canvas margin.  Compare deltas.
    base = got[0]
    exp_base = expected[0]
    assert [
        (px - base[0], py - base[1]) for px, py in got
    ] == [(px - exp_base[0], py - exp_base[1]) for px, py in expected]

    # blended canvas equals the covered world region exactly (no sprites)
    image, mask = frag.blend()
    ys, xs = np.nonzero(mask)
    fh, fw = 64, 96
    # world rect covered by the canvas: camera min positions
    minx = min(p[0] for p in clip.positions)
    miny = min(p[1] for p in clip.positions)
    for yy, xx in list(zip(ys, xs))[::97]:
        # canvas pixel -> world pixel
        wx = xx - (got[0][0] - (clip.positions[0][0] - minx))
        wy = yy - (got[0][1] - (clip.positions[0][1] - miny))
        assert image[yy, xx] == clip.world[miny + wy, minx + wx]


def test_collect_breaks_on_teleport():
    clip_a = testing.simple_clip(n_frames=8, seed=1)
    clip_b = testing.simple_clip(n_frames=8, seed=2)
    frames = clip_a.frames + clip_b.frames
    h, w = frames[0].shape
    layout = make_layout(w, h, 4, 2, 16)
    frags = frc.collect(frames, layout)
    assert len(frags) == 2
    assert len(frags[0].frames) == 8
    assert len(frags[1].frames) == 8


def test_splice_rejoins_overlapping_fragments():
    # one world, two overlapping camera sweeps separated by a teleport
    rng = np.random.default_rng(11)
    world = testing.make_world(160, 224, rng)
    path_a = [(20 + i, 30) for i in range(10)]
    path_b = [(40 + i, 34) for i in range(10)]
    clip_a = testing.render_clip(world, path_a, (64, 96))
    clip_b = testing.render_clip(world, path_b, (64, 96))
    # a scene-transition frame that matches nothing breaks the collection
    noise = rng.integers(0, 16, size=(64, 96), dtype=np.uint8)
    frames = clip_a.frames + [noise] + clip_b.frames
    h, w = frames[0].shape
    layout = make_layout(w, h, 4, 2, 16)
    frags = frc.collect(frames, layout)
    assert len(frags) == 3  # sweep A, noise, sweep B

    spliced = fgs.splice(frags)
    # the two overlapping sweeps merge; the noise fragment stays
    assert len(spliced) == 2
    merged = max(spliced, key=lambda f: len(f.frames))
    assert len(merged.frames) == 20
    image, mask = merged.blend()
    # blended map must exactly match the world where defined
    rec0 = next(r for r in merged.frames if r.number == 0)
    ax, ay = rec0.position
    wx0, wy0 = path_a[0]
    sub = image[ay : ay + 64, ax : ax + 96]
    np.testing.assert_array_equal(sub, world[wy0 : wy0 + 64, wx0 : wx0 + 96])


def test_aws_finds_action_window():
    clip = testing.simple_clip(
        n_frames=40,
        frame_hw=(72, 96),
        world_hw=(200, 260),
        seed=7,
        hud_rows=8,
        border=4,
        max_step=4,
    )
    win = aws.scan(iter(clip.frames))
    assert win is not None
    b = win.raw_bounds
    # action area: rows [8, 68) (hud covers the top border), cols [4, 92);
    # inclusive bbox of the changed region must match exactly
    assert (b.left, b.top, b.right, b.bottom) == (4, 8, 91, 67)


def test_fdf_scrubs_sprites():
    rng = np.random.default_rng(13)
    world = testing.make_world(160, 224, rng)
    path = [(20 + i, 30 + (i % 3)) for i in range(24)]
    clip = testing.render_clip(
        world, path, (64, 96), rng=rng, n_sprites=2, sprite_size=6
    )
    h, w = clip.frames[0].shape
    layout = make_layout(w, h, 4, 2, 16)
    frags = frc.collect(clip.frames, layout)
    assert len(frags) == 1

    filtered = fdf.filter_fragments(fgs.splice(frags), (h, w))
    image, mask = filtered[0].blend()

    # compare against the true world: blended map should be nearly
    # sprite-free (a few sprite-colored pixels may survive at low vote)
    rec0 = filtered[0].frames[0]
    ax, ay = rec0.position
    wx0, wy0 = path[0]
    errors = 0
    total = 0
    ys, xs = np.nonzero(mask)
    for yy, xx in zip(ys, xs):
        wy = wy0 + (yy - ay)
        wx = wx0 + (xx - ax)
        if 0 <= wy < 160 and 0 <= wx < 224:
            total += 1
            errors += image[yy, xx] != world[wy, wx]
    assert total > 0
    assert errors / total < 0.01


def test_arf_preserves_clean_map():
    # a frequent-pattern map (tiled) should pass through mostly unchanged
    rng = np.random.default_rng(17)
    tile = rng.integers(0, 16, size=(8, 8), dtype=np.uint8)
    image = np.tile(tile, (8, 10))
    dots = np.zeros(image.shape + (16,), dtype=np.uint16)
    ys, xs = np.indices(image.shape)
    dots[ys, xs, image] = 5
    mask = np.ones_like(image)
    out = arf.filter_fragment(dots, image, mask, size=15, dev=2.0)
    margin = 6  # gauss size 13
    h, w = image.shape
    core = out[margin : h - margin, margin : w - margin - 1]
    exp = image[margin : h - margin, margin : w - margin - 1]
    np.testing.assert_array_equal(core, exp)


def test_arf_gauss_kernel_binary_bits():
    """Pin the reference binary's kernel bits (round-3 fuzz finding):
    a*powf(e_f32, -(dy^2+dx^2)/d) in f32 — NOT expf.  The four corner /
    center weights below were extracted from the compiled reference
    (g++ build of arf.hpp:231-253); np.exp differs on 140 of the 169
    weights by ~1 ulp."""
    k = arf.gauss_kernel(2.0)
    assert k.shape == (13, 13)
    assert k[0, 0] == np.float32(4.910320968e-06)
    assert k[6, 6] == np.float32(3.978873417e-02)
    assert k[0, 6] == np.float32(4.420129699e-04)
    # np.exp would give a different low bit at [0, 0]
    assert k[0, 0] != np.float32(4.910319603e-06)


def test_arf_rare_picks_truncated_window():
    """Pin the truncated 13x12 blur window (arf.hpp:282-287 drops the
    BOTTOM kernel row — round-3 fuzz finding): a color whose votes sit
    entirely in the window's bottom row must not influence the pick,
    while the same votes one row higher must."""
    dots = np.zeros((27, 27, 16), np.uint16)
    c = 13
    # center has 1 vote each for colors 2 and 3 (both "present")
    dots[c, c, 2] = 1
    dots[c, c, 3] = 1
    # color 3 gets a huge stack ONLY in the dropped row (dy = +6)
    dots[c + 6, c - 6 : c + 7, 3] = 999
    # color 2 gets a modest stack in the last INCLUDED row (dy = +5)
    dots[c + 5, c - 6 : c + 7, 2] = 5
    pick = arf.rare_picks(dots, np.array([c]), np.array([c]), 2.0)[0]
    assert pick == 2, "bottom kernel row must be dropped (reference quirk)"
    # move color 3's stack into the included rows -> it must win
    dots2 = dots.copy()
    dots2[c + 6, :, 3] = 0
    dots2[c + 5, c - 6 : c + 7, 3] = 999
    pick2 = arf.rare_picks(dots2, np.array([c]), np.array([c]), 2.0)[0]
    assert pick2 == 3


def test_palette_order_matches_compiled_reference():
    """Pin the channel-swap ordering (cpl.hpp:99-120, round-3 fuzz
    finding) against the table extracted from the compiled binary."""
    from remap_tpu.core import palette

    assert palette.NATIVE_TO_ORDERED.tolist() == [
        0, 15, 2, 12, 6, 9, 3, 13, 5, 1, 7, 4, 8, 14, 10, 11,
    ]
