"""END-TO-END differential vs the compiled C++ reference.

THE literal BASELINE oracle: build the entire reference (`remap`) from
the read-only checkout (tests/differential/ref_full.py — every AVX2
stage included), run `remap <frames-dir>` on synthetic raw clips
(main.cpp:246-266), run OUR pipeline on the same directories, and assert
the output maps match **pixel-exactly**.

Three clips cover complementary surface:

- clip A: scrolling world behind a static HUD + border — aws window
  discovery, 200-frame collect, single fragment, fdf/arf.
- clip B: same plus moving sprites AND a camera teleport the grid-vote
  matcher must reject (validated against the reference: both pipelines
  break into two fragments and the splicer must re-merge them) — this
  clip caught a real splice-capacity bug in round 3.
- clip C: adversarial content — a full-screen flash frame and a global
  palette rotation (two breaks + an unmergeable fragment → three maps).
  Building it found two real reference-encoder bugs (solid frames CRASH
  nic::compress; >=16384-px literal runs corrupt the stream — PARITY.md
  component 8), which our codec fixes by run splitting.

Any divergence must be pinned to a named PARITY.md quirk; today there
are none on these clips — the maps are byte-identical.

Runtime note: runs on CPU (conftest) with the persistent compile cache;
first-ever run pays XLA compiles, later runs are execution-bound.
"""

import numpy as np
import pytest

from remap_tpu.config import PipelineConfig
from remap_tpu.core import palette
from remap_tpu.pipeline import builder
from remap_tpu.io import frames as frames_io
from remap_tpu.utils import testing

from tests.differential import ref_full

pytestmark = pytest.mark.skipif(
    not ref_full.available(),
    reason="reference checkout / g++ / AVX2 / libpng unavailable",
)

FW, FH = 388, 312     # the reference's fixed screen (main.cpp:199)


def _write_clip(frames, directory) -> None:
    directory.mkdir(exist_ok=True)
    for i, f in enumerate(frames):
        f.astype(np.uint8).tofile(str(directory / str(i)))


def _clip_a():
    """Scrolling world, static 24-row HUD + 8-px border, one fragment."""
    rng = np.random.default_rng(42)
    world = testing.make_world(1200, 1600, rng=rng)
    path = testing.make_camera_path(
        200, (1200, 1600), (FH, FW), rng, max_step=3
    )
    return testing.render_clip(
        world, path, (FH, FW), rng=rng, hud_rows=24, border=8
    ).frames


def _clip_b():
    """HUD + border + 3 sprites + a (350,200)-px camera teleport at frame
    130: the teleport breaks collect (validated: the reference's matcher
    rejects it too) and fgs must splice the two fragments back into ONE
    map."""
    rng = np.random.default_rng(7)
    world = testing.make_world(1000, 1400, rng=rng)
    rng2 = np.random.default_rng(11)
    warm = testing.make_camera_path(
        130, (1000, 1400), (FH, FW), rng2, max_step=3, start=(300, 300)
    )
    p2 = testing.make_camera_path(
        60, (1000, 1400), (FH, FW), rng2, max_step=3, start=(650, 500)
    )
    return testing.render_clip(
        world, warm + p2, (FH, FW), rng=rng2,
        n_sprites=3, sprite_size=10, hud_rows=24, border=8,
    ).frames


def _clip_c():
    """Adversarial content through the REAL reference: a full-screen
    "flash" frame (horizontal color bands — kept banded because a SOLID
    frame crashes the reference's RLE encoder outright: uint16 rep_len
    wrap at nic.hpp:57, see PARITY.md) and a global palette rotation
    from frame 155 on.  Both pipelines must break at the flash (twice:
    no keypoints in, none out) and at the rotation (every code changes),
    and emit the same per-fragment maps."""
    fh, fw = FH, FW
    rng = np.random.default_rng(21)
    world = testing.make_world(1000, 1400, rng=rng)
    rng2 = np.random.default_rng(22)
    path = testing.make_camera_path(
        176, (1000, 1400), (fh, fw), rng2, max_step=3, start=(350, 320)
    )
    frames = [
        f.copy()
        for f in testing.render_clip(
            world, path, (fh, fw), rng=rng2, hud_rows=24, border=8
        ).frames
    ]
    flash = np.zeros((fh, fw), np.uint8)
    for k in range(0, fh, 100):
        flash[k : k + 100] = 7 if (k // 100) % 2 == 0 else 8
    frames[140] = flash
    for i in range(155, len(frames)):
        frames[i] = ((frames[i].astype(np.int32) + 1) % 16).astype(np.uint8)
    return frames


def _clip_d():
    """Join-escalation content: a band of identical 13x13 "stamps"
    (period 40 px) over an otherwise distinctive world.  Each stamp
    contributes (13-4)^2 = 81 keypoints whose 5x5 code patch lies fully
    inside the stamp, so every one of those codes repeats once per stamp
    — ~12x per region inside the band, trampling the default join
    multiplicity (4).  The camera crosses the band mid-clip: a
    *minority* of pairs trip the join-truncation stability bound, which
    drives the round-3 incremental repair path (`collect.repair_pairs`:
    re-match only the flagged pairs at multiplicity 16, where the rolled
    join is provably exhaustive for <=16 repeats) — against the
    reference binary's unbounded hash joins (kpm.hpp:92-170), which are
    always exact.

    Tuning notes (all measured against the compiled reference):
    - The world noise is thinned (0.10 vs make_world's 0.25) so the
      capacity ladder settles at 4096, where the escalated joins stay
      CPU-cheap; matches still declare with wide margins outside the
      band.
    - Stamps must be larger than the 5x5 code patch: a 5x5 stamp
      repeats only its center pixel's code and never threatens any
      declaration (measured: zero flags).
    - A *dense* repetitive stripe (8x8 tiling, 300 px wide) is the
      wrong shape for this test: per-code repetition ~230/region is
      quadratic for the reference's pair enumeration (measured: 410 s,
      and the window ambiguity shatters the clip into 17 maps), while
      our side's capacity ladder walks to 16384.  The stamp band keeps
      both pipelines fast and the map whole."""
    rng = np.random.default_rng(33)
    wh, ww = 1000, 2000
    base = rng.integers(0, 16, size=(wh // 4 + 1, ww // 4 + 1),
                        dtype=np.uint8)
    base = np.kron(base, np.ones((4, 4), dtype=np.uint8))[:wh, :ww]
    detail = rng.integers(0, 16, size=(wh, ww), dtype=np.uint8)
    world = np.where(rng.random((wh, ww)) < 0.10, detail, base).astype(
        np.uint8
    )
    stamp = rng.integers(0, 16, size=(13, 13), dtype=np.uint8)
    for y in range(40, wh - 13, 40):
        for x in range(1000, 1250 - 13, 40):
            world[y:y + 13, x:x + 13] = stamp
    rng2 = np.random.default_rng(34)
    xs = np.linspace(80, 1540, 100).astype(int)
    path = [(int(x), 300 + (i % 4)) for i, x in enumerate(xs)]
    return testing.render_clip(
        world, path, (FH, FW), rng=rng2, hud_rows=24, border=8
    ).frames


def _run_ours(clip_dir) -> list:
    feed = frames_io.RawDirectoryFeed(str(clip_dir), FW, FH)
    cfg = PipelineConfig(screen_width=FW, screen_height=FH)
    result = builder.build(lambda: feed, cfg)
    # the CLI's output contract: palette-map each fragment (main.cpp:255)
    return [palette.NATIVE_TO_RGB[m] for m in result.maps]


def _read_pngs(paths) -> list:
    from PIL import Image

    return [np.asarray(Image.open(str(p)).convert("RGB")) for p in paths]


def _assert_maps_equal(ref_maps, our_maps, clip_name):
    assert len(ref_maps) == len(our_maps), (
        f"{clip_name}: map count diverged "
        f"(ref {len(ref_maps)}, ours {len(our_maps)}) — if legitimate, "
        f"pin to a PARITY.md quirk"
    )
    # the reference's output order follows its fragment list; compare as
    # multisets keyed by shape to stay robust to pure ordering ties
    ref_by_shape = sorted(ref_maps, key=lambda m: m.shape)
    ours_by_shape = sorted(our_maps, key=lambda m: m.shape)
    for i, (r, o) in enumerate(zip(ref_by_shape, ours_by_shape)):
        assert r.shape == o.shape, (
            f"{clip_name} map {i}: shape {o.shape} vs reference {r.shape}"
        )
        diff = (r != o).any(axis=-1)
        assert not diff.any(), (
            f"{clip_name} map {i}: {int(diff.sum())}/{diff.size} pixels "
            f"diverge from the compiled reference — pin to a PARITY.md "
            f"quirk or fix"
        )


@pytest.mark.parametrize(
    "name,make_clip,expected_maps",
    [
        ("clipA", _clip_a, 1),
        # clipB is the diffquick representative: sprites + teleport force
        # multi-fragment collect, splice and the foreground pass in one clip
        pytest.param("clipB", _clip_b, 1, marks=pytest.mark.diffquick),
        ("clipC", _clip_c, 3),
        ("clipD", _clip_d, 1),
    ],
)
def test_ref_e2e_pixel_exact(
    ref_binary, tmp_path, name, make_clip, expected_maps
):
    clip_dir = tmp_path / name
    frames = make_clip()
    _write_clip(frames, clip_dir)

    if name == "clipD":
        # prove the clip actually exercises the join-escalation path:
        # at the settled table capacity (4096 — where the strict
        # ladder's capacity doublings end on this content) the default
        # join multiplicity must trip the truncation stability bound on
        # a MINORITY of pairs, so the strict loop takes the incremental
        # `repair_pairs` route rather than a full replay
        from remap_tpu.core.regions import make_layout
        from remap_tpu.pipeline import collect as collect_mod
        from remap_tpu.pipeline.state import FrameStore

        dcfg = PipelineConfig(
            screen_width=FW, screen_height=FH, region_capacity=4096
        )
        layout = make_layout(
            FW, FH, dcfg.grid_width, dcfg.grid_height, dcfg.grid_overlap
        )
        _, _, tabf, joinf, _, _ = collect_mod.match_pass(
            iter(frames), layout, dcfg, FrameStore(FH, FW)
        )
        assert not tabf.any(), "capacity 4096 no longer holds clipD"
        n_join = int(joinf.sum())
        assert 0 < n_join <= len(frames) // 2, (
            f"clipD join flags = {n_join}: the clip no longer drives "
            f"the incremental join-escalation path"
        )

    ref_out = tmp_path / "refout"
    ref_out.mkdir()
    pngs = ref_full.run_reference(ref_binary, clip_dir, ref_out)
    ref_maps = _read_pngs(pngs)
    assert len(ref_maps) == expected_maps

    our_maps = _run_ours(clip_dir)
    _assert_maps_equal(ref_maps, our_maps, name)
