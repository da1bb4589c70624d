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


@pytest.fixture(scope="session")
def ref_binary(tmp_path_factory):
    out = tmp_path_factory.mktemp("refbin")
    return ref_full.build_reference(out)


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
    [("clipA", _clip_a, 1), ("clipB", _clip_b, 1), ("clipC", _clip_c, 3)],
)
def test_ref_e2e_pixel_exact(
    ref_binary, tmp_path, name, make_clip, expected_maps
):
    clip_dir = tmp_path / name
    _write_clip(make_clip(), clip_dir)

    ref_out = tmp_path / "refout"
    ref_out.mkdir()
    pngs = ref_full.run_reference(ref_binary, clip_dir, ref_out)
    ref_maps = _read_pngs(pngs)
    assert len(ref_maps) == expected_maps

    our_maps = _run_ours(clip_dir)
    _assert_maps_equal(ref_maps, our_maps, name)
