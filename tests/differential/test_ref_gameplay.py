"""Gameplay-session differential vs the compiled C++ reference.

The four clips in test_ref_e2e.py are geometric (iid-noise worlds,
random-walk cameras).  This test runs both pipelines on a *simulated
playthrough* (utils.gameplay): a tile-built platformer level, a player
with physics driven by a seeded policy, a dead-zone camera, animated
patrolling enemies, and a score/timer HUD whose digits change inside
static chrome — the closest thing to the reference's real input domain
(main.cpp:16-52) this environment can produce.

What makes this content HARDER than the geometric clips, and therefore
worth a dedicated oracle run:

- tiles repeat **pixel-exactly** (bounded-join stability-bound regime:
  repeats ~5-8 per region on turf/brick codes),
- whole grid regions are keypoint-sparse or empty (flat sky, flat dirt)
  — the active-region gate and per-region Borda weighting actually bind,
- the camera rests for runs of frames (offset (0,0) declarations with
  only sprite-animation differences),
- foreground sprites ANIMATE (shape changes), not just translate,
- the HUD is mostly-static-with-changing-digits, so the aws heatmap has
  fine structure inside the chrome band.

Beyond byte-equality with the binary, the maps are checked against the
*world itself* (the simulator knows ground truth): the reconstructed
map must match the visited world region almost everywhere — guarding
against both pipelines agreeing on a wrong answer.
"""

from typing import Tuple

import numpy as np
import pytest

from remap_tpu.utils import gameplay

from tests.differential import ref_full
from tests.differential.test_ref_e2e import (
    _assert_maps_equal,
    _read_pngs,
    _run_ours,
    _write_clip,
)

pytestmark = pytest.mark.skipif(
    not ref_full.available(),
    reason="reference checkout / g++ / AVX2 / libpng unavailable",
)

FW, FH = 388, 312     # the reference's fixed screen (main.cpp:199)


def _world_truth_agreement(our_maps, session) -> Tuple[float, float]:
    """Best-alignment agreement of the largest map with the world.

    The map should be the union of visited views of the (sprite-free)
    world — except the all-zero ring the artifact filter leaves
    unprocessed at canvas edges (arf.hpp:274-303; see the verify-skill
    gotcha).  The exact crop origin depends on aws's contour bounds, so
    search a small alignment neighbourhood around the known camera
    extent.  Returns (best agreement over non-zero map pixels, non-zero
    coverage at that alignment)."""
    from remap_tpu.core import palette

    cam = np.array(session.camera)
    world_rgb = palette.NATIVE_TO_RGB[session.world]
    m = max(our_maps, key=lambda a: a.size)
    mh, mw = m.shape[:2]
    painted = (m != 0).any(axis=-1)
    y0 = cam[:, 1].min()
    x0 = cam[:, 0].min()
    best = (0.0, 0.0)
    wh, ww = world_rgb.shape[:2]
    for dy in range(-2, 7):
        for dx in range(-2, 7):
            yy, xx = y0 + dy, x0 + dx
            if yy < 0 or xx < 0 or yy + mh > wh or xx + mw > ww:
                continue
            crop = world_rgb[yy : yy + mh, xx : xx + mw]
            agree = float(
                (crop == m).all(axis=-1)[painted].mean()
            )
            if agree > best[0]:
                best = (agree, float(painted.mean()))
    return best


def test_ref_gameplay_session(ref_binary, tmp_path):
    session = gameplay.play_session(
        seed=3, n_frames=220, frame_hw=(FH, FW)
    )
    clip_dir = tmp_path / "gameplay"
    _write_clip(session.frames, clip_dir)

    ref_out = tmp_path / "refout"
    ref_out.mkdir()
    pngs = ref_full.run_reference(ref_binary, clip_dir, ref_out)
    ref_maps = _read_pngs(pngs)

    our_maps = _run_ours(clip_dir)
    _assert_maps_equal(ref_maps, our_maps, "gameplay")

    # ground truth: the reconstructed map IS the visited world (sprites
    # scrubbed by fdf, rare patterns filtered by arf) — both pipelines
    # agreeing on a wrong map would still fail here.  Measured on this
    # session: every painted pixel equals the world (1.000 agreement,
    # 94.7% painted; the rest is the arf edge ring).
    agree, painted = _world_truth_agreement(our_maps, session)
    assert agree >= 0.999, (
        f"painted map pixels agree with the world on only {agree:.3%}"
    )
    assert painted >= 0.90, (
        f"only {painted:.1%} of the map canvas is painted"
    )


def test_ref_gameplay_top_hud_quirk(ref_binary, tmp_path):
    """The top-HUD window quirk (PARITY.md): live digits ABOVE the play
    area latch aws's score-0 tie-break (std::min_element +
    first-discovery order, aws.hpp:62-69) on a tiny digit blob, so the
    window is never accepted and NO maps come out — of either pipeline.
    A 90-frame session is plenty: the timer digit changes by frame 2 and
    owns the tie from then on."""
    session = gameplay.play_session(
        seed=3, n_frames=90, frame_hw=(FH, FW), hud_pos="top"
    )
    clip_dir = tmp_path / "tophud"
    _write_clip(session.frames, clip_dir)

    ref_out = tmp_path / "refout"
    ref_out.mkdir()
    pngs = ref_full.run_reference(ref_binary, clip_dir, ref_out)
    assert pngs == [], "the reference accepted a window despite the quirk"

    our_maps = _run_ours(clip_dir)
    assert our_maps == [], "we accepted a window the reference rejects"
