"""Robust window-discovery mode (cfg.discovery == "robust").

Parity mode replicates the reference's aws exactly — including two
regimes where it emits NOTHING (PARITY.md): the top-HUD tie latch
(aws.hpp:62-69: every CHANGED contour scores 0, so a live status bar
ABOVE the play area wins every tie from its first change onward) and
chrome-speck stagnation starvation (aws.hpp:37-96: transient glitches on
the static chrome re-mark the change heatmap forever).  Robust mode is
the opt-in divergence that still produces maps on such captures: largest
changed contour instead of the first tied one, and per-pixel change
debouncing.  These tests pin all four quadrants: parity emits nothing on
both regimes (the reference-faithful behavior the differential suite
also pins against the binary), robust recovers a window and a map, and
robust agrees with parity on clean content.
"""

import numpy as np
import pytest

from remap_tpu.config import PipelineConfig
from remap_tpu.pipeline import builder, window
from remap_tpu.utils import testing

H, W = 120, 160
PLAY = (24, 116, 4, 156)          # top, bottom, left, right


def _clip(n_frames=48, top_digit=False, border_specks=False, seed=3):
    """Synthetic capture: static chrome, scrolling play area, optional
    live top-HUD digit / one-frame border glitches."""
    rng = np.random.default_rng(seed)
    world = testing.make_world(220, 320, rng)
    chrome = np.full((H, W), 1, np.uint8)
    chrome[::3, ::2] = 9                      # border texture
    chrome[4:20, 4 : W - 4] = 6               # top status bar band
    top, bottom, left, right = PLAY

    frames = []
    for i in range(n_frames):
        f = chrome.copy()
        x, y = 8 + i, 30
        f[top:bottom, left:right] = world[
            y : y + bottom - top, x : x + right - left
        ]
        if top_digit:
            # live counter above the play area: changes every frame
            f[8:14, 10:14] = (i % 14) + 2
        if border_specks:
            # one transient glitch pixel per frame on the TOP border —
            # above the play area, so its changed contour is discovered
            # first and latches the parity tie-break (the pinned
            # chrome-speck regime's shape); distinct positions, so each
            # pixel sees exactly 2 change events (robust debounces it)
            f[2, 10 + 2 * i] = 15
        frames.append(f)
    return frames


def test_parity_top_hud_emits_nothing():
    cfg = PipelineConfig(screen_width=W, screen_height=H, frame_batch=16)
    assert window.scan(iter(_clip(top_digit=True)), cfg) is None


def test_robust_top_hud_finds_play_area():
    cfg = PipelineConfig(
        screen_width=W, screen_height=H, frame_batch=16,
        discovery="robust",
    )
    info = window.scan(iter(_clip(top_digit=True)), cfg)
    assert info is not None
    crop = info.crop
    top, bottom, left, right = PLAY
    # the accepted window is the play area (crop shrinks bounds by 1)
    assert abs(crop.top - (top + 1)) <= 1 and abs(crop.left - (left + 1)) <= 1
    assert crop.bottom <= bottom and crop.right <= right
    assert (crop.bottom - crop.top) > 2 * H // 5


def test_parity_border_specks_emit_nothing():
    cfg = PipelineConfig(screen_width=W, screen_height=H, frame_batch=16)
    assert window.scan(iter(_clip(border_specks=True)), cfg) is None


def test_robust_border_specks_find_play_area():
    cfg = PipelineConfig(
        screen_width=W, screen_height=H, frame_batch=16,
        discovery="robust",
    )
    info = window.scan(iter(_clip(border_specks=True)), cfg)
    assert info is not None
    top, bottom, left, right = PLAY
    assert info.crop.top >= top and info.crop.bottom <= bottom


def test_robust_matches_parity_on_clean_content():
    clean = _clip()
    base = PipelineConfig(screen_width=W, screen_height=H, frame_batch=16)
    p = window.scan(iter(clean), base)
    r = window.scan(
        iter(clean),
        PipelineConfig(screen_width=W, screen_height=H, frame_batch=16,
                       discovery="robust"),
    )
    assert p is not None and r is not None
    assert (p.crop.top, p.crop.bottom) == (r.crop.top, r.crop.bottom)
    assert (p.crop.left, p.crop.right) == (r.crop.left, r.crop.right)


@pytest.mark.slow
def test_robust_builds_maps_on_top_hud_clip():
    """End to end: the top-HUD capture that parity-faithfully emits no
    maps produces a world map under --discovery robust."""
    frames = _clip(top_digit=True, n_frames=64)
    parity = builder.build(
        lambda: iter(frames),
        PipelineConfig(screen_width=W, screen_height=H, frame_batch=16),
    )
    assert parity.maps == []
    robust = builder.build(
        lambda: iter(frames),
        PipelineConfig(screen_width=W, screen_height=H, frame_batch=16,
                       discovery="robust"),
    )
    assert len(robust.maps) == 1
    m = robust.maps[0]
    # window crop shrinks each side by 1, margins-crop may trim one more
    assert m.shape[0] >= PLAY[1] - PLAY[0] - 4
    assert m.shape[1] > W  # scrolled world: wider than one screen
