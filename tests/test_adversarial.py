"""Adversarial content battery: the failure modes real gameplay throws
at the matcher, each with a documented expected outcome.

The reference's decision thresholds exist precisely for this content —
the active-region gate (kpm.hpp:400-403), the runner-up declare margin
(kpm.hpp:199-211), and frc's break-on-no-match (frc.hpp:109-115).  Each
test pins match-rate, fragment-break, and flag behavior on a synthetic
clip with known geometry:

- palette cycling (global color permutation flips every keypoint code)
- full-screen flashes (no keypoints at all -> active gate)
- screen shake (high-frequency jitter must still track exactly)
- scrolling HUD (a minority layer moving against the world — the Borda
  vote must follow the world, and the declare margin must NOT reject)
- sprite-dense scenes (dozens of independent movers; majority still wins)
"""

import numpy as np
import pytest

from remap_tpu.config import PipelineConfig
from remap_tpu.pipeline import collect as collect_mod
from remap_tpu.utils import testing

CFG = PipelineConfig(
    screen_width=96, screen_height=64, region_capacity=768, frame_batch=8
)


def _collect(frames):
    return collect_mod.collect([np.asarray(f) for f in frames], CFG)


def _walk(n, start, rng, world_hw=(160, 224), frame_hw=(64, 96)):
    return testing.make_camera_path(
        n, world_hw, frame_hw, rng, max_step=3, start=start
    )


def test_palette_cycling_breaks_then_retracks():
    """A global palette rotation changes every 5x5 patch code: the cycle
    frame cannot match its predecessor (break), but tracking must resume
    within the new palette immediately after."""
    rng = np.random.default_rng(0)
    world = testing.make_world(160, 224, rng)
    path = _walk(16, (40, 40), rng)
    clip = testing.render_clip(world, path, (64, 96))
    frames = [np.asarray(f) for f in clip.frames]
    # frames 8.. rendered under a rotated palette
    frames = frames[:8] + [(f + 1) % 16 for f in frames[8:]]

    col = _collect(frames)
    assert col.matched[1:8].all(), "pre-cycle tracking must be unbroken"
    assert not col.matched[8], "the palette-cycle frame cannot match"
    assert col.matched[9:].all(), "tracking must resume after the cycle"
    assert len(col.fragments) == 2
    assert col.overflow_frames == 0
    # offsets around the break are exact
    expected = clip.offsets  # offsets[t] = pos[t] - pos[t-1]
    for t in range(1, 16):
        if t == 8:
            continue
        assert tuple(col.offsets[t]) == expected[t - 1]


def test_full_screen_flash_two_breaks():
    """A solid flash frame has zero keypoints: the flash cannot match its
    predecessor AND the next real frame cannot match the flash — two
    breaks, three fragments, no overflow (kpm.hpp:400-403 active gate)."""
    rng = np.random.default_rng(1)
    world = testing.make_world(160, 224, rng)
    path = _walk(12, (40, 40), rng)
    clip = testing.render_clip(world, path, (64, 96))
    frames = [np.asarray(f) for f in clip.frames]
    frames[6] = np.full((64, 96), 7, np.uint8)

    col = _collect(frames)
    assert not col.matched[6]
    assert not col.matched[7]
    assert col.matched[1:6].all() and col.matched[8:].all()
    assert len(col.fragments) == 3
    assert col.overflow_frames == 0


def test_screen_shake_tracks_exactly():
    """+-3 px alternating jitter (screen shake) must track with exact
    offsets and a single fragment."""
    rng = np.random.default_rng(2)
    world = testing.make_world(160, 224, rng)
    base = (60, 50)
    jitter = [(0, 0), (3, -2), (-3, 3), (2, 2), (-2, -3), (3, 0)] * 4
    path = [(base[0] + dx, base[1] + dy) for dx, dy in jitter]
    clip = testing.render_clip(world, path, (64, 96))

    col = _collect(clip.frames)
    assert col.matched[1:].all()
    assert len(col.fragments) == 1
    for t in range(1, len(path)):
        assert tuple(col.offsets[t]) == clip.offsets[t - 1]


def test_scrolling_hud_votes_with_world():
    """A 12-row HUD that scrolls horizontally against the camera is a
    coherent minority offset: the Borda vote must still declare the
    world's offset (the margin rule kpm.hpp:199-211 survives because the
    HUD only rules its own regions)."""
    rng = np.random.default_rng(3)
    world = testing.make_world(160, 224, rng)
    hud_src = rng.integers(0, 16, size=(12, 224), dtype=np.uint8)
    path = _walk(12, (40, 40), rng)
    frames = []
    for t, (x, y) in enumerate(path):
        f = world[y : y + 64, x : x + 96].copy()
        # HUD scrolls 2 px/frame leftward relative to the screen
        s = (2 * t) % 128
        f[:12] = np.roll(hud_src, -s, axis=1)[:, :96]
        frames.append(f)

    col = _collect(frames)
    expected = [
        (path[t][0] - path[t - 1][0], path[t][1] - path[t - 1][1])
        for t in range(1, len(path))
    ]
    assert col.matched[1:].all(), "world must out-vote the scrolling HUD"
    for t in range(1, len(path)):
        assert tuple(col.offsets[t]) == expected[t - 1]


def test_sprite_dense_scene_tracks_camera():
    """Twelve independent movers over a 64x96 frame: the camera offset
    still wins every vote, and the sprites are scrubbed by the
    foreground pass downstream (covered by e2e tests) — here we pin that
    the MATCHER is not distracted."""
    rng = np.random.default_rng(4)
    world = testing.make_world(160, 224, rng)
    path = _walk(12, (40, 40), rng)
    clip = testing.render_clip(
        world, path, (64, 96), rng=rng, n_sprites=12, sprite_size=6
    )
    col = _collect(clip.frames)
    assert col.matched[1:].all()
    assert len(col.fragments) == 1
    for t in range(1, len(path)):
        assert tuple(col.offsets[t]) == clip.offsets[t - 1]


def test_static_screen_zero_offsets():
    """A paused game (identical frames) must match with offset (0,0)
    everywhere — not break (same-code joins vote 0-offset unanimously)."""
    rng = np.random.default_rng(5)
    world = testing.make_world(160, 224, rng)
    frames = [world[40:104, 50:146].copy() for _ in range(10)]
    col = _collect(frames)
    assert col.matched[1:].all()
    assert (col.offsets[1:] == 0).all()
    assert len(col.fragments) == 1
