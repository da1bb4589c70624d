"""The gameplay-session simulator (utils.gameplay): determinism and
capture-realism properties.

The simulator exists to stand in for real recorded gameplay
(main.cpp:16-52's input domain) — so the properties asserted here are
exactly the ones that make real captures harder than iid synthetic
clips: exact-repeating tiles, run/stop dead-zone camera motion, animated
foreground, changing HUD digits inside static chrome.
"""

import numpy as np
import pytest

from remap_tpu.utils import gameplay


def _session(**kw):
    args = dict(seed=5, n_frames=120, frame_hw=(312, 388))
    args.update(kw)
    return gameplay.play_session(**args)


def test_deterministic():
    a = _session()
    b = _session()
    assert len(a.frames) == len(b.frames) == 120
    for fa, fb in zip(a.frames, b.frames):
        np.testing.assert_array_equal(fa, fb)
    assert a.camera == b.camera


def test_frame_contract():
    s = _session()
    for f in s.frames:
        assert f.shape == (312, 388) and f.dtype == np.uint8
        assert f.max() < 16  # 4-bit palette indices (nil.hpp:13-32)


def test_camera_is_gameplay_shaped():
    """Dead-zone camera: runs of zero motion AND runs of full-speed
    scrolling — not an iid random walk."""
    s = _session(n_frames=300)
    d = np.diff(np.array(s.camera), axis=0)
    assert np.abs(d).max() <= 3  # within the matcher's envelope
    still = (np.abs(d).sum(axis=1) == 0)
    assert still.sum() >= 30, "camera never rests"
    assert (~still).sum() >= 60, "camera never scrolls"
    # the session must cover multiple screens' worth of world
    cam = np.array(s.camera)
    assert cam[:, 0].max() - cam[:, 0].min() >= 300


def test_world_tiles_repeat_exactly():
    """Tile instances are pixel-identical (the real-capture regime the
    bounded join's stability proofs exist for, docs/INTERNALS.md §8)."""
    s = _session()
    w = s.world
    T = gameplay.TILE
    tiles = w.reshape(w.shape[0] // T, T, w.shape[1] // T, T)
    tiles = tiles.transpose(0, 2, 1, 3).reshape(-1, T, T)
    flat = tiles.reshape(len(tiles), -1)
    uniq = np.unique(flat, axis=0)
    assert len(uniq) < len(flat) / 8, (
        "world is not tile-repetitive enough to model real captures"
    )


def test_hud_digits_change_inside_static_chrome():
    s = _session()
    f0, f100 = s.frames[0], s.frames[100]
    hud_diff = (f0[-24:] != f100[-24:])  # bottom status bar
    assert hud_diff.any(), "HUD counters never changed"
    assert hud_diff.mean() < 0.25, "HUD chrome is not mostly static"
    # border chrome is fully static
    np.testing.assert_array_equal(f0[:8], f100[:8])
    np.testing.assert_array_equal(f0[:, :8], f100[:, :8])
    np.testing.assert_array_equal(f0[:, -8:], f100[:, -8:])


def test_sprites_animate():
    """Foreground must change shape frame to frame (not just translate):
    some frame pair with zero camera motion still differs inside the
    action window."""
    s = _session(n_frames=200)
    cam = np.array(s.camera)
    d = np.abs(np.diff(cam, axis=0)).sum(axis=1)
    still = np.flatnonzero(d == 0)
    changed = 0
    for t in still[:40]:
        a = s.frames[t][8:-32, 8:-8]
        b = s.frames[t + 1][8:-32, 8:-8]
        if (a != b).any():
            changed += 1
    assert changed >= 10, "no animated foreground on still frames"


# ---------------------------------------------------------------------------
# Top-down flip-screen genre
# ---------------------------------------------------------------------------

def _topdown(**kw):
    args = dict(seed=2, n_frames=300, frame_hw=(312, 388))
    args.update(kw)
    return gameplay.play_topdown_session(**args)


def test_topdown_deterministic():
    a, b = _topdown(), _topdown()
    for fa, fb in zip(a.frames, b.frames):
        np.testing.assert_array_equal(fa, fb)
    assert a.camera == b.camera


def test_topdown_camera_is_flip_screen_shaped():
    """The genre's contract: the camera is STATIC except whole-window
    pans at 7 px/frame and warp snaps; both axes must pan somewhere."""
    s = _topdown(n_frames=600)
    cam = np.array(s.camera)
    d = np.abs(np.diff(cam, axis=0))
    step = d.max(axis=1)
    static = step == 0
    pan = (step > 0) & (step <= 7)
    snap = step > 7
    assert static.sum() > len(step) * 0.5, "mostly static camera expected"
    assert pan.sum() >= 60, "screen-flip pans expected"
    assert snap.sum() >= 1, "no warp snap in the pinned seed"
    # pans are axis-locked
    both = (d[:, 0] > 0) & (d[:, 1] > 0) & pan
    assert not both.any(), "pans must be axis-locked"
    # both axes scroll somewhere in the session
    assert ((d[:, 0] > 0) & pan).any() and ((d[:, 1] > 0) & pan).any()
    # camera positions outside pans/snaps sit on the flip grid
    ah, aw = 312 - 24 - 16, 388 - 16
    at_rest = np.flatnonzero(np.concatenate([[True], static]) &
                             np.concatenate([static, [True]]))
    assert (cam[at_rest, 0] % aw == 0).all()
    assert (cam[at_rest, 1] % ah == 0).all()


def test_topdown_warp_is_a_teleport():
    """The warp snap moves the camera by more than a window on at least
    one axis — a guaranteed match failure, hence a fragment break."""
    s = _topdown(n_frames=600)
    cam = np.array(s.camera)
    d = np.abs(np.diff(cam, axis=0))
    snaps = d[d.max(axis=1) > 7]
    ah, aw = 312 - 24 - 16, 388 - 16
    assert ((snaps[:, 0] >= aw) | (snaps[:, 1] >= ah)).all()


@pytest.mark.slow
def test_topdown_window_is_discoverable():
    """aws (the spec) must accept the action window on flip-screen
    content — the pan speed / tile speckle interplay this genre was
    tuned for (see play_topdown_session)."""
    from remap_tpu.spec import aws

    s = _topdown(n_frames=260)
    w = aws.scan(iter(s.frames))
    assert w is not None
    assert (w.crop.left, w.crop.top) == (9, 9)
    assert (w.crop.right, w.crop.bottom) == (388 - 10, 312 - 24 - 10)


def test_dialog_interlude_contract():
    """Dialog boxes: bigger than fde's frame/5 area limit, typed-out
    text changing inside, world still scrolling behind."""
    s = _session(n_frames=160, dialog_every=70, dialog_frames=36)
    base = _session(n_frames=160)
    ah, aw = 312 - 24 - 16, 388 - 16
    bh = max(ah // 3 + 8, 100)
    assert bh * (aw - 20) > (ah * aw) // 5  # exceeds the fde drop limit
    # box present exactly during the dialog window
    f_in, f_out = s.frames[80], s.frames[110]
    box_rows = slice(8 + ah - bh - 6, 8 + ah - 6)
    assert (f_in[box_rows, 18:-18] == base.frames[80][box_rows, 18:-18]).mean() < 0.6
    np.testing.assert_array_equal(f_out, base.frames[110])
    # typewriter: the box interior changes between consecutive frames
    assert (s.frames[80][box_rows] != s.frames[84][box_rows]).any()
    # physics/camera are unaffected by the overlay
    assert s.camera == base.camera


# ---------------------------------------------------------------------------
# Vertical-scroll shooter genre
# ---------------------------------------------------------------------------

def _shmup(**kw):
    args = dict(seed=1, n_frames=300, frame_hw=(312, 388))
    args.update(kw)
    return gameplay.play_shmup_session(**args)


def test_shmup_deterministic():
    a, b = _shmup(), _shmup()
    for fa, fb in zip(a.frames, b.frames):
        np.testing.assert_array_equal(fa, fb)
    assert a.camera == b.camera


def test_shmup_camera_never_rests_except_holds():
    """The genre's contract: constant upward scroll with x locked,
    broken only by boss holds — the opposite motion regime of the
    dead-zone platformer and the flip-screen adventure."""
    s = _shmup()
    d = np.diff(np.array(s.camera), axis=0)
    assert (d[:, 0] == 0).all(), "camera x must be locked"
    assert set(np.unique(d[:, 1])) == {-2, 0}
    holds = (d[:, 1] == 0).sum()
    assert 20 <= holds <= 60, "boss holds missing or too long"
    # scroll runs are long and uninterrupted
    assert (d[:, 1] == -2).sum() >= 200


def test_shmup_long_session_never_runs_out_of_world():
    """World sizing must replay the hold schedule exactly: holds fire
    every `hold_every` SCROLL frames, so a holds-per-total-frames
    estimate undersizes long sessions and the camera rests at the world
    top (review-caught on the 1024-frame bench config: 29 unplanned
    static frames).  Every static frame must belong to a scheduled
    hold."""
    s = _shmup(seed=11, n_frames=1024)
    d = np.diff(np.array(s.camera), axis=0)
    holds = int((d[:, 1] == 0).sum())
    scrolls = int((d[:, 1] == -2).sum())
    assert holds % 36 == 0, f"{holds} static frames: unplanned camera rest"
    assert holds // 36 == scrolls // 150, "hold count != schedule"


def test_shmup_foreground_is_dense_and_fast():
    """Enemy waves + bullets + explosions: tens of foreground pixels on
    essentially every frame, and a coherent formation moving AGAINST the
    scroll somewhere in the session (the wrong-offset voting block the
    Borda majority must beat)."""
    s = _shmup()
    dense = 0
    for t in range(40, 280):
        f = s.frames[t][8:-32, 8:-8]
        if (f == 4).sum() >= 30:  # >= ~2 enemy ships visible
            dense += 1
    assert dense >= 180, f"enemy waves too sparse ({dense} dense frames)"


@pytest.mark.slow
def test_shmup_window_is_discoverable():
    from remap_tpu.spec import aws

    s = _shmup(n_frames=260)
    w = aws.scan(iter(s.frames))
    assert w is not None
    assert (w.crop.left, w.crop.top) == (9, 9)
    assert (w.crop.right, w.crop.bottom) == (388 - 10, 312 - 24 - 10)


def test_shmup_matcher_recovers_constant_scroll():
    """Every frame pair declares exactly the scroll delta — sustained
    constant-velocity content where a ±1 mis-track would accumulate
    silently into a sheared map."""
    from remap_tpu.config import PipelineConfig
    from remap_tpu.core.regions import make_layout
    from remap_tpu.pipeline import collect as collect_mod
    from remap_tpu.pipeline.state import FrameStore

    s = _shmup(n_frames=64, seed=4)
    frames = [f[8:-32, 8:-8] for f in s.frames]
    h, w = frames[0].shape
    cfg = PipelineConfig(
        screen_width=w, screen_height=h, frame_batch=32,
        region_capacity=1024,
    )
    layout = make_layout(w, h, cfg.grid_width, cfg.grid_height,
                         cfg.grid_overlap)
    offsets, matched, *_ = collect_mod.match_pass(
        iter(frames), layout, cfg, FrameStore(h, w)
    )
    cam = np.array(s.camera[:64])
    true = np.diff(cam, axis=0)
    assert matched[1:].all(), "shmup content must match frame to frame"
    np.testing.assert_array_equal(offsets[1:], true)


def test_matcher_recovers_camera_on_gameplay_content():
    """Our real (JAX) collect pass declares the true camera delta on a
    gameplay session — tile repetition, sparse sky regions and all."""
    from remap_tpu.config import PipelineConfig
    from remap_tpu.core.regions import make_layout
    from remap_tpu.pipeline import collect as collect_mod
    from remap_tpu.pipeline.state import FrameStore

    s = _session(n_frames=64, seed=9)
    # pre-cropped action window (aws discovery is covered by the e2e
    # differential; this unit pins the matcher alone)
    frames = [f[8:-32, 8:-8] for f in s.frames]
    h, w = frames[0].shape
    cfg = PipelineConfig(
        screen_width=w, screen_height=h, frame_batch=32,
        region_capacity=1024,
    )
    layout = make_layout(w, h, cfg.grid_width, cfg.grid_height,
                         cfg.grid_overlap)
    offsets, matched, *_ = collect_mod.match_pass(
        iter(frames), layout, cfg, FrameStore(h, w)
    )
    cam = np.array(s.camera[:64])
    true = np.diff(cam, axis=0)
    assert matched[1:].all(), "gameplay content must match frame to frame"
    np.testing.assert_array_equal(offsets[1:], true)


@pytest.mark.slow
def test_custom_palette_gameplay_e2e():
    """The full spec pipeline under the ZX preset on a playthrough:
    palette indices are palette-independent, but the luminance ORDER
    rides the palette — medians, keypoint codes, rank walks and splice
    scoring all change — and the reconstructed map must still equal the
    index-space world.  This is new surface the hardcoded-C64 reference
    cannot offer (cpl.hpp:77-92), so the oracle is the simulator's
    ground truth rather than the binary."""
    from remap_tpu.core import palette
    from remap_tpu.spec import pipeline as spec_pipeline

    session = gameplay.play_session(
        seed=9, n_frames=100, frame_hw=(150, 200)
    )
    palette.set_palette("zx", _clear_caches=False)
    try:
        maps = spec_pipeline.build(session.frames)
    finally:
        palette.set_palette("c64", _clear_caches=False)
    assert len(maps) == 1
    m = maps[0]

    cam = np.array(session.camera)  # (x, y) per frame
    y0, x0 = int(cam[:, 1].min()), int(cam[:, 0].min())
    painted = m != 0
    wh, ww = session.world.shape
    mh, mw = m.shape
    best = 0.0
    for dy in range(-4, 12):
        for dx in range(-4, 12):
            yy, xx = y0 + dy, x0 + dx
            if yy < 0 or xx < 0 or yy + mh > wh or xx + mw > ww:
                continue
            crop = session.world[yy : yy + mh, xx : xx + mw]
            best = max(best, float((crop == m)[painted].mean()))
    assert best >= 0.995, (
        f"zx-palette map agrees with the world on only {best:.3%}"
    )
    assert painted.mean() >= 0.80
