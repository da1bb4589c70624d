"""Multi-device sharded pipeline on the 8-device fake CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from remap_tpu.config import PipelineConfig
from remap_tpu.core.regions import make_layout
from remap_tpu.parallel import mesh as mesh_lib
from remap_tpu.parallel.sharded import (
    make_pipeline_step,
    make_sharded_step,
    make_streaming_step,
    segmented_positions,
)
from remap_tpu.utils import testing

CFG = PipelineConfig(
    screen_width=96, screen_height=64, region_capacity=512, frame_batch=4
)
LAYOUT = make_layout(96, 64, 4, 2, 16)


def test_mesh_axes():
    m = mesh_lib.make_mesh(8, space=2)
    assert m.shape == {"data": 4, "space": 2}
    m1 = mesh_lib.make_mesh(8)
    assert m1.shape == {"data": 8, "space": 1}


def test_segmented_positions():
    offs = jnp.asarray(
        np.array([[[0, 0], [1, 2], [3, -1], [0, 0], [2, 2]]], np.int32)
    )
    matched = jnp.asarray(np.array([[False, True, True, False, True]]))
    pos = np.asarray(segmented_positions(offs, matched))[0]
    assert pos.tolist() == [[0, 0], [1, 2], [4, 1], [0, 0], [2, 2]]


def test_sharded_step_matches_single_device():
    # 4 clips over ('data' 4, 'space' 2); must equal the unsharded step
    rng = np.random.default_rng(91)
    clips = []
    for s in range(4):
        clip = testing.simple_clip(
            n_frames=4, frame_hw=(64, 96), world_hw=(160, 224), seed=100 + s
        )
        clips.append(np.stack(clip.frames))
    images = np.stack(clips)  # [4, 4, 64, 96]

    mesh = mesh_lib.make_mesh(8, space=2)
    sharded = make_sharded_step(mesh, LAYOUT, CFG, atlas_pad=16)
    plain = jax.jit(make_pipeline_step(LAYOUT, CFG, atlas_pad=16))

    rs = sharded(images)
    rp = plain(images)
    np.testing.assert_array_equal(np.asarray(rs.offsets), np.asarray(rp.offsets))
    np.testing.assert_array_equal(np.asarray(rs.matched), np.asarray(rp.matched))
    np.testing.assert_array_equal(np.asarray(rs.atlas), np.asarray(rp.atlas))


@pytest.mark.parametrize("family", ["xcorr", "pyramid"])
def test_sharded_step_correlation_families(family):
    """BASELINE config 5 names pyramid matching for the pod-slice case:
    the sharded step must run the correlation families too, equal to the
    unsharded step (clips over 'data'; the FFTs force XLA to gather the
    'space'-sharded frame axis — correct, just not where their
    parallelism comes from)."""
    rng = np.random.default_rng(17)
    world = testing.make_world(420, 540, rng, tile=8)
    clips = []
    for s in range(4):
        x0, y0 = 40 + 60 * s, 30 + 40 * s
        path = [(x0 + 5 * i, y0 + 3 * i) for i in range(4)]
        clips.append(np.stack(testing.render_clip(world, path, (192, 256)).frames))
    images = np.stack(clips)  # [4, 4, 192, 256]

    cfg = PipelineConfig(
        screen_width=256, screen_height=192, region_capacity=512,
        frame_batch=4, matcher=family,
    )
    layout = make_layout(256, 192, 4, 2, 16)
    mesh = mesh_lib.make_mesh(8, space=2)  # data 4, space 2
    sharded = make_sharded_step(mesh, layout, cfg, atlas_pad=32)
    plain = jax.jit(make_pipeline_step(layout, cfg, atlas_pad=32))

    rs = sharded(images)
    rp = plain(images)
    np.testing.assert_array_equal(np.asarray(rs.offsets), np.asarray(rp.offsets))
    np.testing.assert_array_equal(np.asarray(rs.matched), np.asarray(rp.matched))
    np.testing.assert_array_equal(np.asarray(rs.atlas), np.asarray(rp.atlas))
    # the known camera deltas must be recovered on every clip
    offs = np.asarray(rs.offsets)
    assert np.asarray(rs.matched)[:, 1:].all()
    assert (offs[:, 1:] == np.array([5, 3], np.int32)).all()


def test_streaming_reanchors_on_long_drift():
    """A drift far past atlas_pad must stitch exactly: the resident atlas
    shifts in-device under the camera instead of clamping positions."""
    rng = np.random.default_rng(7)
    world = testing.make_world(160, 224, rng)
    # monotonic rightward drift: 24 frames x 3 px = 69 px >> 2*pad (32)
    path = [(8 + 3 * i, 40) for i in range(24)]
    clip = testing.render_clip(world, path, (64, 96))
    frames = np.stack(clip.frames)

    pad = 16
    init, step = make_streaming_step(LAYOUT, CFG, atlas_pad=pad,
                                     use_pallas=False)
    step = jax.jit(step)
    state = init()
    for i in range(0, 24, 4):
        offs, ok, ovf, strayed, state = step(
            jnp.asarray(frames[i : i + 4]), state
        )
        assert not bool(np.asarray(strayed))
        assert not bool(np.asarray(ovf).any())

    anchor = np.asarray(state.anchor)
    dots = np.asarray(state.dots)  # [16, HP, WP]
    votes = dots.sum(axis=0)
    covered = votes > 0
    assert covered.any()
    blend = dots.argmax(axis=0)
    # stream coord = atlas coord + anchor; world coord = stream + path[0]
    ys, xs = np.nonzero(covered)
    wy = ys + anchor[1] + path[0][1]
    wx = xs + anchor[0] + path[0][0]
    np.testing.assert_array_equal(blend[ys, xs], world[wy, wx])
    # the window really did move: the final frame's position (69, 0)
    # could not have fit the unshifted [0, 2*pad] window
    assert anchor[0] > -pad


def test_streaming_strays_on_window_overflow():
    """A batch whose position span exceeds the window (long drift + a
    mid-batch fragment break resetting to (0,0)) must flag ``strayed``."""
    rng = np.random.default_rng(8)
    world = testing.make_world(160, 224, rng)
    path = [(8 + 3 * i, 40) for i in range(21)]
    clip = testing.render_clip(world, path, (64, 96))
    frames = list(clip.frames)
    # noise frames break the match chain -> position resets to (0, 0) in
    # the same batch as the drifted frame 20 (stream position x=60)
    frames.append(rng.integers(0, 16, (64, 96), dtype=np.uint8))
    frames.append(frames[-1].copy())
    frames.append(frames[-1].copy())
    frames = np.stack(frames)

    init, step = make_streaming_step(LAYOUT, CFG, atlas_pad=16,
                                     use_pallas=False)
    step = jax.jit(step)
    state = init()
    flags = []
    for i in range(0, 24, 4):
        offs, ok, ovf, strayed, state = step(
            jnp.asarray(frames[i : i + 4]), state
        )
        flags.append(bool(np.asarray(strayed)))
    assert not any(flags[:-1])
    assert flags[-1]


def test_streaming_equals_batch_collect():
    from remap_tpu.pipeline import collect as jcollect

    clip = testing.simple_clip(
        n_frames=12, frame_hw=(64, 96), world_hw=(160, 224), seed=31
    )
    col = jcollect.collect(clip.frames, CFG)

    init, step = make_streaming_step(LAYOUT, CFG, atlas_pad=32, use_pallas=False)
    step = jax.jit(step)
    state = init()
    offs_all = []
    ok_all = []
    for i in range(0, 12, 4):
        batch = jnp.asarray(np.stack(clip.frames[i : i + 4]))
        offs, ok, ovf, strayed, state = step(batch, state)
        assert not bool(np.asarray(ovf).any())
        offs_all.extend(tuple(int(v) for v in o) for o in np.asarray(offs))
        ok_all.extend(bool(v) for v in np.asarray(ok))
    assert offs_all == [tuple(o) for o in col.offsets]
    assert ok_all == col.matched.tolist()
