"""Correlation / pyramid matcher families + matcher-pluggable collect."""

import numpy as np
import jax.numpy as jnp
import pytest

from remap_tpu.config import PipelineConfig
from remap_tpu.models.pyramid import match_pyramid
from remap_tpu.ops import correlate
from remap_tpu.pipeline import collect as jcollect
from remap_tpu.utils import testing


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(71)
    return testing.make_world(400, 520, rng, tile=8)


def frames_at(world, cams, h, w):
    return np.stack([world[y : y + h, x : x + w] for x, y in cams])


def test_xcorr_recovers_shifts(world):
    cams_prev = [(100, 100), (130, 90), (80, 120)]
    cams_curr = [(103, 98), (140, 100), (80, 120)]
    prev = frames_at(world, cams_prev, 96, 128)
    curr = frames_at(world, cams_curr, 96, 128)
    res = correlate.match_xcorr(
        jnp.asarray(prev), jnp.asarray(curr), radius=16
    )
    offs = np.asarray(res.offset)
    ok = np.asarray(res.ok)
    for i, ((px, py), (cx, cy)) in enumerate(zip(cams_prev, cams_curr)):
        assert ok[i]
        assert tuple(offs[i]) == (cx - px, cy - py)


def test_xcorr_rejects_unrelated(world):
    rng = np.random.default_rng(73)
    prev = frames_at(world, [(100, 100)], 96, 128)
    curr = rng.integers(0, 16, size=(1, 96, 128), dtype=np.uint8)
    res = correlate.match_xcorr(jnp.asarray(prev), jnp.asarray(curr), radius=16)
    assert not bool(res.ok[0])


def test_pyramid_recovers_large_shifts(world):
    # shifts far beyond a fine-only radius
    cams_prev = [(60, 60), (200, 150)]
    cams_curr = [(108, 97), (150, 180)]
    prev = frames_at(world, cams_prev, 192, 256)
    curr = frames_at(world, cams_curr, 192, 256)
    offs, ok = match_pyramid(
        jnp.asarray(prev), jnp.asarray(curr),
        factor=4, coarse_radius=16, fine_radius=7,
    )
    offs = np.asarray(offs)
    for i, ((px, py), (cx, cy)) in enumerate(zip(cams_prev, cams_curr)):
        assert bool(ok[i])
        assert tuple(offs[i]) == (cx - px, cy - py)


def test_collect_with_xcorr_matcher():
    clip = testing.simple_clip(
        n_frames=12, frame_hw=(64, 96), world_hw=(160, 224), seed=41
    )
    cfg = PipelineConfig(
        screen_width=96, screen_height=64,
        region_capacity=2048, frame_batch=8, matcher="xcorr",
    )
    res = jcollect.collect(clip.frames, cfg)
    assert len(res.fragments) == 1
    assert [tuple(o) for o in res.offsets[1:]] == clip.offsets
