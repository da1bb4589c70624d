"""Spec kpm matching on shifted synthetic frames."""

import numpy as np
import pytest

from remap_tpu.core.regions import make_layout
from remap_tpu.spec import kpe, kpm
from remap_tpu.utils import testing


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(3)
    return testing.make_world(160, 200, rng)


def extract_at(world, x, y, layout):
    frame = world[y : y + layout.height, x : x + layout.width]
    return kpe.extract(frame, layout)


@pytest.mark.parametrize("shift", [(0, 0), (3, 0), (0, 2), (-2, 3), (5, -4)])
def test_match_recovers_shift(world, shift):
    layout = make_layout(96, 64, 4, 2, 16)
    dx, dy = shift
    prev = extract_at(world, 40, 40, layout)
    curr = extract_at(world, 40 + dx, 40 + dy, layout)
    off = kpm.match_frames(
        prev.regions, curr.regions, weight_switch=10, region_votes=3
    )
    # offset = prev_point - curr_point = camera delta
    assert off == (dx, dy)


def test_no_match_on_unrelated_frames(world):
    layout = make_layout(64, 48, 4, 2, 8)
    prev = extract_at(world, 0, 0, layout)
    rng = np.random.default_rng(9)
    other = rng.integers(0, 16, size=(48, 64), dtype=np.uint8)
    res = kpe.extract(other, layout)
    off = kpm.match_frames(
        prev.regions, res.regions, weight_switch=10, region_votes=3
    )
    assert off is None


def test_gate_on_inactive_regions():
    layout = make_layout(64, 48, 4, 2, 8)
    flat = np.zeros((48, 64), dtype=np.uint8)  # no keypoints at all
    res = kpe.extract(flat, layout)
    assert all(not r.active for r in res.regions)
    off = kpm.match_frames(
        res.regions, res.regions, weight_switch=10, region_votes=3
    )
    assert off is None


def test_fragment_match_recovers_shift(world):
    layout_full = make_layout(120, 90, 1, 1, 0)
    a = world[10 : 10 + 90, 10 : 10 + 120]
    b = world[30 : 30 + 90, 25 : 25 + 120]
    ra = kpe.extract(a, layout_full)
    rb = kpe.extract(b, layout_full)
    mask = np.ones((90, 120), dtype=np.uint8)
    vote = kpm.match_fragments(
        ra.regions[0], mask, rb.regions[0], mask, (15, 15)
    )
    assert vote is not None
    off, count = vote
    # a is at world (10,10), b at (25,30): a_point - b_point = (15, 20)...
    # feature at world (wx,wy): a coords (wx-10, wy-10), b coords
    # (wx-25, wy-30) -> offset = (15, 20).
    assert off == (15, 20)
    assert count > 0
