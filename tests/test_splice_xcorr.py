"""Correlation-family splice matching (ops.correlate.match_canvases).

The reference's splice stage is keypoint-cellular only (fgs.hpp:119-140);
the xcorr/pyramid families replace it with dense masked-agreement
correlation.  These tests pin the offset convention to the cellular
matcher's (offset = other-fragment origin in head-fragment coords) and
check the acceptance logic and the end-to-end family switch.
"""

import dataclasses

import numpy as np
import pytest

from remap_tpu.config import PipelineConfig
from remap_tpu.ops import correlate
from remap_tpu.utils import testing


def _bucket(a, mask=None):
    h, w = a.shape
    hb = ((h + 127) // 128) * 128
    wb = ((w + 127) // 128) * 128
    img = np.zeros((hb, wb), np.uint8)
    img[:h, :w] = a
    m = np.zeros((hb, wb), np.uint8)
    m[:h, :w] = 1 if mask is None else mask
    return img, m


def test_canvas_offset_convention():
    rng = np.random.default_rng(5)
    world = testing.make_world(200, 260, rng)
    a = world[10:110, 10:150]
    b = world[40:150, 35:200]
    ia, ma = _bucket(a)
    ib, mb = _bucket(b)
    res = correlate.match_canvases(ia, ma, ib, mb)
    assert bool(res.ok)
    assert tuple(int(v) for v in np.asarray(res.offset)) == (25, 30)
    # the overlap rectangle: x in [35,150), y in [40,110) world coords
    assert int(res.overlap) == (150 - 35) * (110 - 40)
    assert int(res.count) == int(res.overlap)  # identical world content


def test_canvas_negative_offset():
    rng = np.random.default_rng(9)
    world = testing.make_world(220, 260, rng)
    a = world[60:180, 70:220]    # head deeper in the world
    b = world[20:130, 20:160]    # other up-left of it
    ia, ma = _bucket(a)
    ib, mb = _bucket(b)
    res = correlate.match_canvases(ia, ma, ib, mb)
    assert bool(res.ok)
    assert tuple(int(v) for v in np.asarray(res.offset)) == (-50, -40)


def test_canvas_reject_unrelated():
    a = testing.make_world(150, 180, np.random.default_rng(6))
    b = testing.make_world(150, 180, np.random.default_rng(7))
    ia, ma = _bucket(a)
    ib, mb = _bucket(b)
    res = correlate.match_canvases(ia, ma, ib, mb)
    assert not bool(res.ok)


def test_canvas_respects_masks():
    rng = np.random.default_rng(8)
    world = testing.make_world(200, 260, rng)
    a = world[10:110, 10:150].copy()
    b = world[40:150, 35:200]
    mask_a = np.ones(a.shape, np.uint8)
    mask_a[:, :40] = 0          # left band of head never covered
    a[:, :40] = 0
    ia, ma = _bucket(a, mask_a)
    ib, mb = _bucket(b)
    res = correlate.match_canvases(ia, ma, ib, mb)
    assert bool(res.ok)
    assert tuple(int(v) for v in np.asarray(res.offset)) == (25, 30)
    # overlap excludes the masked band: x in [50,150) now
    assert int(res.overlap) == (150 - 50) * (110 - 40)


def test_canvas_pyramid_agrees_with_flat():
    rng = np.random.default_rng(11)
    world = testing.make_world(260, 300, rng)
    a = world[10:140, 10:200]
    b = world[50:230, 45:260]
    ia, ma = _bucket(a)
    ib, mb = _bucket(b)
    flat = correlate.match_canvases(ia, ma, ib, mb)
    pyr = correlate.match_canvases_pyramid(ia, ma, ib, mb, factor=4)
    assert bool(flat.ok) and bool(pyr.ok)
    assert np.array_equal(np.asarray(flat.offset), np.asarray(pyr.offset))
    assert int(flat.count) == int(pyr.count)


@pytest.mark.parametrize("family", ["xcorr", "pyramid"])
def test_splice_family_end_to_end(family):
    """splice() under a correlation family merges overlapping fragments to
    the same canvas the cellular (grid_vote) path produces."""
    from remap_tpu.pipeline.splice import splice
    from remap_tpu.pipeline.state import Fragment, FrameRef

    rng = np.random.default_rng(12)
    world = testing.make_world(300, 340, rng)
    fh, fw = 96, 128

    def frag(x0, y0, n, dx):
        dots = None
        frames = []
        for i in range(n):
            f = world[y0 : y0 + fh, x0 + i * dx : x0 + i * dx + fw]
            votes = (
                f[..., None] == np.arange(16, dtype=np.uint8)
            ).astype(np.uint16)
            if dots is None:
                dots = np.zeros((fh, fw + (n - 1) * dx, 16), np.uint16)
            dots[:, i * dx : i * dx + fw] += votes
            frames.append(FrameRef(i, (x0 + i * dx, y0)))
        return Fragment(dots=dots, zero=(x0, y0), frames=frames, store=None)

    # two fragments of the same world, overlapping by most of a frame
    left = frag(10, 30, 3, 16)
    right = frag(10 + 2 * 16 + 24, 30, 3, 16)

    cfg = dataclasses.replace(
        PipelineConfig(screen_width=fw, screen_height=fh), matcher=family
    )
    out = splice([left, right], cfg, frame_dims=(fw, fh))
    assert len(out) == 1
    # merged + normalized: canvas coords, with the two trains 8 px apart
    xs = sorted(fr.position[0] for fr in out[0].frames)
    assert [x - xs[0] for x in xs] == [0, 16, 32, 56, 72, 88]
    assert all(fr.position[1] == xs[0] - xs[0] for fr in out[0].frames)

    ref_cfg = dataclasses.replace(cfg, matcher="grid_vote")
    ref = splice(
        [frag(10, 30, 3, 16), frag(10 + 2 * 16 + 24, 30, 3, 16)],
        ref_cfg,
        frame_dims=(fw, fh),
    )
    assert len(ref) == 1
    assert np.array_equal(out[0].dots, ref[0].dots)
    assert out[0].zero == ref[0].zero
