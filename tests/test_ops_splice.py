"""Device cellular matcher vs spec (kpm.hpp:371-393 semantics)."""

import numpy as np
import jax.numpy as jnp
import pytest

from remap_tpu.core.regions import make_layout
from remap_tpu.ops import kpe as jkpe
from remap_tpu.ops import splice as jsplice
from remap_tpu.ops import tables as jtab
from remap_tpu.spec import kpe as skpe
from remap_tpu.spec import kpm as skpm
from remap_tpu.utils import testing


def snippet(image, mask, capacity=4096):
    h, w = image.shape
    layout = make_layout(w, h, 1, 1, 0)
    dense = jkpe.extract_dense(jnp.asarray(image[None]), layout)
    tabs = jtab.extract_tables(dense.weight, dense.codes, layout, capacity)
    sres = skpe.extract(image, layout)
    hb = ((h + 127) // 128) * 128
    wb = ((w + 127) // 128) * 128
    mb = np.zeros((hb, wb), np.uint8)
    mb[:h, :w] = mask
    return tabs, sres.regions[0], mb, (w, h)


def run_both(img_a, mask_a, img_b, mask_b, mult=16):
    ta, ra, mba, da = snippet(img_a, mask_a)
    tb, rb, _, db = snippet(img_b, mask_b)
    jres = jsplice.match_fragments(
        ta.codes[0, 0], ta.pos[0, 0], ta.valid[0, 0],
        tb.codes[0, 0], tb.pos[0, 0], tb.valid[0, 0],
        jnp.asarray(mba),
        jnp.asarray(np.array(da, np.int32)),
        jnp.asarray(np.array(db, np.int32)),
        multiplicity=mult,
    )
    assert not bool(jres.overflow)
    sres = skpm.match_fragments(ra, mask_a, rb, mask_b, (15, 15))
    j = (
        (tuple(int(v) for v in np.asarray(jres.offset)), int(jres.count))
        if bool(jres.ok)
        else None
    )
    return j, sres


def test_overlapping_blends_match():
    rng = np.random.default_rng(5)
    world = testing.make_world(200, 260, rng)
    a = world[10:110, 10:150]
    b = world[40:150, 35:200]
    ma = np.ones(a.shape, np.uint8)
    mb = np.ones(b.shape, np.uint8)
    j, s = run_both(a, ma, b, mb)
    assert s is not None and j is not None
    assert j == s
    assert j[0] == (25, 30)


def test_disjoint_blends_reject():
    rng = np.random.default_rng(6)
    world_a = testing.make_world(120, 160, rng)
    world_b = testing.make_world(120, 160, np.random.default_rng(7))
    a = world_a[10:90, 10:130]
    b = world_b[10:90, 10:130]
    ma = np.ones(a.shape, np.uint8)
    j, s = run_both(a, ma, b, ma.copy())
    assert j == s  # both reject (or both accept a coincidence)


def test_bucketed_snippet_equals_exact_canvas():
    """pipeline.splice extracts snippets on shape-bucketed canvases
    (one compiled program per bucket); the tables must be BIT-IDENTICAL
    to exact-canvas extraction — interior keypoints' windows never read
    the pad, positions are width-invariant, row-major order preserved."""
    from remap_tpu.config import PipelineConfig
    from remap_tpu.pipeline.splice import _extract_snippet
    from remap_tpu.pipeline.state import Fragment

    rng = np.random.default_rng(31)
    # deliberately awkward true dims (not multiples of any bucket)
    ch, cw = 187, 309
    world = testing.make_world(ch, cw, rng)
    dots = np.zeros((ch, cw, 16), np.uint16)
    ys, xs = np.indices((ch, cw))
    dots[ys, xs, world] = 3                       # clean blend == world
    dots[: 7, :, :] = 0                           # empty margin band
    frag = Fragment(dots=dots, zero=(0, 0), frames=[], store=None)

    cfg = PipelineConfig(screen_width=cw, screen_height=ch)
    snip = _extract_snippet(frag, cfg)

    # exact-canvas reference extraction
    image = dots.argmax(axis=2).astype(np.uint8)
    layout = make_layout(cw, ch, 1, 1, 0)
    dense = jkpe.extract_dense(jnp.asarray(image[None]), layout)
    total = int(np.asarray((dense.weight[0] > 0).sum()))
    cap = cfg.splice_capacity
    while cap < total:
        cap *= 4
    tabs = jtab.extract_tables(dense.weight, dense.codes, layout, cap)

    assert snip.codes.shape[0] == cap
    valid = np.asarray(tabs.valid[0, 0])
    np.testing.assert_array_equal(snip.valid, valid)
    assert valid.sum() == total
    # invalid rows hold junk gathers (position 0 of differently-shaped
    # slabs) and are masked out of every consumer — compare valid rows
    np.testing.assert_array_equal(snip.codes[valid],
                                  np.asarray(tabs.codes[0, 0])[valid])
    np.testing.assert_array_equal(snip.pos[valid],
                                  np.asarray(tabs.pos[0, 0])[valid])


def test_count_guided_multiplicity_jump():
    """Repetitive tile content must resolve with ONE count-guided
    multiplicity retry (the join reports the exact max code repetition)
    instead of walking the ladder to the dense [K, K] endpoint — which
    is an OOM cliff at session-scale capacities.  The jumped result
    must equal the dense join's."""
    rng = np.random.default_rng(21)
    # identical 13x13 stamps on a uniform ground: codes repeat EXACTLY
    # per stamp instance (the stamp-band differential's adversary shape)
    world = np.zeros((220, 280), np.uint8)
    stamp = rng.integers(0, 16, size=(13, 13), dtype=np.uint8)
    for y in range(5, 200, 22):
        for x in range(5, 260, 22):
            world[y : y + 13, x : x + 13] = stamp
    a = world[10:130, 10:180]
    b = world[50:180, 45:260]
    ma = np.ones(a.shape, np.uint8)
    mb = np.ones(b.shape, np.uint8)
    ta, _, mba, da = snippet(a, ma)
    tb, _, _, db = snippet(b, mb)
    args = (
        ta.codes[0, 0], ta.pos[0, 0], ta.valid[0, 0],
        tb.codes[0, 0], tb.pos[0, 0], tb.valid[0, 0],
        jnp.asarray(mba),
        jnp.asarray(np.array(da, np.int32)),
        jnp.asarray(np.array(db, np.int32)),
    )
    low = jsplice.match_fragments(*args, multiplicity=1)
    if not bool(low.overflow):
        pytest.skip("content did not truncate at multiplicity 1")
    needed = int(low.needed_multiplicity)
    assert needed > 1
    nm = 2
    while nm < needed:
        nm *= 2
    jumped = jsplice.match_fragments(*args, multiplicity=nm)
    assert not bool(jumped.overflow)   # one retry enumerated every pair
    dense = jsplice.match_fragments(*args, multiplicity=0)
    assert bool(jumped.ok) == bool(dense.ok)
    np.testing.assert_array_equal(np.asarray(jumped.offset),
                                  np.asarray(dense.offset))
    assert int(jumped.count) == int(dense.count)


def test_partial_masks():
    rng = np.random.default_rng(8)
    world = testing.make_world(200, 260, rng)
    a = world[10:110, 10:150].copy()
    b = world[40:150, 35:200].copy()
    ma = np.ones(a.shape, np.uint8)
    mb = np.ones(b.shape, np.uint8)
    ma[:, :40] = 0   # left band of a is empty atlas
    a[:, :40] = 0
    j, s = run_both(a, ma, b, mb)
    assert j == s


def test_host_needed_multiplicity_matches_join():
    """pipeline.splice._needed_multiplicity (the host-side jump-start
    estimate that lets a session-scale splice compile ONE pair-match
    program instead of overflowing through a ladder of ~110 s remote
    compiles) must equal the join's own needed_multiplicity on every
    table pair."""
    from remap_tpu.ops import kpm as jkpm
    from remap_tpu.pipeline.splice import _needed_multiplicity

    rng = np.random.default_rng(77)

    class T:
        pass

    for trial in range(6):
        k = 96
        reps = rng.integers(2, 10)
        codes = rng.integers(1, reps + 2, size=(2, k, 4)).astype(np.uint32)
        pos = rng.integers(0, 3000, size=(2, k, 2)).astype(np.int32)
        valid = rng.random((2, k)) < 0.8
        h = T()
        h.codes, h.valid = codes[0], valid[0]
        o = T()
        o.codes, o.valid = codes[1], valid[1]

        join = jkpm._join_slots_scan(
            jnp.asarray(codes[0]), jnp.asarray(pos[0]),
            jnp.asarray(valid[0]),
            jnp.asarray(codes[1]), jnp.asarray(pos[1]),
            jnp.asarray(valid[1]), 4,
        )
        assert _needed_multiplicity(h, o) == int(join[7]), trial
