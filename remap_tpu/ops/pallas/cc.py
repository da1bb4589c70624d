"""Pallas TPU kernel: connected-component labeling (cte.hpp's flood fill).

The XLA formulation (ops.cc) interleaves 4-neighbour min sweeps with
pointer-jumping — but the jump is a full-plane HBM gather (~1.6 ms/frame
at NES size), and it dominates the foreground pass.  This kernel keeps
the whole label plane in VMEM and replaces the gather with **alternating
segmented run-min scans**:

- a *row pass* takes, for every pixel, the min label over its maximal
  horizontal run of equal-valued pixels (Hillis-Steele segmented scan,
  log2(W) doubling steps, forward + backward);
- a *column pass* does the same vertically.

Equal-valued 4-connectivity is exactly "same horizontal run OR same
vertical run", so alternating the two passes to a fixpoint computes the
same labels as the reference's BFS flood fill (cte.hpp:103-147): every
component ends at the flat index of its row-major-first pixel — the
discovery order downstream tie-breaks rely on.  Each iteration moves
label information across an entire run (not one pixel), so the fixpoint
lands in a handful of iterations on real content.

Border pixels keep the sentinel label H*W and an impossible image value,
so nothing propagates across the horizon frame (cte.hpp:149-166).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cc_core(img, values, geometry=None):
    """Run the segmented-scan min-propagation fixpoint.

    ``values`` is a tuple of int32 planes, each propagated with MIN over
    equal-valued 4-connectivity (propagate a negated plane for MAX).  The
    fixpoint is checked across ALL planes: label values can stabilize
    before a slower-travelling stat (e.g. a far corner's bbox extent)
    finishes crossing the component.

    ``geometry`` (interior, big) overrides the whole-frame defaults for
    banded invocations, where the interior mask depends on the band's
    global row range and the sentinel on the full-image size."""
    h, w = img.shape

    yi = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xi = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    if geometry is None:
        big = h * w
        # bottom horizon is TWO rows (cte.hpp:155-165; see ops.cc doc)
        interior = (yi > 0) & (yi < h - 2) & (xi > 0) & (xi < w - 1)
    else:
        interior, big = geometry
    im = jnp.where(interior, img, -1)

    def shift_fwd(a, s, axis, fill):
        r = jnp.roll(a, s, axis)
        idx = yi if axis == 0 else xi
        return jnp.where(idx >= s, r, fill)

    def shift_bwd(a, s, axis, fill):
        r = jnp.roll(a, -s, axis)
        idx = yi if axis == 0 else xi
        n = h if axis == 0 else w
        return jnp.where(idx < n - s, r, fill)

    one = jnp.int32(1)

    def flags(axis):
        prev = shift_fwd(im, 1, axis, -2)
        nxt = shift_bwd(im, 1, axis, -2)
        return (
            jnp.where(im != prev, one, 0),
            jnp.where(im != nxt, one, 0),
        )

    rs_start, rs_end = flags(1)
    cs_start, cs_end = flags(0)

    def seg_min_multi(vals, axis, start, end):
        n = w if axis == 1 else h
        outs = []
        for l in vals:
            vf, ff = l, start
            s = 1
            while s < n:
                vs = shift_fwd(vf, s, axis, big)
                fs = shift_fwd(ff, s, axis, one)
                vf = jnp.where(ff != 0, vf, jnp.minimum(vf, vs))
                ff = jnp.maximum(ff, fs)
                s *= 2
            vb, fb = l, end
            s = 1
            while s < n:
                vs = shift_bwd(vb, s, axis, big)
                fs = shift_bwd(fb, s, axis, one)
                vb = jnp.where(fb != 0, vb, jnp.minimum(vb, vs))
                fb = jnp.maximum(fb, fs)
                s *= 2
            outs.append(jnp.minimum(vf, vb))
        return tuple(outs)

    def body(state):
        vals, _ = state
        v1 = seg_min_multi(vals, 1, rs_start, rs_end)
        v2 = seg_min_multi(v1, 0, cs_start, cs_end)
        changed = False
        for a, b in zip(v2, vals):
            changed = jnp.logical_or(changed, jnp.any(a != b))
        return v2, changed

    init = tuple(jnp.where(interior, v, big) for v in values)
    first = body((init, jnp.bool_(True)))
    vals, _ = jax.lax.while_loop(lambda s: s[1], body, first)
    return vals, interior, yi, xi


def _cc_kernel(img_ref, lab_ref):
    img = img_ref[0]
    h, w = img.shape
    big = h * w
    yi = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xi = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    (lab,), interior, _, _ = _cc_core(img, (yi * w + xi,))
    lab_ref[0] = jnp.where(interior, lab, big)


def _cc_mins_kernel(img_ref, lab_ref, mins_ref):
    """Labels + component (minx, miny) in one fixpoint.

    Per-pixel bbox/changed stats are idempotent lattice joins, so they
    ride the same min-propagation as the labels (negated for the
    max-algebra planes).  They replace five XLA segment scatters per
    frame (measured ~170 ms per 64-frame batch) with in-VMEM work; the
    six planes split across two kernels because one 6-plane fixpoint
    overflows the 16 MB VMEM budget at NES size."""
    img = img_ref[0]
    h, w = img.shape
    big = h * w
    yi = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xi = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    (lab, minx, miny), interior, _, _ = _cc_core(
        img, (yi * w + xi, xi, yi)
    )
    lab_ref[0] = jnp.where(interior, lab, big)
    mins_ref[0, 0] = minx
    mins_ref[0, 1] = miny


def _cc_maxs_kernel(img_ref, chg_ref, maxs_ref):
    """Component (maxx, maxy, has_changed) — see _cc_mins_kernel."""
    img = img_ref[0]
    chg = chg_ref[0]
    h, w = img.shape
    yi = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xi = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    (nmaxx, nmaxy, nchg), _, _, _ = _cc_core(img, (-xi, -yi, -chg))
    maxs_ref[0, 0] = -nmaxx
    maxs_ref[0, 1] = -nmaxy
    maxs_ref[0, 2] = -nchg


@jax.jit
def label_components_batch(images: jax.Array) -> jax.Array:
    """[B, H, W] uint8/int -> [B, H, W] int32 labels.

    Interior pixels get their component's row-major-first flat index,
    border pixels get H*W — identical to ops.cc.label_components."""
    b, h, w = images.shape
    i32 = images.astype(jnp.int32)
    return pl.pallas_call(
        _cc_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.int32),
    )(i32)


def _make_band_kernel(true_h: int, bh: int):
    """Label one row-band with GLOBAL row-major flat indices.

    The band is labeled in isolation (runs stop at the band boundary);
    cross-band components are unified afterwards by
    :func:`_merge_band_labels`.  Interior/horizon masking uses the
    band's global row range against the full-image geometry."""

    def kernel(img_ref, lab_ref):
        band = pl.program_id(1)
        img = img_ref[0, 0]
        h, w = img.shape            # h == bh
        big = true_h * w
        gy0 = band * bh
        yi = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) + gy0
        xi = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        interior = (
            (yi > 0) & (yi < true_h - 2) & (xi > 0) & (xi < w - 1)
        )
        (lab,), _, _, _ = _cc_core(
            img, (yi * w + xi,), geometry=(interior, big)
        )
        lab_ref[0, 0] = jnp.where(interior, lab, big)

    return kernel


def _seg_run_min(keys, vals):
    """Per-element min of ``vals`` over its run of equal (sorted) keys."""
    n = keys.shape[-1]
    fwd = vals
    s = 1
    while s < n:
        ks = jnp.pad(keys[..., :-s], ((0, 0), (s, 0)), constant_values=-1)
        vs = jnp.pad(fwd[..., :-s], ((0, 0), (s, 0)),
                     constant_values=jnp.iinfo(jnp.int32).max)
        fwd = jnp.where(ks == keys, jnp.minimum(fwd, vs), fwd)
        s *= 2
    bwd = fwd
    s = 1
    while s < n:
        ks = jnp.pad(keys[..., s:], ((0, 0), (0, s)), constant_values=-1)
        vs = jnp.pad(bwd[..., s:], ((0, 0), (0, s)),
                     constant_values=jnp.iinfo(jnp.int32).max)
        bwd = jnp.where(ks == keys, jnp.minimum(bwd, vs), bwd)
        s *= 2
    return bwd


def _make_band_relax_kernel(true_h: int, bh: int):
    """Pass 2: propagate an existing (boundary-rooted) label plane to its
    in-band fixpoint.  Identical to _make_band_kernel except the label
    plane arrives as an input instead of starting from iota."""

    def kernel(img_ref, lab_in_ref, lab_ref):
        band = pl.program_id(1)
        img = img_ref[0, 0]
        h, w = img.shape
        big = true_h * w
        gy0 = band * bh
        yi = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) + gy0
        xi = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        interior = (
            (yi > 0) & (yi < true_h - 2) & (xi > 0) & (xi < w - 1)
        )
        (lab,), _, _, _ = _cc_core(
            img, (lab_in_ref[0, 0],), geometry=(interior, big)
        )
        lab_ref[0, 0] = jnp.where(interior, lab, big)

    return kernel


def _merge_band_labels(labels, images, bh: int, true_h: int):
    """Unify components across band boundaries, without any dense-table
    gather (a 2M-row relabel gather alone costs ~19 ms on TPU — the
    scalar-core addressing floor).

    1. Boundary edges: (label above, label below) where the image value
       matches across each band boundary.
    2. Compact union-find by min-relaxation over the edge list: rounds
       of sort + segmented run-min until no estimate changes (all
       sort/scan ops on the ~(R-1)*W edge array; typical content
       converges in a handful of rounds).
    3. Each boundary pixel's rooted label rides back in edge order; the
       caller re-runs the in-band min fixpoint seeded with the rooted
       boundary rows, which spreads the global roots through band
       interiors (labels only ever decrease within the same component,
       so the result equals the whole-frame kernel's labels).
    """
    b, hp, w = labels.shape
    r = hp // bh
    big = true_h * w

    lab_r = labels.reshape(b, r, bh, w)
    img_r = images.astype(jnp.int32).reshape(b, r, bh, w)
    above = lab_r[:, :-1, -1].reshape(b, -1)     # last row of band k
    below = lab_r[:, 1:, 0].reshape(b, -1)       # first row of band k+1
    ia = img_r[:, :-1, -1].reshape(b, -1)
    ib = img_r[:, 1:, 0].reshape(b, -1)
    valid = (ia == ib) & (above < big) & (below < big)
    ea = jnp.where(valid, above, big)
    eb = jnp.where(valid, below, big)
    e = ea.shape[1]

    keys0 = jnp.concatenate([ea, eb], axis=1)          # [B, 2E]
    pos = jnp.broadcast_to(
        jnp.arange(2 * e, dtype=jnp.int32), keys0.shape
    )
    skeys, spos = jax.lax.sort((keys0, pos), num_keys=1, dimension=1)

    def body(state):
        ra, rb, _ = state
        m = jnp.minimum(ra, rb)
        vals = jnp.concatenate([m, m], axis=1)
        # group by node id (the pre-sorted key order), run-min, unsort
        sv = jnp.take_along_axis(vals, spos, axis=1)
        sv = _seg_run_min(skeys, sv)
        back = jnp.zeros_like(vals).at[
            jnp.arange(b)[:, None], spos
        ].set(sv)
        ra2 = jnp.minimum(ra, back[:, :e])
        rb2 = jnp.minimum(rb, back[:, e:])
        changed = jnp.any((ra2 != ra) | (rb2 != rb))
        return ra2, rb2, changed

    init = body((ea, eb, jnp.bool_(True)))
    ra, rb, _ = jax.lax.while_loop(lambda s: s[2], body, init)

    # write rooted labels back onto the boundary rows
    rooted_above = jnp.where(valid, ra, above)
    rooted_below = jnp.where(valid, rb, below)
    lab_r = lab_r.at[:, :-1, -1].set(rooted_above.reshape(b, r - 1, w))
    lab_r = lab_r.at[:, 1:, 0].set(rooted_below.reshape(b, r - 1, w))
    return lab_r.reshape(b, hp, w)


# Scoped-VMEM budget per band: the unrolled Hillis-Steele doubling steps
# keep ~40 int32 planes live (measured: 25.2M scoped for a 164k-element
# band), so cap bands at ~90k elements to stay under the 16M limit.
# largest PADDED band the 16 MB scoped-VMEM budget provably holds:
# 40 x 1920 (the measured 1080p configuration; the band kernel costs
# ~188 B/padded px, so 76,800 px ~ 14.4 MB).  The old 90k UNPADDED
# budget let 372-wide screens pick 240-row bands (92,160 padded px =
# 17.36 MB) that the compile helper rejects.
_BAND_ELEMS = 76_800


def default_band_rows(w: int) -> int:
    wp = -(-w // 128) * 128
    return max(8, (_BAND_ELEMS // wp) // 8 * 8)


@functools.partial(jax.jit, static_argnames=("band_rows",))
def label_components_banded(
    images: jax.Array, band_rows: int | None = None
) -> jax.Array:
    """[B, H, W] -> [B, H, W] int32 labels for frames too tall for the
    whole-plane VMEM kernel (>VGA screens).

    Row-banded: each band is labeled in VMEM with global flat indices
    (grid (B, R)), then a union-find over the band-boundary adjacencies
    relabels cross-band components to their global minimum — bit-exact
    vs :func:`label_components_batch` (cte.hpp:60-79 semantics at any
    frame size)."""
    b, h, w = images.shape
    bh = band_rows if band_rows is not None else default_band_rows(w)
    r = -(-h // bh)
    pad = r * bh - h
    i32 = images.astype(jnp.int32)
    if pad:
        # padding rows sit below the bottom horizon: non-interior by the
        # global geometry, labeled sentinel, never merged
        i32 = jnp.concatenate(
            [i32, jnp.full((b, pad, w), -3, jnp.int32)], axis=1
        )
    spec = pl.BlockSpec((1, 1, bh, w), lambda i, k: (i, k, 0, 0),
                        memory_space=pltpu.VMEM)
    lab = pl.pallas_call(
        _make_band_kernel(h, bh),
        grid=(b, r),
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, r, bh, w), jnp.int32),
    )(i32.reshape(b, r, bh, w)).reshape(b, r * bh, w)
    if r == 1:
        return lab[:, :h]
    seeded = _merge_band_labels(lab, i32, bh, h)
    out = pl.pallas_call(
        _make_band_relax_kernel(h, bh),
        grid=(b, r),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, r, bh, w), jnp.int32),
    )(i32.reshape(b, r, bh, w),
      seeded.reshape(b, r, bh, w)).reshape(b, r * bh, w)
    return out[:, :h]


# scoped-VMEM calibration (both caps): the whole-plane kernels hold
# the label fixpoint's temporaries in VMEM, measured at 272x372
# (104,448 padded px) against the 16 MB scoped limit —
#   labels-only: 17.39 MB (~166 B/padded px) -> admits ~96k
#   with stats:  18.88 MB (~181 B/padded px) -> admits ~88.5k
# capped with the house 10% headroom.  Screens beyond take the
# row-banded labeler (any size) + fde._masks_from_labels_sorted.
# (The old 250k/140k caps were never compile-tested near their
# limits; the compile helper rejects both at 272x372.)
_CC_CAP = 86_000
_CC_STATS_CAP = 79_000


def _padded(h: int, w: int) -> int:
    return h * (-(-w // 128) * 128)


def supports(h: int, w: int) -> bool:
    return _padded(h, w) <= _CC_CAP


def supports_stats(h: int, w: int) -> bool:
    return _padded(h, w) <= _CC_STATS_CAP


@jax.jit
def label_stats_batch(images: jax.Array, changed: jax.Array):
    """[B, H, W] medians + [B, H, W] changed -> (labels, stats).

    labels as in ``label_components_batch``; stats [B, 5, H, W] int32 =
    per-pixel component (minx, miny, maxx, maxy, has_changed) — garbage
    on the border (no component)."""
    b, h, w = images.shape
    i32 = images.astype(jnp.int32)
    c32 = changed.astype(jnp.int32)

    block = lambda *shape: pl.BlockSpec(
        shape, lambda i: (i,) + (0,) * (len(shape) - 1),
        memory_space=pltpu.VMEM,
    )
    labels, mins = pl.pallas_call(
        _cc_mins_kernel,
        grid=(b,),
        in_specs=[block(1, h, w)],
        out_specs=(block(1, h, w), block(1, 2, h, w)),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, w), jnp.int32),
            jax.ShapeDtypeStruct((b, 2, h, w), jnp.int32),
        ),
    )(i32)
    maxs = pl.pallas_call(
        _cc_maxs_kernel,
        grid=(b,),
        in_specs=[block(1, h, w), block(1, h, w)],
        out_specs=block(1, 3, h, w),
        out_shape=jax.ShapeDtypeStruct((b, 3, h, w), jnp.int32),
    )(i32, c32)
    stats = jnp.concatenate(
        [mins[:, :1], mins[:, 1:2], maxs[:, :1], maxs[:, 1:2], maxs[:, 2:]],
        axis=1,
    )
    return labels, stats
