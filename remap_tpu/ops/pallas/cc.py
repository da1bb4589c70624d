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


def _cc_kernel(img_ref, lab_ref):
    img = img_ref[0]
    h, w = img.shape
    big = h * w

    yi = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xi = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    interior = (yi > 0) & (yi < h - 1) & (xi > 0) & (xi < w - 1)

    im = jnp.where(interior, img, -1)
    lab0 = jnp.where(interior, yi * w + xi, big)

    def shift_fwd(a, s, axis, fill):
        """out[i] = a[i - s] along axis (fill for i < s)."""
        r = jnp.roll(a, s, axis)
        idx = yi if axis == 0 else xi
        return jnp.where(idx >= s, r, fill)

    def shift_bwd(a, s, axis, fill):
        """out[i] = a[i + s] along axis (fill for i >= len - s)."""
        r = jnp.roll(a, -s, axis)
        idx = yi if axis == 0 else xi
        n = h if axis == 0 else w
        return jnp.where(idx < n - s, r, fill)

    # run-start / run-end flags per axis (value changes delimit runs);
    # flags ride as int32 0/1 planes — Mosaic dislikes rolled i1 vectors
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

    def seg_min(l, axis, start, end):
        """Min label over each pixel's maximal equal-valued run."""
        n = w if axis == 1 else h
        # forward segmented inclusive min-scan
        vf, ff = l, start
        s = 1
        while s < n:
            vs = shift_fwd(vf, s, axis, big)
            fs = shift_fwd(ff, s, axis, one)
            vf = jnp.where(ff != 0, vf, jnp.minimum(vf, vs))
            ff = jnp.maximum(ff, fs)
            s *= 2
        # backward segmented inclusive min-scan
        vb, fb = l, end
        s = 1
        while s < n:
            vs = shift_bwd(vb, s, axis, big)
            fs = shift_bwd(fb, s, axis, one)
            vb = jnp.where(fb != 0, vb, jnp.minimum(vb, vs))
            fb = jnp.maximum(fb, fs)
            s *= 2
        return jnp.minimum(vf, vb)

    def body(state):
        l, _ = state
        l1 = seg_min(l, 1, rs_start, rs_end)
        l2 = seg_min(l1, 0, cs_start, cs_end)
        return l2, jnp.any(l2 != l)

    first = body((lab0, jnp.bool_(True)))
    lab, _ = jax.lax.while_loop(lambda s: s[1], body, first)
    lab_ref[0] = jnp.where(interior, lab, big)


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


# VMEM working set: ~8 int32 planes + scan temporaries
_CC_CAP = 250_000


def supports(h: int, w: int) -> bool:
    return h * w <= _CC_CAP
