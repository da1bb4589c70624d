"""Pallas TPU kernel: gather-free region-table compaction (kpr.hpp's
select+compact in VMEM).

The region-table stage selects each grid region's keypoints in row-major
order into a fixed-capacity table (kpr.hpp:93-223 semantics, ops.tables).
Every prior device formulation moved the 4-word code payload with either
a gather (~9 ns/row of HBM-level scalar addressing — ~13 ms of the
18 ms stage at the NES flagship shape), a payload-carrying sort, or a
one-hot MXU matmul (both measured slower, BENCHMARKS.md "tables
history").  This kernel moves the payload with a **binary-distance shift
network** instead, entirely in VMEM:

- pad the region's width to a lane multiple ``wpad`` (power-of-two
  multiple of 128), so row-major *padded* flat order equals true
  row-major order and position recovery is bit arithmetic;
- each keypoint's compaction distance ``d = padded_pos - rank`` is
  non-decreasing in position order, so shifting elements whose bit ``k``
  of ``d`` is set left by ``2^k``, LSB to MSB, is collision-free (two
  colliding elements would need equal destinations) — a stable stream
  compaction in ``ceil(log2(rh*wpad))`` static steps of lane/sublane
  rolls + selects, **zero gathers**;
- the distance plane rides the network as payload and doubles as the
  position record: after the last step, slot ``i`` holds the element
  whose original padded position was ``i + d[i]``; stale copies left
  behind by movers are invalidated by writing a sentinel whose low bits
  are all zero (they can never move again, and the ``slot < total``
  validity mask ignores them).

Output tables are **bit-identical to ops.tables mode="topk"/"sort"** on
valid rows (same row-major first-K selection) with sort2's invalid-row
canonicalization (code of the region's first pixel, position
``(x_lo, y_lo)``), and the overflow flag is the true condition
``count > capacity`` alone — no chunk-density quota, so escalation
semantics are strictly cleaner than the sort2 streaming default.

Frames batch along the grid; each grid step loads one frame's weight +
code planes into VMEM (~1.2 MB at NES size) and emits all R region
tables.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from remap_tpu.core.regions import GridLayout

#: sentinel distance for empty / consumed slots: low bits all zero, so
#: the move mask ``(d >> k) & 1`` never fires for any step ``k`` below
#: the bit position (region flat sizes stay far under 2**24)
_HUGE = 1 << 24

#: Scoped-VMEM model, calibrated against the compiler's own accounting:
#: the per-grid-step budget is the input/output blocks (5 frame planes +
#: the [5, R, cap] table block, all int32) plus the shift network's live
#: working planes over ONE region's (rh x wpad) slab.  Mosaic's
#: scheduling of the unrolled log2(n) shift loop keeps ~40 int32 planes
#: live at peak — measured: VGA 640x480 / 8 regions / cap 3072 was
#: rejected by the chip at 16.77 MB scoped (limit 16 MB), and this
#: model prices it at 16.4 MB; the NES flagship prices at ~6.6 MB and
#: runs.  The 15 MB threshold leaves calibration headroom; shapes over
#: it take the XLA sort2 path (ops.tables.build_tables fallback).
_LIVE_PLANES = 40
_SCOPED_LIMIT = 15 << 20


def _wpad_of(rw: int) -> int:
    w = 128
    while w < rw:
        w *= 2
    return w


def supports(layout: GridLayout, h: int, w: int, capacity: int) -> bool:
    """Static gate for the kernel path (structure + scoped-VMEM model)."""
    if capacity % 128 != 0:
        return False
    r = layout.grid_w * layout.grid_h
    work = 0
    for xs in range(layout.grid_w):
        for ys in range(layout.grid_h):
            x_lo, x_hi, y_lo, y_hi = layout.region_span(xs, ys)
            rh, rw = y_hi - y_lo, x_hi - x_lo
            wpad = _wpad_of(rw)
            if wpad > w:          # can't slice a wpad window from the frame
                return False
            if capacity > rh * wpad:
                return False
            work = max(work, rh * wpad)
    blocks = 4 * (5 * h * w + 5 * r * capacity)
    return blocks + 4 * _LIVE_PLANES * work <= _SCOPED_LIMIT


def _shifted(x, s, wpad, rows):
    """Element at padded-flat position ``p + s`` viewed from ``p``
    (row-major over [rows, wpad]); garbage beyond the end never moves
    (its dist is ``_HUGE``).  pltpu.roll takes non-negative (rightward)
    shifts, so a left-roll by ``s`` is a right-roll by ``size - s``."""
    if s % wpad == 0:
        return pltpu.roll(x, rows - s // wpad, axis=0)
    a = pltpu.roll(x, wpad - s, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, wpad), 1)
    return jnp.where(lane < wpad - s, a, pltpu.roll(a, rows - 1, axis=0))


def _inc_cumsum(x, size, axis):
    """Inclusive prefix sum via Hillis-Steele log-shifts (Mosaic has no
    cumsum lowering)."""
    pos = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    s = 1
    while s < size:
        x = x + jnp.where(pos >= s, pltpu.roll(x, s, axis=axis), 0)
        s *= 2
    return x


def _kernel(w_ref, c_ref, out_ref, *, spans, capacity, frame_w):
    kr = capacity // 128
    for r, (x_lo, x_hi, y_lo, y_hi) in enumerate(spans):
        rh, rw = y_hi - y_lo, x_hi - x_lo
        wpad = _wpad_of(rw)
        xa = min(x_lo, frame_w - wpad)   # static window start
        shift = x_lo - xa                # region x_lo at lane `shift`

        lane = jax.lax.broadcasted_iota(jnp.int32, (rh, wpad), 1)
        in_region = (lane >= shift) & (lane < shift + rw)
        wsl = w_ref[0, y_lo:y_hi, xa:xa + wpad]
        flags = (wsl > 0) & in_region

        f32 = flags.astype(jnp.int32)
        # exclusive rank in padded row-major order (== true row-major:
        # the padding holds no valid elements)
        lane_excl = _inc_cumsum(f32, wpad, 1) - f32
        rowsum = jnp.sum(f32, axis=1, keepdims=True)
        row_excl = _inc_cumsum(rowsum, rh, 0) - rowsum
        rank = row_excl + lane_excl
        row = jax.lax.broadcasted_iota(jnp.int32, (rh, wpad), 0)
        pos = row * wpad + lane
        d = jnp.where(flags, pos - rank, _HUGE)

        planes = [c_ref[0, w, y_lo:y_hi, xa:xa + wpad] for w in range(4)]

        n = rh * wpad
        k = 0
        while (1 << k) < n:
            s = 1 << k
            a_d = _shifted(d, s, wpad, rh)
            move_in = ((a_d >> k) & 1) == 1
            move_src = ((d >> k) & 1) == 1
            planes = [
                jnp.where(move_in, _shifted(p, s, wpad, rh), p)
                for p in planes
            ]
            # movers leave a consumed slot behind (sentinel: never
            # moves again); survivors keep their ORIGINAL distance —
            # bit k of it is spent exactly when the move happens
            d = jnp.where(move_in, a_d, jnp.where(move_src, _HUGE, d))
            k += 1

        # first `capacity` slots of the compacted planes -> the table.
        # wpad is a multiple of 128, so slot block b occupies flat row
        # (b*128)//wpad, lanes [(b*128) % wpad, ...+128): one static
        # [1, 128] slice per block.
        for blk in range(kr):
            rr = (blk * 128) // wpad
            cc = (blk * 128) % wpad
            dst = slice(blk * 128, (blk + 1) * 128)
            out_ref[0, 4, r:r + 1, dst] = d[rr:rr + 1, cc:cc + 128]
            for w in range(4):
                out_ref[0, w, r:r + 1, dst] = planes[w][
                    rr:rr + 1, cc:cc + 128
                ]


def _build_grid(layout: GridLayout):
    spans = []
    for xs in range(layout.grid_w):
        for ys in range(layout.grid_h):
            spans.append(layout.region_span(xs, ys))
    return tuple(spans)


@functools.partial(jax.jit, static_argnames=("layout", "capacity"))
def build_tables_pallas(weight, codes, layout: GridLayout, capacity: int):
    """RegionTables via the VMEM shift-network kernel.

    weight: [B, H, W] uint8; codes: [B, H, W, 4] uint32.
    Returns the same tuple layout as ops.tables.build_tables.
    """
    from remap_tpu.ops.tables import RegionTables

    b, h, w = weight.shape
    spans = _build_grid(layout)
    r = len(spans)

    w32 = weight.astype(jnp.int32)
    c32 = jax.lax.bitcast_convert_type(codes, jnp.int32)  # [B,H,W,4]
    c32 = jnp.transpose(c32, (0, 3, 1, 2))                # [B,4,H,W]

    out = pl.pallas_call(
        functools.partial(
            _kernel, spans=spans, capacity=capacity, frame_w=w
        ),
        out_shape=jax.ShapeDtypeStruct((b, 5, r, capacity), jnp.int32),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 5, r, capacity), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )(w32, c32)

    dist = out[:, 4]                                     # [B, R, K]
    slot = jnp.arange(capacity, dtype=jnp.int32)[None, None]

    # totals/wcounts/overflow from the weight plane (XLA, fused cheap)
    w1_list, w2_list, first_code, first_pos = [], [], [], []
    for (x_lo, x_hi, y_lo, y_hi) in spans:
        ws = weight[:, y_lo:y_hi, x_lo:x_hi]
        w1_list.append((ws == 1).sum(axis=(1, 2)).astype(jnp.int32))
        w2_list.append((ws == 2).sum(axis=(1, 2)).astype(jnp.int32))
        first_code.append(codes[:, y_lo, x_lo])          # [B, 4]
        first_pos.append(
            jnp.broadcast_to(
                jnp.array([x_lo, y_lo], jnp.int32), (b, 2)
            )
        )
    w1 = jnp.stack(w1_list, axis=1)                      # [B, R]
    w2 = jnp.stack(w2_list, axis=1)
    total = (w1 + w2)
    valid = slot < total[..., None]                      # [B, R, K]

    # positions from the distance plane: original padded flat position
    # = slot + d; padded width is a power of two per region, so the
    # row/lane split is bit arithmetic — but wpad differs per region,
    # so do it per region slice (R is small)
    xs_parts, ys_parts = [], []
    for ri, (x_lo, x_hi, y_lo, y_hi) in enumerate(spans):
        wpad = _wpad_of(x_hi - x_lo)
        xa = min(x_lo, w - wpad)
        shiftv = x_lo - xa
        p = slot[0] + dist[:, ri]                        # [B, K]
        xs_parts.append(xa + (p & (wpad - 1)))
        ys_parts.append(y_lo + (p >> int(np.log2(wpad))))
    xs = jnp.stack(xs_parts, axis=1)                     # [B, R, K]
    ys = jnp.stack(ys_parts, axis=1)

    fc = jnp.stack(first_code, axis=1)                   # [B, R, 4]
    fp = jnp.stack(first_pos, axis=1)                    # [B, R, 2]

    codes_out = jnp.transpose(out[:, :4], (0, 2, 3, 1)).astype(jnp.uint32)
    codes_out = jnp.where(valid[..., None], codes_out, fc[:, :, None, :])
    pos_out = jnp.stack([xs, ys], axis=-1)
    pos_out = jnp.where(valid[..., None], pos_out, fp[:, :, None, :])

    wcounts = jnp.stack([jnp.zeros_like(w1), w1, w2], axis=-1)
    overflow = total > capacity
    return RegionTables(
        codes=codes_out,
        pos=pos_out,
        valid=valid,
        wcounts=wcounts,
        overflow=overflow,
    )
