"""Fragment-to-fragment cellular matching on device (kpm.hpp:371-393).

Splicing matches whole-fragment keypoint tables (the 1x1 grid of
fgs.hpp:17): votes are bucketed per offset AND per spatial cell
(kpm.hpp:225-264); the best offset maximises matched keypoints (ties ->
smallest encoded offset, canonical); validation requires its
distinct-cell count to reach ``ratio x`` the active cells of the overlap
(kpm.hpp:317-367, 384-390).

Device formulation: the sort-merge code join (ops.kpm._join_pairs) yields
candidate pairs; a two-key sort by (offset, cell) gives per-offset
keypoint counts and distinct-cell counts in one pass; the active-cell
count is a bounded gather of the current table against the previous
fragment's mask.  Fragment canvases vary, so masks are zero-padded to
static buckets with true dimensions passed as scalars (offset encoding
uses the bucket dims, which bound the true ones).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from remap_tpu.ops.kpm import _join_dense, _join_slots_scan


class CellMatch(NamedTuple):
    offset: jax.Array    # [2] int32 (dx, dy)
    count: jax.Array     # [] int32 matched keypoints of the best offset
    ok: jax.Array        # [] bool
    overflow: jax.Array  # [] bool
    #: [] int32 — smallest multiplicity that enumerates every pair; on
    #: overflow, retry ONCE at this value instead of walking the ladder
    #: to the dense endpoint (quadratic in capacity — an OOM cliff on
    #: session-scale canvases whose true code repetition is tiny)
    needed_multiplicity: jax.Array


@functools.partial(
    jax.jit, static_argnames=("cell_w", "cell_h", "ratio", "multiplicity")
)
def match_fragments(
    p_codes, p_pos, p_valid,      # [K,4] u32, [K,2] i32, [K] bool
    c_codes, c_pos, c_valid,
    p_mask,                        # [HB, WB] uint8 (zero-padded bucket)
    p_dims,                        # [2] int32 (w, h) true prev dims
    c_dims,                        # [2] int32 true curr dims
    cell_w: int = 15,
    cell_h: int = 15,
    ratio: float = 0.66,
    multiplicity: int = 8,
) -> CellMatch:
    hb, wb = p_mask.shape

    if multiplicity == 0:  # exhaustive dense join
        dx, dy, pair, n_missed, _rm, scx, scy, needed_m = _join_dense(
            p_codes, p_pos, p_valid, c_codes, c_pos, c_valid
        )
    else:
        # slots-scan: same enumeration rule as the streaming join, but
        # the program size is multiplicity-invariant — session-scale
        # splice walks a multiplicity ladder and each _join_rolled level
        # paid a ~110 s remote XLA compile (benchmarks/fgs_match_probe.py)
        dx, dy, pair, n_missed, _rm, scx, scy, needed_m = _join_slots_scan(
            p_codes, p_pos, p_valid, c_codes, c_pos, c_valid,
            multiplicity,
            coord_limit=max(8192, 1 << (max(hb, wb) - 1).bit_length()),
        )
    # the cellular vote has no per-offset margin to bound against, so any
    # truncated pair keeps the conservative escalate-on-truncation rule
    overflow = n_missed > 0

    o_sent = jnp.int32(4 * wb * hb)
    okey = jnp.where(pair, (dx + wb) * (2 * hb) + (dy + hb), o_sent)
    # cell of a pair: (min(px,cx)//cw, min(py,cy)//ch) (kpm.hpp:225-247);
    # px = cx + dx, py = cy + dy.  Joins return slot-major [S, N]: curr
    # coordinates broadcast along axis 0.
    cellx = jnp.minimum(scx[None, :] + dx, scx[None, :]) // cell_w
    celly = jnp.minimum(scy[None, :] + dy, scy[None, :]) // cell_h
    ckey = cellx * (hb // cell_h + 2) + celly

    so, sc = jax.lax.sort(
        (okey.reshape(-1), ckey.reshape(-1)), num_keys=2
    )
    n = so.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    o_start = jnp.concatenate([jnp.ones((1,), bool), so[1:] != so[:-1]])
    oc_start = o_start | jnp.concatenate(
        [jnp.ones((1,), bool), sc[1:] != sc[:-1]]
    )
    start_pos = jnp.where(o_start, iota, n)
    suffix_min = jnp.flip(jax.lax.cummin(jnp.flip(start_pos)))
    next_o = jnp.concatenate([suffix_min[1:], jnp.full((1,), n, jnp.int32)])
    # keypoints per offset-run; distinct cells per offset-run
    kp_count = jnp.where(o_start & (so < o_sent), next_o - iota, 0)
    cum_cells = jnp.cumsum(oc_start)          # inclusive count of cell-runs
    cells_before = cum_cells - oc_start       # exclusive
    cell_count = cum_cells[jnp.clip(next_o - 1, 0, n - 1)] - cells_before
    cell_count = jnp.where(o_start & (so < o_sent), cell_count, 0)

    best_i = jnp.argmax(kp_count)        # ties -> smallest offset key
    best_key = so[best_i]
    best_kp = kp_count[best_i]
    best_cells = cell_count[best_i]
    bdx = best_key // (2 * hb) - wb
    bdy = best_key % (2 * hb) - hb

    # ---- active cells of the overlap (kpm.hpp:317-367) ----------------
    pw, ph = p_dims[0], p_dims[1]
    cw_, ch_ = c_dims[0], c_dims[1]

    def span(delta, prev_len, curr_len):
        lo = jnp.maximum(-delta, 0)
        hi = jnp.where(
            delta < 0,
            jnp.minimum(curr_len, prev_len + (-delta)),
            jnp.minimum(curr_len, prev_len - delta),
        )
        return lo, hi

    cxl, cxh = span(bdx, pw, cw_)
    cyl, cyh = span(bdy, ph, ch_)

    x = c_pos[:, 0]
    y = c_pos[:, 1]
    inside = c_valid & (x >= cxl) & (x < cxh) & (y >= cyl) & (y < cyh)
    bx = jnp.clip(x + bdx, 0, wb - 1)
    by = jnp.clip(y + bdy, 0, hb - 1)
    on_prev = p_mask[by, bx] != 0
    sel = inside & on_prev
    acell = jnp.where(
        sel,
        ((x - cxl) // cell_w) * (hb // cell_h + 2) + (y - cyl) // cell_h,
        jnp.int32(1 << 30),
    )
    sa = jax.lax.sort(acell)
    a_start = jnp.concatenate([jnp.ones((1,), bool), sa[1:] != sa[:-1]])
    active = jnp.sum(a_start & (sa < (1 << 30)))

    ok = (best_kp > 0) & (
        best_cells.astype(jnp.float32)
        >= active.astype(jnp.float32) * jnp.float32(ratio)
    )
    return CellMatch(
        offset=jnp.stack([bdx, bdy]),
        count=best_kp,
        ok=ok,
        overflow=overflow,
        needed_multiplicity=needed_m,
    )
