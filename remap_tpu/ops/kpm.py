"""Batched frame-to-frame keypoint matching (device form of kpm.hpp).

The reference's per-region hash joins and vote maps (kpm.hpp:85-223) become
dense, sort-based primitives with static shapes:

- code join: a [K, K] all-words-equal comparison between the two regions'
  fixed-capacity tables (codes include the weight nibble, so the adaptive
  weight filter reduces to masking *current* entries, kpm.hpp:105-125),
- vote counting: encode each pair's offset as an int32 key, sort the K*K
  keys, and derive per-run counts from run boundaries (replacing the
  offset hash map, kpm.hpp:92-125),
- top-3 per region via top_k (count desc, ties -> smallest key — the
  reference's tie order is unspecified hash order; this is the canonical
  deterministic choice),
- Borda count + winner declaration across regions (kpm.hpp:172-211).

The whole matcher vmaps over (pair, region): matching frame t against
frame t-1 needs only the two tables, so a clip's every consecutive pair is
matched in one dispatch — the reference's serial loop (frc.hpp:97-122) is
parallel in disguise.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from remap_tpu.config import PipelineConfig
from remap_tpu.core.regions import GridLayout
from remap_tpu.ops.tables import RegionTables


class MatchResult(NamedTuple):
    offset: jax.Array    # [P, 2] int32 (dx, dy)
    ok: jax.Array        # [P] bool
    overflow: jax.Array  # [P] bool — join multiplicity exceeded somewhere


def _run_counts(sorted_keys: jax.Array, sentinel: int):
    """Per-position run info of an ascending int32 array.

    Returns (is_start, counts) where counts[i] = run length for positions
    that start a non-sentinel run, else 0.
    """
    n = sorted_keys.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_keys[1:] != sorted_keys[:-1]]
    )
    start_pos = jnp.where(is_start, iota, n)
    # next run start strictly after i
    suffix_min = jnp.flip(jax.lax.cummin(jnp.flip(start_pos)))
    next_start = jnp.concatenate(
        [suffix_min[1:], jnp.full((1,), n, jnp.int32)]
    )
    counts = jnp.where(
        is_start & (sorted_keys < sentinel), next_start - iota, 0
    )
    return is_start, counts


def _encode_offset(dx: jax.Array, dy: jax.Array, w: int, h: int) -> jax.Array:
    return (dx + w) * (2 * h) + (dy + h)


def _decode_offset(key: jax.Array, w: int, h: int):
    return key // (2 * h) - w, key % (2 * h) - h


def _join_offsets(
    p_codes, p_pos, p_valid,      # [K,4] u32, [K,2] i32, [K] bool
    c_codes, c_pos, c_sel,
    multiplicity: int,
):
    """Enumerate all equal-code (prev, curr) pairs' (dx, dy).

    Sort-merge join: the 2K combined codes are sorted lexicographically
    (invalid entries get an impossible sentinel code — word3 of a real code
    is < 2^8); within an equal-code run, prev entries sort before curr via
    an origin key, so each curr entry's partners are the contiguous run
    prefix.  Exact as long as no code repeats more than ``multiplicity``
    times in the prev region (flagged via the third return).

    Returns (dx, dy, pair_valid) of shape [2K, M] and overflow [] bool.
    """
    k = p_codes.shape[0]
    m = multiplicity
    n = 2 * k

    codes = jnp.concatenate([p_codes, c_codes])          # [2K, 4]
    validc = jnp.concatenate([p_valid, c_sel])
    sent = jnp.uint32(0xFFFFFFFF)
    words = [jnp.where(validc, codes[:, i], sent) for i in range(4)]
    origin = jnp.concatenate(
        [jnp.zeros((k,), jnp.int32), jnp.ones((k,), jnp.int32)]
    )
    row = jnp.concatenate([jnp.arange(k, dtype=jnp.int32)] * 2)

    sw0, sw1, sw2, sw3, sorg, srow = jax.lax.sort(
        (words[0], words[1], words[2], words[3], origin, row), num_keys=5
    )
    iota = jnp.arange(n, dtype=jnp.int32)
    neq = (
        (sw0[1:] != sw0[:-1])
        | (sw1[1:] != sw1[:-1])
        | (sw2[1:] != sw2[:-1])
        | (sw3[1:] != sw3[:-1])
    )
    is_start = jnp.concatenate([jnp.ones((1,), bool), neq])
    run_start = jax.lax.cummax(jnp.where(is_start, iota, 0))

    not_sent = sw3 != sent
    is_prev = (sorg == 0) & not_sent
    pcum_ex = jnp.cumsum(is_prev) - is_prev              # exclusive prefix
    n_prev = pcum_ex - pcum_ex[run_start]                # valid for curr rows

    is_curr = (sorg == 1) & not_sent
    overflow = jnp.any(is_curr & (n_prev > m))

    cand = jnp.clip(run_start[:, None] + jnp.arange(m)[None, :], 0, n - 1)
    prev_row = srow[cand]                                # [2K, M]
    pair_valid = is_curr[:, None] & (
        jnp.arange(m)[None, :] < jnp.minimum(n_prev, m)[:, None]
    )

    dx = p_pos[prev_row, 0] - c_pos[srow, 0][:, None]
    dy = p_pos[prev_row, 1] - c_pos[srow, 1][:, None]
    return dx, dy, pair_valid, overflow


def _region_votes(
    p_codes, p_pos, p_valid,      # [K,4] u32, [K,2] i32, [K] bool
    c_codes, c_pos, c_valid,
    use_all_weights,              # [] bool
    w: int,
    h: int,
    region_votes: int,
    multiplicity: int,
):
    """Top-`region_votes` offsets of one region pair: (keys, counts,
    overflow)."""
    sentinel = 4 * w * h

    c_weight = (c_codes[:, 3] >> 4) & 0xF
    c_sel = c_valid & (use_all_weights | (c_weight == 2))  # kpm.hpp:113-116

    dx, dy, pair, overflow = _join_offsets(
        p_codes, p_pos, p_valid, c_codes, c_pos, c_sel, multiplicity
    )
    keys = jnp.where(
        pair, _encode_offset(dx, dy, w, h), jnp.int32(sentinel)
    ).reshape(-1)

    skeys = jax.lax.sort(keys)
    _, counts = _run_counts(skeys, sentinel)
    top_counts, top_idx = jax.lax.top_k(counts, region_votes)
    top_keys = skeys[top_idx]
    return top_keys, top_counts, overflow


def _borda_declare(
    keys,          # [R, V] int32 (region-major)
    counts,        # [R, V] int32
    active,        # [] int32
    w: int,
    h: int,
    region_count: int,
    region_votes: int,
    min_active_divisor: int,
    runner_up_divisor: int,
):
    sentinel = 4 * w * h
    # Borda points: rank r in a region's ticket earns region_votes - r
    # (kpm.hpp:176-182); empty slots (count 0) earn nothing.
    points = jnp.arange(region_votes, 0, -1, dtype=jnp.int32)[None, :]
    points = jnp.where(counts > 0, points, 0).reshape(-1)
    flat_keys = jnp.where(
        counts.reshape(-1) > 0, keys.reshape(-1), jnp.int32(sentinel)
    )

    skeys, spoints = jax.lax.sort((flat_keys, points), num_keys=1)
    n = skeys.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    is_start = jnp.concatenate([jnp.ones((1,), bool), skeys[1:] != skeys[:-1]])
    start_pos = jnp.where(is_start, iota, n)
    suffix_min = jnp.flip(jax.lax.cummin(jnp.flip(start_pos)))
    next_start = jnp.concatenate([suffix_min[1:], jnp.full((1,), n, jnp.int32)])
    cp = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(spoints)])
    run_total = cp[next_start] - cp[iota]
    score = jnp.where(is_start & (skeys < sentinel), run_total, 0)

    top2, _ = jax.lax.top_k(score, 2)
    # winner key: first start with the max score (ties -> smallest key)
    win_pos = jnp.argmax(score)
    win_key = skeys[win_pos]
    dx, dy = _decode_offset(win_key, w, h)

    s1, s2 = top2[0], top2[1]
    ok = (active >= region_count // min_active_divisor) & (s1 > 0)
    # kpm.hpp:206-209: with a runner-up, the winner must lead by active/2.
    ok &= (s2 == 0) | (s1 >= s2 + active // runner_up_divisor)
    return jnp.stack([dx, dy]), ok


def match_tables(
    prev: RegionTables,
    curr: RegionTables,
    layout: GridLayout,
    weight_switch: int,
    region_votes: int = 3,
    min_active_divisor: int = 4,
    runner_up_divisor: int = 2,
    multiplicity: int = 8,
) -> MatchResult:
    """Match every (prev[i], curr[i]) pair of table batches: [P, R, ...]."""
    w, h = layout.width, layout.height

    # adaptive weight switch per region (kpm.hpp:219-222: < vs <=)
    use_all = (prev.wcounts[..., 2] < weight_switch) | (
        curr.wcounts[..., 2] <= weight_switch
    )  # [P, R]

    votes_fn = jax.vmap(  # over regions
        jax.vmap(  # over pairs
            functools.partial(
                _region_votes,
                w=w,
                h=h,
                region_votes=region_votes,
                multiplicity=multiplicity,
            ),
            in_axes=0,
        ),
        in_axes=1,
        out_axes=1,
    )
    keys, counts, join_ovf = votes_fn(
        prev.codes, prev.pos, prev.valid,
        curr.codes, curr.pos, curr.valid,
        use_all,
    )  # [P, R, V], [P, R, V], [P, R]

    active = (curr.wcounts.sum(axis=-1) > 0).sum(axis=-1).astype(jnp.int32)

    declare_fn = jax.vmap(
        functools.partial(
            _borda_declare,
            w=w,
            h=h,
            region_count=layout.region_count,
            region_votes=region_votes,
            min_active_divisor=min_active_divisor,
            runner_up_divisor=runner_up_divisor,
        )
    )
    offset, ok = declare_fn(keys, counts, active)
    return MatchResult(offset=offset, ok=ok, overflow=join_ovf.any(axis=1))


@functools.partial(
    jax.jit,
    static_argnames=(
        "layout",
        "weight_switch",
        "region_votes",
        "min_active_divisor",
        "runner_up_divisor",
        "multiplicity",
    ),
)
def match_tables_jit(
    prev: RegionTables,
    curr: RegionTables,
    layout: GridLayout,
    weight_switch: int,
    region_votes: int = 3,
    min_active_divisor: int = 4,
    runner_up_divisor: int = 2,
    multiplicity: int = 8,
) -> MatchResult:
    return match_tables(
        prev, curr, layout, weight_switch, region_votes,
        min_active_divisor, runner_up_divisor, multiplicity,
    )
