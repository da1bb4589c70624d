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


def _hash_codes(codes):
    """64-bit mix of the 4 code words as two uint32 sort keys.

    Equal codes always hash equal; the (vanishingly rare) collisions only
    group *different* codes into one run, and pairs are verified exactly
    before voting, so results stay exact.
    """
    c = codes.astype(jnp.uint32)
    h1 = c[..., 0] * jnp.uint32(0x9E3779B1)
    h1 = (h1 ^ (h1 >> 15)) * jnp.uint32(0x85EBCA77) + c[..., 1]
    h1 = (h1 ^ (h1 >> 13)) * jnp.uint32(0xC2B2AE3D) + c[..., 2]
    h1 = h1 ^ (h1 >> 16)
    h2 = c[..., 3] * jnp.uint32(0x27D4EB2F) + (c[..., 0] ^ (c[..., 1] << 16))
    h2 = (h2 ^ (h2 >> 15)) * jnp.uint32(0x165667B1) + c[..., 2]
    h2 = h2 ^ (h2 >> 13)
    return h1, h2


def _join_pairs(
    p_codes, p_pos, p_valid,      # [K,4] u32, [K,2] i32, [K] bool
    c_codes, c_pos, c_sel,
    multiplicity: int,
):
    """Enumerate all equal-code (prev, curr) pairs' (dx, dy).

    Sort-merge join on 64-bit code hashes: the 2K combined entries sort by
    (hash1, hash2, origin); within a hash run, prev entries precede curr,
    so each curr entry's candidate partners are the run's prefix.  Each
    candidate pair is then verified for *exact* 4-word code equality, so
    hash collisions cannot corrupt votes.  Exact as long as no hash
    repeats more than ``multiplicity`` times among prev entries (flagged
    via the last return; collisions only make this more conservative).

    Returns (prev_row [2K, M], curr_row [2K], pair_valid [2K, M],
    overflow []): table-row indices of each candidate pair.
    """
    k = p_codes.shape[0]
    m = multiplicity
    n = 2 * k

    codes = jnp.concatenate([p_codes, c_codes])          # [2K, 4]
    validc = jnp.concatenate([p_valid, c_sel])
    h1, h2 = _hash_codes(codes)
    sent = jnp.uint32(0xFFFFFFFF)
    h1 = jnp.where(validc, h1, sent)
    h2 = jnp.where(validc, h2, sent)
    # origin in the high bit, row in the low bits: prev (0) sorts first
    tag = jnp.concatenate(
        [
            jnp.arange(k, dtype=jnp.uint32),
            jnp.arange(k, dtype=jnp.uint32) | jnp.uint32(1 << 31),
        ]
    )

    sh1, sh2, stag = jax.lax.sort((h1, h2, tag), num_keys=3)
    srow = (stag & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
    is_curr_row = (stag >> 31) == 1

    iota = jnp.arange(n, dtype=jnp.int32)
    neq = (sh1[1:] != sh1[:-1]) | (sh2[1:] != sh2[:-1])
    is_start = jnp.concatenate([jnp.ones((1,), bool), neq])
    run_start = jax.lax.cummax(jnp.where(is_start, iota, 0))

    not_sent = ~((sh1 == sent) & (sh2 == sent))
    is_prev = (~is_curr_row) & not_sent
    pcum_ex = jnp.cumsum(is_prev) - is_prev              # exclusive prefix
    n_prev = pcum_ex - pcum_ex[run_start]                # valid for curr rows

    is_curr = is_curr_row & not_sent
    overflow = jnp.any(is_curr & (n_prev > m))

    cand = jnp.clip(run_start[:, None] + jnp.arange(m)[None, :], 0, n - 1)
    prev_row = srow[cand]                                # [2K, M]
    pair_valid = is_curr[:, None] & (
        jnp.arange(m)[None, :] < jnp.minimum(n_prev, m)[:, None]
    )
    # exact verification: drop hash-collision pairs
    same = jnp.all(
        p_codes[prev_row] == c_codes[srow][:, None, :], axis=-1
    )
    pair_valid &= same

    return prev_row, srow, pair_valid, overflow


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

    prev_row, curr_row, pair, overflow = _join_pairs(
        p_codes, p_pos, p_valid, c_codes, c_pos, c_sel, multiplicity
    )
    dx = p_pos[prev_row, 0] - c_pos[curr_row, 0][:, None]
    dy = p_pos[prev_row, 1] - c_pos[curr_row, 1][:, None]
    keys = jnp.where(
        pair, _encode_offset(dx, dy, w, h), jnp.int32(sentinel)
    ).reshape(-1)

    skeys = jax.lax.sort(keys)
    _, counts = _run_counts(skeys, sentinel)

    # top-k by iterated argmax (k passes beat a sort-based top_k for k=3;
    # argmax ties pick the first position = smallest key, the canonical
    # tie-break)
    def pick(cnts, _):
        i = jnp.argmax(cnts)
        return cnts.at[i].set(-1), (skeys[i], cnts[i])

    _, (top_keys, top_counts) = jax.lax.scan(
        pick, counts, None, length=region_votes
    )
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
