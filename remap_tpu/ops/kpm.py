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


def _join_rolled(
    p_codes, p_pos, p_valid,      # [K,4] u32, [K,2] i32, [K] bool
    c_codes, c_pos, c_sel,
    multiplicity: int,
    max_run: int,
):
    """Enumerate equal-code (prev, curr) pair offsets, gather-free.

    Sort-merge join on 64-bit code hashes with every per-entry attribute
    (positions + the 4 code words) riding the sort as payload operands.
    Within a hash run, prev entries precede curr (origin bit in the tag
    key), so a curr entry's partners sit at small *backward distances* —
    enumerated with ``max_run`` fixed rolls and masks instead of gathers
    (TPU gathers are ~15ns/element on this target; rolls are bandwidth).
    Code equality is verified exactly via rolled comparison, so hash
    collisions cannot corrupt votes.

    Exact as long as each curr entry's backward distance to its run start
    is <= max_run and no code repeats more than ``multiplicity`` times in
    prev — both flagged in ``overflow`` (callers re-run a bigger config).

    Returns (dx [2K, S], dy [2K, S], pair_valid [2K, S], overflow []).
    """
    k = p_codes.shape[0]
    n = 2 * k
    m = multiplicity

    codes = jnp.concatenate([p_codes, c_codes])          # [2K, 4]
    validc = jnp.concatenate([p_valid, c_sel])
    h1, h2 = _hash_codes(codes)
    sent = jnp.uint32(0xFFFFFFFF)
    h1 = jnp.where(validc, h1, sent)
    h2 = jnp.where(validc, h2, sent)
    tag = jnp.concatenate(
        [
            jnp.zeros((k,), jnp.uint32),
            jnp.full((k,), 1 << 31, jnp.uint32),
        ]
    )
    px = jnp.concatenate([p_pos[:, 0], c_pos[:, 0]])
    py = jnp.concatenate([p_pos[:, 1], c_pos[:, 1]])

    sh1, sh2, stag, spx, spy, c0, c1, c2, c3 = jax.lax.sort(
        (h1, h2, tag, px, py,
         codes[:, 0], codes[:, 1], codes[:, 2], codes[:, 3]),
        num_keys=3,
    )
    is_curr_row = (stag >> 31) == 1
    not_sent = ~((sh1 == sent) & (sh2 == sent))
    is_prev = (~is_curr_row) & not_sent
    is_curr = is_curr_row & not_sent

    iota = jnp.arange(n, dtype=jnp.int32)
    neq = (sh1[1:] != sh1[:-1]) | (sh2[1:] != sh2[:-1])
    is_start = jnp.concatenate([jnp.ones((1,), bool), neq])
    rid = jnp.cumsum(is_start)
    run_start = jax.lax.cummax(jnp.where(is_start, iota, 0))
    d = iota - run_start                                  # distance to start

    # prev count of the run, gather-free: carry pcum_ex at run starts
    pcum_ex = jnp.cumsum(is_prev) - is_prev
    start_val = jax.lax.cummax(jnp.where(is_start, pcum_ex, -1))
    n_prev = pcum_ex - start_val                          # for curr rows

    overflow = jnp.any(is_curr & (n_prev > 0) & (d > max_run))
    overflow |= jnp.any(is_curr & (n_prev > m))

    def shifted(a, s):
        return jnp.concatenate([a[:1].repeat(s), a[:-s]]) if s else a

    dxs, dys, valids = [], [], []
    for s in range(1, max_run + 1):
        same_run = rid == shifted(rid, s)
        partner_prev = shifted(is_prev, s)
        # partner rank within run = d - s; enforce rank < multiplicity
        ok = (
            is_curr
            & partner_prev
            & same_run
            & (d - s < m)
            & (s <= d)
        )
        same_code = (
            (shifted(c0, s) == c0)
            & (shifted(c1, s) == c1)
            & (shifted(c2, s) == c2)
            & (shifted(c3, s) == c3)
        )
        ok &= same_code
        dxs.append(shifted(spx, s) - spx)
        dys.append(shifted(spy, s) - spy)
        valids.append(ok)

    dx = jnp.stack(dxs, axis=1)
    dy = jnp.stack(dys, axis=1)
    pair = jnp.stack(valids, axis=1)
    # spx/spy are each sorted row's own (curr-side) coordinates; a pair's
    # prev-side coordinate is spx + dx (used by the cellular matcher).
    return dx, dy, pair, overflow, spx, spy


def _join_dense(
    p_codes, p_pos, p_valid,      # [K,4] u32, [K,2] i32, [K] bool
    c_codes, c_pos, c_sel,
):
    """Exhaustive [K, K] pair enumeration — no multiplicity limit.

    The escalation endpoint for pathological inputs (heavily repeated
    codes): quadratic in table capacity but enumerates *every* equal-code
    pair, so there is no overflow condition.  Selected via
    ``multiplicity=0``."""
    eq = jnp.all(p_codes[:, None, :] == c_codes[None, :, :], axis=-1)
    pair = eq & p_valid[:, None] & c_sel[None, :]
    dx = p_pos[:, None, 0] - c_pos[None, :, 0]
    dy = p_pos[:, None, 1] - c_pos[None, :, 1]
    # transpose to [curr, prev] so the row axis matches the rolled join's
    # curr-major convention (irrelevant to vote counting)
    return (
        dx.T, dy.T, pair.T, jnp.zeros((), bool),
        c_pos[:, 0], c_pos[:, 1],
    )


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

    if multiplicity == 0:  # exhaustive dense join (no limits)
        dx, dy, pair, overflow = _join_dense(
            p_codes, p_pos, p_valid, c_codes, c_pos, c_sel
        )[:4]
    else:
        dx, dy, pair, overflow = _join_rolled(
            p_codes, p_pos, p_valid, c_codes, c_pos, c_sel,
            multiplicity, max_run=2 * multiplicity,
        )[:4]
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
