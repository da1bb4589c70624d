"""Foreground extraction device kernels (fde.hpp on TPU).

For each stored frame of a fragment, against the blended background:

1. equality mask at the frame's blit position (fde.hpp:19-55),
2. connected components of the *median* image (ops.cc); a component is
   foreground iff it contains a changed pixel (the predicate gates seeds
   only, cte.hpp:93-99) and its area is <= frame_area/5 (fde.hpp:94-100),
3. the foreground mask paints each kept component's exact pixels plus its
   bbox *excluding the last row/column* (fde.hpp:122-146 treats inclusive
   bounds as exclusive) — rasterized here with a 2D difference array +
   prefix sum, which lands exactly on the [top, bottom) x [left, right)
   quirk.

All steps are batched over frames with vmap.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from remap_tpu.ops import cc


def equality_mask(
    background: jax.Array,  # [HB, WB] uint8
    frame: jax.Array,       # [H, W] uint8
    pos: jax.Array,         # [2] int32 (x, y)
) -> jax.Array:
    h, w = frame.shape
    bg = jax.lax.dynamic_slice(background, (pos[1], pos[0]), (h, w))
    return bg == frame  # True where unchanged


def _seg_scan(vals, is_start, op):
    """Running ``op`` within label runs (segmented associative scan)."""
    def combine(a, b):
        av, ar = a
        bv, br = b
        return jnp.where(br, bv, op(av, bv)), ar | br

    out, _ = jax.lax.associative_scan(combine, (vals, is_start))
    return out


def foreground_mask(
    median: jax.Array,      # [H, W] uint8
    changed: jax.Array,     # [H, W] bool (equality mask inverted)
    area_limit: int,
) -> jax.Array:
    """[H, W] bool — the fde::mask foreground (True = masked out).

    Per-component stats (area, any-changed, bbox) come from ONE sort by
    label + segmented scans with a backward broadcast — sort-run math is
    far cheaper than per-component scatter segment ops on this target.
    """
    h, w = median.shape
    n = h * w
    big = n
    labels = cc.label_components(median)
    flat = labels.reshape(-1)

    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).reshape(-1)
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).reshape(-1)
    ch = changed.reshape(-1).astype(jnp.int32)
    iota = jnp.arange(n, dtype=jnp.int32)

    sl, sx, sy, sch, spos = jax.lax.sort(
        (flat, xs, ys, ch, iota), num_keys=1
    )
    is_start = jnp.concatenate([jnp.ones((1,), bool), sl[1:] != sl[:-1]])
    start_pos = jnp.where(is_start, iota, n)
    suffix_min = jnp.flip(jax.lax.cummin(jnp.flip(start_pos)))
    next_start = jnp.concatenate(
        [suffix_min[1:], jnp.full((1,), n, jnp.int32)]
    )
    run_start = jax.lax.cummax(jnp.where(is_start, iota, 0))
    area = next_start - run_start            # per-position, gather-free

    # forward running stats, then broadcast each run's final value back
    is_end = jnp.concatenate([is_start[1:], jnp.ones((1,), bool)])

    def run_stat(vals, op):
        fwd = _seg_scan(vals, is_start, op)
        return jnp.flip(
            _seg_scan(jnp.flip(fwd), jnp.flip(is_end), lambda a, b: a)
        )

    minx = run_stat(sx, jnp.minimum)
    maxx = run_stat(sx, jnp.maximum)
    miny = run_stat(sy, jnp.minimum)
    maxy = run_stat(sy, jnp.maximum)
    anych = run_stat(sch, jnp.maximum)

    kept = (sl < big) & (anych > 0) & (area <= area_limit)

    # exact pixels of kept components
    pix = jnp.zeros((n,), bool).at[spos].set(kept)

    # bbox fills [top, bottom) x [left, right) (the exclusive quirk,
    # fde.hpp:122-146): 2D difference array updated at kept run starts
    upd = jnp.where(kept & is_start, 1, 0)
    diff = jnp.zeros((h + 1, w + 1), jnp.int32)
    diff = diff.at[miny, minx].add(upd)
    diff = diff.at[miny, maxx].add(-upd)
    diff = diff.at[maxy, minx].add(-upd)
    diff = diff.at[maxy, maxx].add(upd)
    inside = jnp.cumsum(jnp.cumsum(diff, axis=0), axis=1)[:h, :w] > 0

    return pix.reshape(h, w) | inside


@functools.partial(
    jax.jit, static_argnames=("area_divisor", "compute_medians", "use_pallas")
)
def extract_batch(
    background: jax.Array,   # [HB, WB] uint8
    frames: jax.Array,       # [B, H, W] uint8
    medians,                 # [B, H, W] uint8, or None with compute_medians
    positions: jax.Array,    # [B, 2] int32
    area_divisor: int = 5,
    compute_medians: bool = False,
    use_pallas: bool = False,
) -> jax.Array:
    """[B, H, W] uint8 foreground masks (1 = foreground, vote where 0).

    Medians are a pure function of the frame (kpe.hpp:308-314), so with
    ``compute_medians`` they are recomputed here instead of shipped from
    the host store (device->host downloads are the slow direction on the
    benchmark harness)."""
    _, h, w = frames.shape
    limit = (h * w) // area_divisor

    if compute_medians:
        from remap_tpu.core.regions import make_layout
        from remap_tpu.ops import kpe as kpe_ops

        # processed bounds depend only on the frame dims, not the grid
        layout = make_layout(w, h, 1, 1, 0)
        medians = kpe_ops.extract_dense(frames, layout, use_pallas).median

    def one(frame, median, pos):
        eq = equality_mask(background, frame, pos)
        return foreground_mask(median, ~eq, limit)

    return jax.vmap(one)(frames, medians, positions).astype(jnp.uint8)
