"""Pallas TPU kernel: batched vote-blit into a VMEM-resident atlas.

The XLA formulation (ops.atlas.blit_frames) scans dynamic-update-slices
over an HBM atlas — every frame round-trips the slice through HBM.  Here
the whole atlas lives in a VMEM scratch accumulator across the
sequential grid steps (one per frame); each step one-hot-expands its
frame and adds it at the frame's position, and the last step flushes the
atlas to the output.  Traffic: frames once in, atlas once out.

Mosaic requires dynamic VMEM indices to be tile-aligned (sublane x8,
lane x128 for the (8, 128) int16 tiling), so positions are split into an
aligned base (used in-kernel with ``pl.multiple_of`` hints) and a
sub-tile residual applied by rolling each frame on the XLA side before
the kernel (cheap: one pass over the frames).

Layout: channels-major ``[16, AH, AW]`` so the wide atlas rows ride the
128-lane minor dimension.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEPTH = 16
SUB = 8      # sublane alignment
LANE = 128   # lane alignment


def _blit_kernel(base_ref, frames_ref, ok_ref, atlas_ref, acc):
    b = pl.program_id(0)
    nb = pl.num_programs(0)

    @pl.when(b == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    frame = frames_ref[0]          # [H+SUB, W+LANE] uint8, pre-rolled
    ok = ok_ref[0]
    h, w = frame.shape
    x = pl.multiple_of(base_ref[b, 0], LANE)
    y = pl.multiple_of(base_ref[b, 1], SUB)

    for c in range(DEPTH):
        votes = jnp.where(
            (frame == c) & (ok != 0), jnp.uint16(1), jnp.uint16(0)
        )
        cur = acc[c, pl.ds(y, h), pl.ds(x, w)]
        acc[c, pl.ds(y, h), pl.ds(x, w)] = cur + votes

    @pl.when(b == nb - 1)
    def _():
        atlas_ref[...] = acc[...]


@functools.partial(jax.jit, static_argnames=("atlas_h", "atlas_w"))
def blit_frames(
    frames: jax.Array,      # [F, H, W] uint8
    vote_ok: jax.Array,     # [F, H, W] uint8 — 1 where the pixel votes
    positions: jax.Array,   # [F, 2] int32 (x, y), in [0, A? - ?]
    atlas_h: int,
    atlas_w: int,
    dots: jax.Array | None = None,  # [16, AH', AW'] uint16 accumulator
) -> jax.Array:
    """Returns [16, AH', AW'] uint16 vote histograms (channels-major),
    where AH' = atlas_h + SUB and AW' = atlas_w + LANE (tile-padding; the
    logical atlas occupies [:atlas_h, :atlas_w])."""
    f, h, w = frames.shape
    ah, aw = atlas_h + SUB, atlas_w + LANE
    if dots is None:
        dots = jnp.zeros((DEPTH, ah, aw), jnp.uint16)

    base = jnp.stack(
        [
            (positions[:, 0] // LANE) * LANE,
            (positions[:, 1] // SUB) * SUB,
        ],
        axis=-1,
    )
    rx = positions[:, 0] - base[:, 0]
    ry = positions[:, 1] - base[:, 1]

    # residual placement by rolling padded frames (unaligned work stays in
    # XLA, where dynamic shifts are unconstrained)
    def prep(img, ok, sx, sy):
        p = jnp.zeros((h + SUB, w + LANE), img.dtype)
        p = p.at[:h, :w].set(jnp.where(ok != 0, img, 16))  # 16 = no vote
        p = jnp.roll(p, (sy, sx), axis=(0, 1))
        o = jnp.zeros((h + SUB, w + LANE), jnp.uint8)
        o = o.at[:h, :w].set(1)
        o = jnp.roll(o, (sy, sx), axis=(0, 1))
        return p, o

    pf, po = jax.vmap(prep)(frames, vote_ok, rx, ry)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(f,),
        in_specs=[
            pl.BlockSpec(
                (1, h + SUB, w + LANE),
                lambda b, base: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, h + SUB, w + LANE),
                lambda b, base: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((DEPTH, ah, aw), jnp.uint16),
        ],
    )
    out = pl.pallas_call(
        _blit_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((DEPTH, ah, aw), jnp.uint16),
    )(base, pf, po)
    return out + dots
