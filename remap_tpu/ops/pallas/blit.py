"""Pallas TPU kernel: batched vote-blit into a VMEM-resident atlas.

The XLA formulation (ops.atlas.blit_frames) scans dynamic-update-slices
over an HBM atlas — every frame round-trips the slice through HBM.  Here
the whole atlas lives in a VMEM scratch accumulator across the
sequential grid steps (one per frame); each step one-hot-expands its
frame and adds it at the frame's position (scalar-prefetched), and the
last step flushes the atlas to the output.  Traffic: frames once in,
atlas once out.

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


def _blit_kernel(pos_ref, frames_ref, masked_ref, atlas_ref, acc):
    b = pl.program_id(0)
    nb = pl.num_programs(0)

    @pl.when(b == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    frame = frames_ref[0]          # [H, W] uint8 (int8 lanes)
    mask_ok = masked_ref[0]        # [H, W] uint8: 1 = vote allowed
    x = pos_ref[b, 0]
    y = pos_ref[b, 1]

    h, w = frame.shape
    for c in range(DEPTH):
        votes = jnp.where(
            (frame == c) & (mask_ok != 0), jnp.uint16(1), jnp.uint16(0)
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
    positions: jax.Array,   # [F, 2] int32 (x, y), in-bounds
    atlas_h: int,
    atlas_w: int,
    dots: jax.Array | None = None,  # [16, AH, AW] uint16 accumulator
) -> jax.Array:
    """Returns [16, AH, AW] uint16 vote histograms (channels-major)."""
    f, h, w = frames.shape
    if dots is None:
        dots = jnp.zeros((DEPTH, atlas_h, atlas_w), jnp.uint16)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(f,),
        in_specs=[
            pl.BlockSpec(
                (1, h, w), lambda b, pos: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, h, w), lambda b, pos: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((DEPTH, atlas_h, atlas_w), jnp.uint16),
        ],
    )
    out = pl.pallas_call(
        _blit_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((DEPTH, atlas_h, atlas_w), jnp.uint16),
    )(positions, frames, vote_ok)
    return out + dots
