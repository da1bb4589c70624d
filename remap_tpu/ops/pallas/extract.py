"""Pallas TPU kernel: fused keypoint/median extraction (kpe.hpp's core).

One VMEM-resident pass per frame computes everything ops.kpe.extract_dense
does — 16-bin ordered histograms over 3x3/5x5 boxes (as shifted adds),
median-from-top ranks, keypoint weights, and packed descriptor codes —
without materializing the 16-channel one-hot planes in HBM.  Everything is
int32 (Mosaic dislikes sub-32-bit layouts; nibble-packed codes reinterpret
exactly as the uint32 words of spec.kpe.pack_code).

The rank walk is a ``fori_loop`` with explicit carries (five planes), not
an unrolled chain — unrolling kept every iteration's temporaries live on
the kernel "stack" and blew the 16 MB VMEM budget on large frames.  The
ordered->native permutation rides in as a scalar-prefetch table.

Grid: one program per frame.  Border wraparound from the rolled shifts
only corrupts pixels the wrapper masks out (outside the processed bounds,
core.regions).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from remap_tpu.core import palette

HALF3 = 4   # kpe.hpp:313
HALF5 = 12  # kpe.hpp:317


def _roll2(a, dy, dx):
    """out[y, x] = a[y + dy, x + dx] (wraps; borders are masked later)."""
    if dy:
        a = jnp.roll(a, -dy, 0)
    if dx:
        a = jnp.roll(a, -dx, 1)
    return a


def _extract_kernel(tab_ref, frame_ref, median_ref, weight_ref, codes_ref):
    frame = frame_ref[0]                    # [H, W] int32 palette codes
    zero = jnp.zeros_like(frame)

    def rank_step(i, carry):
        cge3, cge5, p3cnt, p5cnt, p1r = carry
        r = 15 - i
        nat = tab_ref[r]                    # ordered rank -> native code
        oh = jnp.where(frame == nat, jnp.int32(1), jnp.int32(0))
        p1r = p1r + r * oh

        row3 = oh + _roll2(oh, 0, -1) + _roll2(oh, 0, 1)
        row5 = row3 + _roll2(oh, 0, -2) + _roll2(oh, 0, 2)
        box3 = row3 + _roll2(row3, -1, 0) + _roll2(row3, 1, 0)
        box5 = row5 + _roll2(row5, -1, 0) + _roll2(row5, 1, 0)
        box5 = box5 + _roll2(row5, -2, 0) + _roll2(row5, 2, 0)

        cge3 = cge3 + box3
        cge5 = cge5 + box5
        p3cnt = p3cnt + jnp.where(cge3 >= HALF3, 1, 0)
        p5cnt = p5cnt + jnp.where(cge5 >= HALF5, 1, 0)
        return cge3, cge5, p3cnt, p5cnt, p1r

    _, _, p3cnt, p5cnt, p1r = jax.lax.fori_loop(
        0, 16, rank_step, (zero, zero, zero, zero, zero)
    )

    # cnt_ge(r) >= half holds exactly for r <= median rank (descending
    # accumulation), so the true count is rank + 1 (kpe.hpp:326-340)
    p3 = p3cnt - 1
    p5 = p5cnt - 1

    # median image back in native codes
    def med_step(r, med):
        return med + jnp.where(p3 == r, tab_ref[r], 0)

    median_ref[0] = jax.lax.fori_loop(0, 16, med_step, zero)

    is_kp = (p1r != p3) & (p3 != p5)
    weight = jnp.where(
        is_kp, jnp.where(p1r != p5, jnp.int32(2), jnp.int32(1)), 0
    )
    weight_ref[0] = weight

    # packed codes: nibble k of the 5x5 patch -> word k//8, bit 4*(k%8)
    for widx in range(4):
        acc = zero
        for slot in range(8):
            k = widx * 8 + slot
            if k >= 25:
                break
            dy, dx = k // 5 - 2, k % 5 - 2
            acc = acc | (_roll2(frame, dy, dx) << (4 * slot))
        if widx == 3:
            acc = acc | (weight << 4)
        codes_ref[0, widx] = acc


class PallasExtract(NamedTuple):
    median: jax.Array   # [B, H, W] uint8
    weight: jax.Array   # [B, H, W] uint8
    codes: jax.Array    # [B, H, W, 4] uint32


@jax.jit
def extract_dense_raw(images: jax.Array) -> PallasExtract:
    """[B, H, W] uint8 -> unmasked dense extraction (borders garbage)."""
    b, h, w = images.shape
    f32 = images.astype(jnp.int32)
    tab = jnp.asarray(palette.ORDERED_TO_NATIVE.astype(np.int32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i, tab: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, h, w), lambda i, tab: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i, tab: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, h, w), lambda i, tab: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    median, weight, codes = pl.pallas_call(
        _extract_kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b, h, w), jnp.int32),
            jax.ShapeDtypeStruct((b, h, w), jnp.int32),
            jax.ShapeDtypeStruct((b, 4, h, w), jnp.int32),
        ),
    )(tab, f32)
    return PallasExtract(
        median=median.astype(jnp.uint8),
        weight=weight.astype(jnp.uint8),
        codes=codes.transpose(0, 2, 3, 1).astype(jnp.uint32),
    )
