"""Pallas TPU kernel: fused keypoint/median extraction (kpe.hpp's core).

One VMEM-resident pass per frame (or per row band) computes everything
ops.kpe.extract_dense does — 16-bin ordered histograms over 3x3/5x5 boxes
(as shifted adds), median-from-top ranks, keypoint weights, and packed
descriptor codes — without materializing the 16-channel one-hot planes in
HBM.  Everything is int32 (Mosaic dislikes sub-32-bit layouts;
nibble-packed codes reinterpret exactly as the uint32 words of
spec.kpe.pack_code).

The rank walk is a ``fori_loop`` with explicit carries (five planes), not
an unrolled chain — unrolling kept every iteration's temporaries live on
the kernel "stack" and blew the 16 MB VMEM budget on large frames.  The
ordered->native permutation rides in as a scalar-prefetch table.

Two dispatch shapes:

- **whole-frame** (grid = one program per frame) for frames that fit the
  VMEM working set (~20 int32 planes), i.e. up to ~C64 size;
- **row-banded** (grid = one program per (frame, band)) for anything
  larger: frames are split into ``tile_h``-row bands with a 2-px halo on
  each side (the 5x5 window's reach, kpe.hpp:207-306 streams rows the
  same way), gathered into an overlapping band stack, and each program
  writes only its interior rows.  Bit-exact vs the whole-frame kernel
  within the processed bounds.

Border wraparound from the rolled shifts only corrupts pixels the wrapper
masks out (outside the processed bounds, core.regions); band halos are
zero-padded at the frame's top/bottom edges, which also lies outside the
processed y range.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from remap_tpu.core import palette

HALF3 = 4   # kpe.hpp:313
HALF5 = 12  # kpe.hpp:317
HALO = 2    # kernel half-width: the 5x5 window reaches 2 px (kpe.hpp:16-17)

# max int32 plane elements the whole-frame kernel may hold in VMEM
# (~20 live planes x 4 B => ~10 MB of the 16 MB budget), measured in
# LANE-PADDED elements: Mosaic pads the last dim to 128 lanes, so a
# 312x388 frame occupies 312x512 (the padding is what tipped C64-size
# whole-frame dispatches 8 KB over the 16 MB budget).  120_000 held for
# frame-shaped dispatches but tipped 336 KB over the scoped-vmem limit
# on session-scale splice canvases (tile 32 x width 3328, BASELINE
# config 4's 100k run) — the shave to 108_000 keeps ~10% headroom;
# tile choice is mechanical, results are tile-independent (tested)
_SINGLE_CAP = 108_000


def _roll2(a, dy, dx):
    """out[y, x] = a[y + dy, x + dx] (wraps; borders are masked later)."""
    if dy:
        a = jnp.roll(a, -dy, 0)
    if dx:
        a = jnp.roll(a, -dx, 1)
    return a


def _compute_planes(tab_ref, frame, emit):
    """Core fused computation on one [H, W] int32 plane.

    Rows/cols within HALO of the plane edge are garbage (wraparound),
    callers mask or crop.  Results stream out through ``emit(kind, plane)``
    with kind in {"median", "weight", 0..3} — writing each plane as it is
    produced keeps the VMEM working set small (holding all four code
    words live tipped C64-size frames over the 16 MB budget).

    Histograms ride **bit-packed**: the 16 ordered-rank bins live as
    5-bit fields (max window count 25 < 32) packed six-per-int32 across
    three planes, so the separable 3x3/5x5 window sums run once over 3
    planes instead of once per rank — the TPU form of the reference's
    two-histograms-in-one-__m256i trick (kpe.hpp:20-66), rotated from
    16xuint8 lanes into 6x5-bit fields.  The median rank walk then
    unpacks counts top-down as straight-line code (no loop carries).
    """
    zero = jnp.zeros_like(frame)

    # equality masks drive both the rank image and the packed one-hots
    p1r = zero
    packed = [zero, zero, zero]
    for r in range(16):
        eq = jnp.where(frame == tab_ref[r], jnp.int32(1), jnp.int32(0))
        if r:
            p1r = p1r + r * eq
        j, off = divmod(r, 6)
        packed[j] = packed[j] + (eq << (5 * off))

    def boxsums(p):
        row3 = p + _roll2(p, 0, -1) + _roll2(p, 0, 1)
        row5 = row3 + _roll2(p, 0, -2) + _roll2(p, 0, 2)
        box3 = row3 + _roll2(row3, -1, 0) + _roll2(row3, 1, 0)
        box5 = row5 + _roll2(row5, -1, 0) + _roll2(row5, 1, 0)
        box5 = box5 + _roll2(row5, -2, 0) + _roll2(row5, 2, 0)
        return box3, box5

    sums = [boxsums(p) for p in packed]

    # median-from-top: unpack each rank's 5-bit count, accumulate
    # cnt_ge, count ranks where cnt_ge >= half (kpe.hpp:326-340)
    acc3, acc5, p3cnt, p5cnt = zero, zero, zero, zero
    for r in range(15, -1, -1):
        j, off = divmod(r, 6)
        acc3 = acc3 + ((sums[j][0] >> (5 * off)) & 31)
        acc5 = acc5 + ((sums[j][1] >> (5 * off)) & 31)
        p3cnt = p3cnt + jnp.where(acc3 >= HALF3, 1, 0)
        p5cnt = p5cnt + jnp.where(acc5 >= HALF5, 1, 0)

    # cnt_ge(r) >= half holds exactly for r <= median rank (descending
    # accumulation), so the true count is rank + 1 (kpe.hpp:326-340)
    p3 = p3cnt - 1
    p5 = p5cnt - 1

    # median image back in native codes
    def med_step(r, med):
        return med + jnp.where(p3 == r, tab_ref[r], 0)

    median = jax.lax.fori_loop(0, 16, med_step, zero)
    emit("median", median)

    is_kp = (p1r != p3) & (p3 != p5)
    weight = jnp.where(
        is_kp, jnp.where(p1r != p5, jnp.int32(2), jnp.int32(1)), 0
    )
    emit("weight", weight)

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
        emit(widx, acc)


def _extract_kernel(tab_ref, frame_ref, median_ref, weight_ref, codes_ref):
    def emit(kind, plane):
        if kind == "median":
            median_ref[0] = plane
        elif kind == "weight":
            weight_ref[0] = plane
        else:
            codes_ref[0, kind] = plane

    _compute_planes(tab_ref, frame_ref[0], emit)


def _band_kernel(tile_h, tab_ref, band_ref, median_ref, weight_ref,
                 codes_ref):
    sl = slice(HALO, HALO + tile_h)

    def emit(kind, plane):
        if kind == "median":
            median_ref[0] = plane[sl]
        elif kind == "weight":
            weight_ref[0] = plane[sl]
        else:
            codes_ref[0, kind] = plane[sl]

    _compute_planes(tab_ref, band_ref[0], emit)


class PallasExtract(NamedTuple):
    median: jax.Array   # [B, H, W] uint8
    weight: jax.Array   # [B, H, W] uint8
    codes: jax.Array    # [B, H, W, 4] uint32


def _padded_w(w: int) -> int:
    return -(-w // 128) * 128


def pick_tile(h: int, w: int) -> Optional[int]:
    """Band height for (h, w), or None when the whole frame fits VMEM.

    Picks the fewest bands that fit the budget, then evens the band
    height across them (rounded up to the 8-row sublane), so a frame just
    over the cap splits into two near-halves instead of many small tiles.
    """
    pw = _padded_w(w)
    if h * pw <= _SINGLE_CAP:
        return None
    tile_max = _SINGLE_CAP // pw - 2 * HALO
    tile_max -= tile_max % 8
    if tile_max < 8:
        return None
    n_bands = -(-h // tile_max)
    tile = -(-h // n_bands)
    tile += (-tile) % 8
    return min(tile, tile_max)


def supports(h: int, w: int) -> bool:
    """True if some Pallas dispatch shape exists for this frame size."""
    return h * _padded_w(w) <= _SINGLE_CAP or pick_tile(h, w) is not None


@jax.jit
def _extract_whole(images: jax.Array) -> PallasExtract:
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


@functools.partial(jax.jit, static_argnames=("tile_h",))
def _extract_banded(images: jax.Array, tile_h: int) -> PallasExtract:
    """Row-banded dispatch: [B, H, W] -> bands [B*T, tile_h+2*HALO, W]."""
    b, h, w = images.shape
    t = -(-h // tile_h)
    hp = t * tile_h
    f32 = images.astype(jnp.int32)
    tab = jnp.asarray(palette.ORDERED_TO_NATIVE.astype(np.int32))

    padded = jnp.pad(f32, ((0, 0), (HALO, hp - h + HALO), (0, 0)))
    hb = tile_h + 2 * HALO
    # static slices, not a row gather — gathers cost ~15 ns/element on
    # this hardware and dominated the banded dispatch when first measured
    bands = jnp.stack(
        [
            jax.lax.slice_in_dim(padded, i * tile_h, i * tile_h + hb, axis=1)
            for i in range(t)
        ],
        axis=1,
    ).reshape(b * t, hb, w)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b * t,),
        in_specs=[
            pl.BlockSpec((1, hb, w), lambda i, tab: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tile_h, w), lambda i, tab: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_h, w), lambda i, tab: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, tile_h, w), lambda i, tab: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    median, weight, codes = pl.pallas_call(
        functools.partial(_band_kernel, tile_h),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b * t, tile_h, w), jnp.int32),
            jax.ShapeDtypeStruct((b * t, tile_h, w), jnp.int32),
            jax.ShapeDtypeStruct((b * t, 4, tile_h, w), jnp.int32),
        ),
    )(tab, bands)

    median = median.reshape(b, hp, w)[:, :h]
    weight = weight.reshape(b, hp, w)[:, :h]
    codes = (
        codes.reshape(b, t, 4, tile_h, w)
        .transpose(0, 2, 1, 3, 4)
        .reshape(b, 4, hp, w)[:, :, :h]
    )
    return PallasExtract(
        median=median.astype(jnp.uint8),
        weight=weight.astype(jnp.uint8),
        codes=codes.transpose(0, 2, 3, 1).astype(jnp.uint32),
    )


def extract_dense_raw(
    images: jax.Array, band_h: Optional[int] = None
) -> PallasExtract:
    """[B, H, W] uint8 -> unmasked dense extraction (borders garbage).

    Dispatches whole-frame for VMEM-sized frames, row-banded beyond
    (``band_h`` forces a specific band height — used by tests)."""
    _, h, w = images.shape
    tile = band_h if band_h is not None else pick_tile(h, w)
    if tile is None:
        return _extract_whole(images)
    return _extract_banded(images, tile_h=tile)
