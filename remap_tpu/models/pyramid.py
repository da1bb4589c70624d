"""pyramid model family: coarse-to-fine correlation for high-res frames.

BASELINE.json config 5: 640x480 emulator captures.  A full-radius
correlation at that resolution is wasteful; instead the coarse level
(2x- or 4x-decimated frames) scans a wide radius and the fine level
verifies/refines within a small window around the upscaled coarse peak.

Decimation is stride subsampling (palette codes can't be averaged); the
coarse agreement peak is invariant to the common shift, and the fine pass
recovers the exact offset.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from remap_tpu.ops import correlate


@functools.partial(
    jax.jit, static_argnames=("factor", "coarse_radius", "fine_radius")
)
def match_pyramid(
    prev: jax.Array,    # [B, H, W] uint8
    curr: jax.Array,
    factor: int = 4,
    coarse_radius: int = 32,
    fine_radius: int | None = None,
):
    """Coarse-to-fine offset estimation; returns (offset [B,2], ok [B]).

    ``fine_radius`` defaults to ``factor + 1``: the coarse argmax lands
    within ``factor/2`` of the true offset's decimated value on content
    with any spatial coherence (plus one for rounding), so the fine
    window need only cover that envelope — (2(f+1)+1)^2 direct rescores
    instead of a second wide scan.  Raise it for pathological content;
    measured on the VGA bench clip, radius 5 and 7 produce identical
    offsets and acceptance on every frame.
    """
    if fine_radius is None:
        fine_radius = factor + 1
    b, h, w = prev.shape

    coarse = correlate.match_xcorr(
        prev[:, ::factor, ::factor],
        curr[:, ::factor, ::factor],
        radius=coarse_radius,
        min_cover=0.15,
    )
    base = coarse.offset * factor               # [B, 2] fine-level estimate

    # fine pass: shift curr by the coarse estimate, then correlate a small
    # window; total offset = base + fine
    def shift_one(img, off):
        return jnp.roll(img, (off[1], off[0]), axis=(0, 1))

    shifted = jax.vmap(shift_one)(curr, base)
    fine = correlate.match_xcorr(
        prev, shifted, radius=fine_radius, min_cover=0.15, method="direct"
    )
    offset = base + fine.offset
    ok = coarse.ok & fine.ok
    return offset, ok


def make_matcher(cfg, factor: int = 4):
    def match(prev_frames, curr_frames):
        return match_pyramid(prev_frames, curr_frames, factor=factor)

    return match
