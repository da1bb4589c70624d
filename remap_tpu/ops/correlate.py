"""Dense 2D cross-correlation alignment scoring (TPU-native matcher).

The reference has no correlation matcher — its alignment is keypoint
voting (kpm.hpp).  This module is the TPU-first alternative blessed by the
project north star ("dense 2D pixel cross-correlation for alignment
scoring … tiled correlation GEMMs"): the count-of-agreement score

    S[d] = #{x : curr(x) == prev(x + d)}

over all shifts |d| <= R in one batched FFT correlation of the 16 one-hot
palette channels (exact integer counts — one-hots are 0/1 floats and
counts << 2^24).  The peak gives the offset; acceptance requires the peak
to dominate the best score outside its immediate neighbourhood and to
cover a minimum fraction of the frame.

Unlike the grid-vote matcher this scores *every* pixel, so it is robust on
keypoint-poor (smooth) content; semantics intentionally differ from the
reference (use ``matcher="grid_vote"`` for reference parity).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class XCorrResult(NamedTuple):
    offset: jax.Array   # [B, 2] int32 (dx, dy)
    ok: jax.Array       # [B] bool
    score: jax.Array    # [B] float32 peak agreement count


def _pad_dim(n: int, r: int) -> int:
    """FFT-friendly padded size >= n + 2r (multiples of 128 suit TPU)."""
    target = n + 2 * r
    return ((target + 127) // 128) * 128


def correlation_scores(
    prev: jax.Array,   # [B, H, W] uint8 palette codes
    curr: jax.Array,
    radius: int,
) -> jax.Array:
    """[B, 2R+1, 2R+1] float32 agreement counts for shifts in [-R, R]^2.

    score[dy + R, dx + R] = #{x : curr(x) == prev(x + d)}.
    """
    b, h, w = prev.shape
    ph, pw = _pad_dim(h, radius), _pad_dim(w, radius)

    def channel_corr(c, acc):
        a = jnp.zeros((b, ph, pw), jnp.float32)
        a = a.at[:, :h, :w].set((prev == c).astype(jnp.float32))
        bb = jnp.zeros((b, ph, pw), jnp.float32)
        bb = bb.at[:, :h, :w].set((curr == c).astype(jnp.float32))
        fa = jnp.fft.rfft2(a)
        fb = jnp.fft.rfft2(bb)
        corr = jnp.fft.irfft2(fa * jnp.conj(fb), s=(ph, pw))
        return acc + corr

    corr = jax.lax.fori_loop(
        0, 16, channel_corr, jnp.zeros((b, ph, pw), jnp.float32)
    )
    # corr[(d) mod (ph, pw)] = sum_x prev(x + d) curr(x); roll the window
    # so index 0 maps to d = -R
    win = jnp.roll(corr, (radius, radius), axis=(1, 2))[
        :, : 2 * radius + 1, : 2 * radius + 1
    ]
    return win


def correlation_scores_direct(
    prev: jax.Array, curr: jax.Array, radius: int
) -> jax.Array:
    """Same scores as :func:`correlation_scores` by direct shifted
    comparison — cheaper than FFTs for small radii (the pyramid fine
    pass): (2R+1)^2 static rolls with border masking."""
    b, h, w = prev.shape
    n = 2 * radius + 1
    rows = []
    for dy in range(-radius, radius + 1):
        cols = []
        for dx in range(-radius, radius + 1):
            # prev sampled at x + d; out-of-bounds contributes nothing
            shifted = jnp.roll(prev, (-dy, -dx), axis=(1, 2))
            eq = (shifted == curr).astype(jnp.float32)
            y0, y1 = max(0, -dy), h - max(0, dy)
            x0, x1 = max(0, -dx), w - max(0, dx)
            cols.append(eq[:, y0:y1, x0:x1].sum(axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=-1))
    return jnp.stack(rows, axis=-2)  # [B, 2R+1, 2R+1]


@functools.partial(
    jax.jit,
    static_argnames=("radius", "min_ratio", "min_cover", "exclude", "method"),
)
def match_xcorr(
    prev: jax.Array,
    curr: jax.Array,
    radius: int = 48,
    min_ratio: float = 1.10,
    min_cover: float = 0.20,
    exclude: int = 2,
    method: str = "fft",
) -> XCorrResult:
    """Peak-pick + dominance acceptance over the correlation window."""
    b, h, w = prev.shape
    if method == "direct":
        win = correlation_scores_direct(prev, curr, radius)
    else:
        win = correlation_scores(prev, curr, radius)
    n = 2 * radius + 1
    flat = win.reshape(b, -1)
    peak_idx = jnp.argmax(flat, axis=-1)
    peak = jnp.take_along_axis(flat, peak_idx[:, None], axis=-1)[:, 0]
    py = peak_idx // n
    px = peak_idx % n

    ys = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)[None]
    xs = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)[None]
    near = (jnp.abs(ys - py[:, None, None]) <= exclude) & (
        jnp.abs(xs - px[:, None, None]) <= exclude
    )
    runner = jnp.max(jnp.where(near, -jnp.inf, win), axis=(1, 2))

    # rounded counts (FFT floats are within epsilon of the true integers)
    peak_count = jnp.round(peak)
    offset = jnp.stack([px - radius, py - radius], axis=-1).astype(jnp.int32)
    ok = (peak_count >= min_cover * h * w) & (
        peak >= runner * jnp.float32(min_ratio)
    )
    return XCorrResult(offset=offset, ok=ok, score=peak)
