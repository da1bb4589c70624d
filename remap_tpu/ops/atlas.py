"""Fragment atlas device kernels (fgm.hpp on TPU).

The reference grows a per-fragment canvas of 16-bin vote histograms and
blits frames one at a time (fgm.hpp:71-113,176-233).  Here the canvas is a
static padded [Ha, Wa, 16] uint16 array; a whole fragment's frames are
blitted in one ``lax.scan`` of dynamic-update-slice adds (positions are
known up front from the batched matcher, so no growth logic is needed —
the extent is computed on the host and padded to a bucket size to bound
recompiles).

Vote counts wrap at 65535 exactly like the C++ ``++uint16`` (fgm.hpp:12-15).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

DEPTH = 16  # fgm.hpp:12


@functools.partial(jax.jit, static_argnames=("atlas_h", "atlas_w"))
def blit_frames(
    frames: jax.Array,          # [F, H, W] uint8
    positions: jax.Array,       # [F, 2] int32 (x, y) atlas coords, in-bounds
    atlas_h: int,
    atlas_w: int,
    masks: Optional[jax.Array] = None,   # [F, H, W] uint8; vote where == 0
    dots: Optional[jax.Array] = None,    # [Ha, Wa, 16] uint16 to accumulate
) -> jax.Array:
    """Scatter color votes of all frames into an atlas (fgm.hpp:71-97)."""
    f, h, w = frames.shape
    if dots is None:
        dots = jnp.zeros((atlas_h, atlas_w, DEPTH), dtype=jnp.uint16)

    def step(dots, inp):
        if masks is None:
            frame, pos = inp
            votes = (
                frame[..., None] == jnp.arange(DEPTH, dtype=jnp.uint8)
            ).astype(jnp.uint16)
        else:
            frame, pos, mask = inp
            votes = (
                (frame[..., None] == jnp.arange(DEPTH, dtype=jnp.uint8))
                & (mask[..., None] == 0)
            ).astype(jnp.uint16)
        x, y = pos[0], pos[1]
        cur = jax.lax.dynamic_slice(dots, (y, x, 0), (h, w, DEPTH))
        dots = jax.lax.dynamic_update_slice(dots, cur + votes, (y, x, 0))
        return dots, None

    xs = (frames, positions) if masks is None else (frames, positions, masks)
    dots, _ = jax.lax.scan(step, dots, xs)
    return dots


@jax.jit
def blend(dots: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(image, mask): argmax color per pixel, mask = any votes
    (fgm.hpp:115-135; first-max wins like std::max_element)."""
    image = jnp.argmax(dots, axis=-1).astype(jnp.uint8)
    mask = (dots.max(axis=-1) > 0).astype(jnp.uint8)
    return image * mask, mask


@jax.jit
def add_fragment(
    dots: jax.Array, other: jax.Array, pos: jax.Array
) -> jax.Array:
    """Histogram-add a whole fragment canvas at pos (fgm.hpp:99-113)."""
    h, w, _ = other.shape
    cur = jax.lax.dynamic_slice(dots, (pos[1], pos[0], 0), (h, w, DEPTH))
    return jax.lax.dynamic_update_slice(dots, cur + other, (pos[1], pos[0], 0))


@jax.jit
def margins(dots: jax.Array) -> jax.Array:
    """[left, top, right, bottom] empty-margin counts (fgm.hpp:145-153).

    All-empty canvases return [W, H, W, H] like the reference.
    """
    h, w, _ = dots.shape
    nonempty = dots.max(axis=-1) > 0
    cols = nonempty.any(axis=0)
    rows = nonempty.any(axis=1)
    any_at_all = cols.any()

    first_col = jnp.argmax(cols)
    last_col = w - 1 - jnp.argmax(cols[::-1])
    first_row = jnp.argmax(rows)
    last_row = h - 1 - jnp.argmax(rows[::-1])

    res = jnp.stack(
        [first_col, first_row, w - 1 - last_col, h - 1 - last_row]
    ).astype(jnp.int32)
    return jnp.where(any_at_all, res, jnp.array([w, h, w, h], jnp.int32))
