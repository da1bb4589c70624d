"""Connected-component labeling on device (TPU form of cte.hpp).

The reference BFS-flood-fills equal-valued 4-connected components bounded
by a 1-px horizon border (cte.hpp:103-147).  The TPU formulation is
iterative **min-label propagation with pointer jumping**: every interior
pixel starts labeled with its own flat index; each step takes the min label
over equal-valued 4-neighbours, then short-circuits chains by gathering
``label[label]`` (path halving).  The fixpoint assigns every component the
flat index of its *row-major first pixel* — exactly the reference's
discovery order (cte.hpp:65-79), which downstream tie-breaks rely on
(aws.hpp:62-69 picks the first minimal-score contour).

Border pixels keep the sentinel label (they are never part of a component,
cte.hpp:149-166).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _neighbor_min(labels: jax.Array, image: jax.Array, big: int) -> jax.Array:
    """Min label over same-valued 4-neighbours (without crossing values)."""

    def shifted(arr, dy, dx, fill):
        return jnp.roll(arr, (dy, dx), axis=(-2, -1))

    out = labels
    for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0)):
        nl = shifted(labels, dy, dx, big)
        nv = shifted(image, dy, dx, 0)
        same = nv == image
        # roll wraps; wrapped pixels are border (sentinel) or masked by the
        # border sentinel itself, so they never propagate a real label.
        out = jnp.minimum(out, jnp.where(same, nl, big))
    return out


@jax.jit
def label_components(image: jax.Array) -> jax.Array:
    """[H, W] -> int32 labels; interior pixels get their component's
    row-major-first flat index, border pixels get H*W (sentinel).

    The propagate+jump loop runs to the fixpoint (labels are monotone
    decreasing and bounded, so termination is guaranteed; path halving
    makes the iteration count ~log of the component diameter).
    """
    h, w = image.shape
    big = h * w

    iota = jnp.arange(big, dtype=jnp.int32).reshape(h, w)
    # horizon = 1-px frame EXCEPT the bottom, which is 2 px: cte::
    # clear_outline horizons the last two rows (cte.hpp:155-165; verified
    # against the compiled reference, tests/differential/)
    interior = jnp.zeros((h, w), bool).at[1:-2, 1:-1].set(True)
    labels = jnp.where(interior, iota, big)

    # Sentinel-value border: give border pixels an impossible image value so
    # equal-value propagation never crosses the horizon (cte.hpp:149-166).
    img = jnp.where(interior, image.astype(jnp.int32), -1)

    def body(state):
        labels, _ = state
        # several cheap propagation sweeps (rolls) per expensive pointer
        # jump (the jump is a full-image gather, ~14ns/element here)
        nxt = labels
        for _ in range(4):
            nxt = jnp.minimum(
                nxt, jnp.where(interior, _neighbor_min(nxt, img, big), big)
            )
        # pointer jumping: label <- label[label] (clamped for sentinel)
        flat = nxt.reshape(-1)
        jumped = flat[jnp.clip(flat, 0, big - 1)]
        jumped = jnp.where(flat == big, big, jumped).reshape(h, w)
        changed = jnp.any(jumped != labels)
        return jumped, changed

    def cond(state):
        return state[1]

    labels, _ = jax.lax.while_loop(
        cond, body, (labels, jnp.asarray(True))
    )
    return labels


@jax.jit
def component_stats(
    labels: jax.Array, image: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Per-pixel component statistics.

    Returns (area, color) where area[y, x] = size of the component of
    (y, x) (0 on the border) and color is the image value.  Areas come from
    a segment count over flat labels.
    """
    h, w = labels.shape
    big = h * w
    flat = labels.reshape(-1)
    counts = jax.ops.segment_sum(
        jnp.where(flat < big, 1, 0),
        jnp.clip(flat, 0, big - 1),
        num_segments=big,
    )
    area = jnp.where(flat < big, counts[jnp.clip(flat, 0, big - 1)], 0)
    return area.reshape(h, w), image
