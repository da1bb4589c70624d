"""Connected-component labeling cost at >VGA screen sizes.

Measures the row-banded kernel (ops.pallas.cc.label_components_banded)
against the XLA pointer-jumping formulation (ops.cc) on game-like tiled
content, with a per-phase breakdown (band pass / boundary union / seeded
relax) and a band-height sweep.  Run on the real chip:

    python benchmarks/cc_bench.py [--sizes 1080p] [--bands 8,16,24,40]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from remap_tpu.utils.runtime import setup_cache  # noqa: E402


def game_content(h: int, w: int, tile: int = 16, seed: int = 0) -> np.ndarray:
    """Tiled palette blobs: many components, game-like run structure."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 16, (h // tile + 1, w // tile + 1), dtype=np.uint8)
    img = np.repeat(np.repeat(base, tile, 0), tile, 1)[:h, :w]
    return img


def spiral_content(h: int, w: int) -> np.ndarray:
    """One giant spiral: the worst-case run-chain diameter for the
    scan-propagation fixpoint (hundreds of alternating row/col runs)."""
    img = np.zeros((h, w), np.uint8)
    top, bot, lef, rig = 1, h - 3, 1, w - 2
    while top < bot and lef < rig:
        img[top, lef:rig] = 1
        img[top:bot, rig - 1] = 1
        img[bot - 1, lef:rig] = 1
        img[top + 2 : bot, lef] = 1
        top += 4
        bot -= 4
        lef += 4
        rig -= 4
    return img


def timeit(fn, *args, reps: int = 16, rounds: int = 3) -> float:
    """Chained-dispatch, fetch-forced timing (the bench.py protocol).

    ``block_until_ready`` is NOT a reliable execution barrier through the
    axon tunnel — only a host fetch forces the dispatched chain — so each
    round dispatches ``reps`` calls and fetches one element of the last
    output; the measured per-call time amortizes that single fetch."""
    out = fn(*args)
    np.asarray(out).ravel()[:1]
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        np.asarray(out.ravel()[:1])
        best = min(best, (time.perf_counter() - t0) / reps * 1e3)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="480p,960p,1080p")
    ap.add_argument("--bands", default="")
    ap.add_argument("--xla", action="store_true",
                    help="also time the XLA pointer-jumping formulation")
    ap.add_argument("--content", choices=["tiles", "spiral"], default="tiles")
    args = ap.parse_args()

    setup_cache()
    import jax
    import jax.numpy as jnp

    from remap_tpu.ops import cc as xcc
    from remap_tpu.ops.pallas import cc as pcc

    dims = {"480p": (480, 640), "960p": (960, 1280), "1080p": (1080, 1920)}
    for name in args.sizes.split(","):
        h, w = dims[name]
        make = {"tiles": game_content, "spiral": spiral_content}[args.content]
        img = jnp.asarray(make(h, w)[None])

        if pcc.supports(h, w):
            print(f"{name}: whole-plane "
                  f"{timeit(pcc.label_components_batch, img):.1f} ms")

        heights = ([int(b) for b in args.bands.split(",") if b]
                   or [pcc.default_band_rows(w)])
        ref = None
        for bh in heights:
            full = timeit(
                lambda im, b=bh: pcc.label_components_banded(im, band_rows=b),
                img,
            )
            lab = pcc.label_components_banded(img, band_rows=bh)
            if ref is None:
                ref = np.asarray(lab)
            else:
                np.testing.assert_array_equal(np.asarray(lab), ref)
            print(f"{name}: banded bh={bh:3d}  {full:6.1f} ms")

        if args.xla:
            print(f"{name}: XLA      "
                  f"{timeit(jax.jit(xcc.label_components), img[0]):.1f} ms")


if __name__ == "__main__":
    main()
