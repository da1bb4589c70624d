"""Strict-escalation cost: incremental pair repair vs full-clip replay.

A clip whose camera crosses a repetitive-tile stripe trips the join
multiplicity bound on a *minority* of pairs.  Round 2's strict loop
replayed the whole clip per escalation; round 3 re-matches only the
flagged pairs (pipeline.collect.repair_pairs — sound because every
unflagged declaration carries a stability proof).  This measures both:

    python benchmarks/escalation_bench.py [--frames N]
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from remap_tpu.utils.runtime import setup_cache  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=512)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    setup_cache()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from remap_tpu.config import PipelineConfig
    from remap_tpu.core.regions import make_layout
    from remap_tpu.pipeline import collect as jcollect
    from remap_tpu.pipeline.state import FrameStore

    rng = np.random.default_rng(9)
    fh, fw = 240, 256
    wh, ww = fh + 64, 4096
    # moderate keypoint density (16x16 tiles) so tables never overflow...
    base = rng.integers(0, 16, (wh // 16 + 1, ww // 16 + 1), dtype=np.uint8)
    world = np.repeat(np.repeat(base, 16, 0), 16, 1)[:wh, :ww]
    # ...except a repetitive 4x4-tiled stripe that overwhelms a
    # multiplicity-1 join on exactly the pairs that cross it
    tile = rng.integers(0, 16, size=(4, 4), dtype=np.uint8)
    world[:, 1800:2600] = np.tile(tile, (wh // 4 + 1, 200))[:wh, :800]

    n = args.frames
    xs = np.linspace(0, ww - fw - 8, n).astype(int)
    frames = [
        world[(i % 3): (i % 3) + fh, x : x + fw] for i, x in enumerate(xs)
    ]

    cfg = PipelineConfig(
        screen_width=fw, screen_height=fh,
        region_capacity=3072, join_multiplicity=1, vote_radius=16,
        frame_batch=64,
    )
    layout = make_layout(fw, fh, cfg.grid_width, cfg.grid_height,
                         cfg.grid_overlap)

    def tight_pass(store):
        return jcollect.match_pass(frames, layout, cfg, store)

    # warm compiles
    store = FrameStore(fh, fw)
    off, ok, tabf, joinf, rangef, _ = tight_pass(store)
    flagged = int((tabf | joinf | rangef).sum())
    print(f"frames={n} flagged_pairs={flagged} "
          f"(tab={int(tabf.sum())} join={int(joinf.sum())} "
          f"range={int(rangef.sum())})")

    ecfg = dataclasses.replace(
        cfg, join_multiplicity=4, vote_radius=0
    )

    pairs = np.flatnonzero(
        (tabf | np.concatenate([[False], tabf[:-1]]) | joinf | rangef)
    )
    pairs = pairs[pairs > 0].tolist()

    # old strict loop: full replay at the escalated config (best of 2 —
    # the first run pays the escalated program's remote compile)
    t_replay = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        replay = (store.image(i) for i in range(len(store)))
        jcollect.match_pass(replay, layout, ecfg, None)
        t_replay = min(t_replay, time.perf_counter() - t0)

    # new strict loop: re-match only the flagged pairs
    t_repair = float("inf")
    for _ in range(2):
        o2, m2 = off.copy(), ok.copy()
        t0 = time.perf_counter()
        jcollect.repair_pairs(pairs, store, layout, ecfg, o2, m2)
        t_repair = min(t_repair, time.perf_counter() - t0)

    print(f"full replay:  {t_replay:6.2f} s")
    print(f"pair repair:  {t_repair:6.2f} s  "
          f"({len(pairs)} pairs, {t_replay / max(t_repair, 1e-9):.1f}x)")


if __name__ == "__main__":
    main()
