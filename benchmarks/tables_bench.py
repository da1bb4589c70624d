#!/usr/bin/env python
"""Region-table build mechanisms head-to-head at the flagship shape.

The tables stage is the largest term of the streaming step (~18 ms of
29.4 ms at B=256/cap 640, BENCHMARKS.md).  This times each mechanism
standalone with the chained-dispatch + fetch-one-element protocol:

  - topk   : flat top_k + payload gather (round-2 baseline)
  - sort2  : two-level chunk sort + payload gather (round-2..4 default)
  - pallas : VMEM binary-distance shift network, zero gathers (round 5)

plus a bit-exactness cross-check of pallas vs topk on device.

Usage: python benchmarks/tables_bench.py [--batch 256] [--cap 640]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--cap", type=int, default=640)
    ap.add_argument("--chain", type=int, default=16)
    ap.add_argument("--secs", type=float, default=5.0)
    args = ap.parse_args()

    from remap_tpu.utils.runtime import setup_cache

    setup_cache()

    import jax
    import jax.numpy as jnp

    from remap_tpu.config import PipelineConfig
    from remap_tpu.core.regions import make_layout
    from remap_tpu.ops import tables as xtables
    from remap_tpu.ops.pallas import tables as ptables

    cfg = PipelineConfig()
    H, W, B, K = 240, 256, args.batch, args.cap
    layout = make_layout(W, H, cfg.grid_width, cfg.grid_height,
                         cfg.grid_overlap)
    rng = np.random.default_rng(1)
    # flagship-like keypoint density: ~400/region over ~9-16k px regions
    weight = np.zeros((B, H, W), np.uint8)
    m = rng.random((B, H, W)) < 0.035
    weight[m] = rng.integers(1, 3, size=int(m.sum()))
    codes = rng.integers(0, 1 << 32, size=(B, H, W, 4), dtype=np.uint32)

    wdev = jnp.asarray(weight)
    cdev = jnp.asarray(codes)

    fns = {
        "topk": jax.jit(lambda w, c: xtables.build_tables(
            w, c, layout, K, "topk")),
        "sort2": jax.jit(lambda w, c: xtables.build_tables(
            w, c, layout, K, "sort2")),
        "pallas": jax.jit(lambda w, c: ptables.build_tables_pallas(
            w, c, layout, K)),
    }

    results = {}
    for name, fn in fns.items():
        out = fn(wdev, cdev)
        _ = int(np.asarray(out.codes[0, 0, 0, 0]))   # force
        t0 = time.perf_counter()
        reps = 0
        while time.perf_counter() - t0 < args.secs:
            for _ in range(args.chain):
                out = fn(wdev, cdev)
                reps += 1
            _ = int(np.asarray(out.codes[0, 0, 0, 0]))
        ms = (time.perf_counter() - t0) / reps * 1000
        results[name] = round(ms, 2)
        print(f"{name:8s} {ms:8.2f} ms/batch", flush=True)

    # on-device bit-exactness: pallas vs topk on valid rows (+ masks)
    ref = fns["topk"](wdev, cdev)
    out = fns["pallas"](wdev, cdev)
    vm = np.asarray(ref.valid)
    assert (np.asarray(out.valid) == vm).all()
    assert (np.asarray(out.codes)[vm] == np.asarray(ref.codes)[vm]).all()
    assert (np.asarray(out.pos)[vm] == np.asarray(ref.pos)[vm]).all()
    assert (np.asarray(out.overflow) == np.asarray(ref.overflow)).all()
    print("pallas == topk on device: OK", flush=True)

    print(json.dumps({
        "metric": "region-table build ms/batch by mechanism",
        "batch": B, "capacity": K,
        "component_ms": results,
        "value": results.get("pallas"),
        "unit": "ms/batch (pallas)",
    }), flush=True)


if __name__ == "__main__":
    main()
