#!/usr/bin/env python
"""Chip-utilization accounting for the streaming step's kernels.

Round-4 verdict: every published number was fps/ms — nobody could say
whether the streaming step sits at 10% or 60% of roofline.  This script
places each component of the flagship streaming pipeline against the
chip's ceilings:

- **measured ms/batch** with the chained-dispatch + fetch-one-element
  protocol (BENCHMARKS.md measurement traps);
- **bytes accessed + flops from XLA's own cost model**
  (``compiled.cost_analysis()``) — the compiler's accounting of HBM
  traffic and arithmetic for the exact program measured;
- achieved GB/s and GFLOP/s as a fraction of the v5e-class ceilings
  (HBM ~819 GB/s; MXU ~197 TFLOP/s bf16 — int8 ops and VPU-bound
  kernels are labeled, their ceiling differs);
- a ``jax.profiler`` device trace of the full streaming step saved to
  ``--trace-dir`` (view with xprof/tensorboard), the artifact the
  BENCHMARKS table cites.

Usage: python benchmarks/roofline.py [--batch 256] [--cap 640]
       [--trace-dir /tmp/remap_tpu_trace]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

HBM_GBPS = 819.0          # v5e-class HBM bandwidth ceiling
MXU_TFLOPS = 197.0        # v5e-class bf16 MXU ceiling
VPU_TOPS = 3.9            # ~8x128 lanes x 4 ALUs x ~0.94 GHz (int32)


def timed(fn, args, chain=16, secs=4.0):
    out = fn(*args)
    leaf = jax_leaf(out)
    _ = np.asarray(leaf.ravel()[0])
    t0 = time.perf_counter()
    reps = 0
    while time.perf_counter() - t0 < secs:
        for _i in range(chain):
            out = fn(*args)
            reps += 1
        _ = np.asarray(jax_leaf(out).ravel()[0])
    return (time.perf_counter() - t0) / reps * 1000


def jax_leaf(out):
    import jax

    return jax.tree.leaves(out)[0]


def analyze(name, fn, args, rows, chain=16):
    import jax

    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    cost = compiled.cost_analysis() or {}
    flops = float(cost.get("flops", 0.0))
    byts = float(cost.get("bytes accessed", 0.0))
    ms = timed(jax.jit(fn), args, chain=chain)
    gbps = byts / 1e9 / (ms / 1000) if ms else 0.0
    gflops = flops / 1e9 / (ms / 1000) if ms else 0.0
    rows.append({
        "kernel": name,
        "ms": round(ms, 2),
        "bytes_GB": round(byts / 1e9, 3),
        "achieved_GBps": round(gbps, 1),
        "pct_hbm_roofline": round(100 * gbps / HBM_GBPS, 1),
        "flops_G": round(flops / 1e9, 2),
        "achieved_GFLOPs": round(gflops, 1),
        "pct_mxu_roofline": round(100 * gflops / 1e3 / MXU_TFLOPS, 2),
    })
    r = rows[-1]
    print(f"{name:28s} {r['ms']:8.2f} ms  {r['bytes_GB']:7.3f} GB "
          f"{r['achieved_GBps']:7.1f} GB/s ({r['pct_hbm_roofline']:5.1f}% "
          f"HBM)  {r['achieved_GFLOPs']:9.1f} GFLOP/s "
          f"({r['pct_mxu_roofline']:5.2f}% MXU)", flush=True)
    return r


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--cap", type=int, default=640)
    ap.add_argument("--trace-dir", default="/tmp/remap_tpu_trace")
    args = ap.parse_args()

    from remap_tpu.utils.runtime import setup_cache

    setup_cache()

    import jax
    import jax.numpy as jnp

    from remap_tpu.config import PipelineConfig
    from remap_tpu.core.regions import make_layout
    from remap_tpu.ops import kpe as kpe_ops
    from remap_tpu.ops import kpm as kpm_ops
    from remap_tpu.ops import tables as xtables
    from remap_tpu.ops.pallas import tables as ptables
    from remap_tpu.parallel.sharded import make_streaming_step
    from remap_tpu.utils.profiling import device_trace

    H, W, B, K = 240, 256, args.batch, args.cap
    cfg = PipelineConfig(
        screen_width=W, screen_height=H, region_capacity=K,
        join_multiplicity=1, frame_batch=B, vote_radius=16,
    )
    layout = make_layout(W, H, cfg.grid_width, cfg.grid_height,
                         cfg.grid_overlap)
    use_pallas = jax.devices()[0].platform in ("tpu", "axon")

    import bench

    frames = bench.make_clip(B, H, W)
    fdev = jnp.asarray(frames)

    rows = []

    # 1. fused extract (Pallas): frames -> weight/codes/median
    ext = lambda im: kpe_ops.extract_dense(im, layout, use_pallas)
    analyze("extract (Pallas fused)", ext, (fdev,), rows)
    dense = jax.jit(ext)(fdev)

    # 2. region tables (Pallas shift network)
    tab = lambda w, c: ptables.build_tables_pallas(w, c, layout, K)
    analyze("tables (Pallas shift-net)", tab, (dense.weight, dense.codes),
            rows)
    # 2b. the XLA sort2 formulation it replaced, for contrast
    tab2 = lambda w, c: xtables.build_tables(w, c, layout, K, "sort2")
    analyze("tables (XLA sort2)", tab2, (dense.weight, dense.codes), rows)
    tabs = jax.jit(tab)(dense.weight, dense.codes)

    # 3. consecutive-pair match (sort-merge join + MXU vote histogram)
    prev = jax.tree.map(lambda a: a[:-1], tabs)
    curr = jax.tree.map(lambda a: a[1:], tabs)
    mat = lambda p, c: kpm_ops.match_tables(
        p, c, layout,
        weight_switch=cfg.match.weight_switch,
        region_votes=cfg.match.region_votes,
        min_active_divisor=cfg.min_active_divisor,
        runner_up_divisor=cfg.runner_up_divisor,
        multiplicity=cfg.join_multiplicity,
        vote_radius=cfg.vote_radius,
    )
    analyze("match (join + MXU votes)", mat, (prev, curr), rows)

    # 4. the full streaming step (extract+tables+match+positions+blit)
    init_state, sstep = make_streaming_step(layout, cfg, atlas_pad=128)
    sstep_j = jax.jit(sstep)
    state = init_state()
    full_ms = None
    lowered = jax.jit(sstep).lower(fdev, state)
    cost = lowered.compile().cost_analysis() or {}
    out = sstep_j(fdev, state)
    np.asarray(out[1])
    state = out[-1]
    t0 = time.perf_counter()
    reps = 0
    while time.perf_counter() - t0 < 6.0:
        for _ in range(16):
            out = sstep_j(fdev, state)
            state = out[-1]
            reps += 1
        np.asarray(out[0])
    full_ms = (time.perf_counter() - t0) / reps * 1000
    byts = float(cost.get("bytes accessed", 0.0))
    flops = float(cost.get("flops", 0.0))
    rows.append({
        "kernel": "FULL streaming step",
        "ms": round(full_ms, 2),
        "bytes_GB": round(byts / 1e9, 3),
        "achieved_GBps": round(byts / 1e9 / (full_ms / 1e3), 1),
        "pct_hbm_roofline": round(
            100 * byts / 1e9 / (full_ms / 1e3) / HBM_GBPS, 1),
        "flops_G": round(flops / 1e9, 2),
        "achieved_GFLOPs": round(flops / 1e9 / (full_ms / 1e3), 1),
        "pct_mxu_roofline": round(
            100 * flops / 1e9 / (full_ms / 1e3) / 1e3 / MXU_TFLOPS, 2),
    })
    r = rows[-1]
    print(f"{r['kernel']:28s} {r['ms']:8.2f} ms  {r['bytes_GB']:7.3f} GB "
          f"{r['achieved_GBps']:7.1f} GB/s ({r['pct_hbm_roofline']:5.1f}% "
          f"HBM)  {r['achieved_GFLOPs']:9.1f} GFLOP/s "
          f"({r['pct_mxu_roofline']:5.2f}% MXU)", flush=True)

    # 5. device trace artifact of a few chained steps
    with device_trace(args.trace_dir):
        for _ in range(8):
            out = sstep_j(fdev, state)
            state = out[-1]
        np.asarray(out[0])
    print(f"trace artifact: {args.trace_dir}", flush=True)

    fps = B / (full_ms / 1000)
    print(json.dumps({
        "metric": "streaming-step roofline accounting",
        "batch": B, "capacity": K,
        "rows": rows,
        "trace_dir": args.trace_dir,
        "value": round(fps, 1),
        "unit": "frames/sec/chip (clean-sync step rate)",
    }), flush=True)


if __name__ == "__main__":
    main()
