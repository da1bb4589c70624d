#!/usr/bin/env python
"""Five-stage pipeline on simulated gameplay, ON THE TPU.

The gameplay differentials (tests/differential/test_ref_gameplay.py)
verify byte-equality with the compiled reference on CPU; this script
runs the same platformer content through the TPU build — the one
combination that was impossible before round 4's labels-only mask
assembly (the CC stats kernel failed to compile at the 272x372 action
window, BENCHMARKS.md "fdf mask assembly") — and asserts:

  1. the TPU maps equal the CPU maps byte-for-byte (the repo's
     cross-backend bit-identity claim, now at the gameplay shape),
  2. painted pixels agree with the simulator's ground-truth world.

Usage: python benchmarks/gameplay_e2e_tpu.py [--frames 320] [--seed 3]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

FW, FH = 388, 312     # the reference's fixed screen (main.cpp:199)


def world_agreement(maps, session):
    """(agreement over painted px, painted fraction) at best alignment
    — the logic of test_ref_gameplay._world_truth_agreement, on native
    -palette maps (no RGB round trip)."""
    cam = np.array(session.camera)
    m = max(maps, key=lambda a: a.size)
    mh, mw = m.shape
    painted = m != 0
    y0, x0 = cam[:, 1].min(), cam[:, 0].min()
    wh, ww = session.world.shape
    best = (0.0, 0.0)
    for dy in range(-2, 7):
        for dx in range(-2, 7):
            yy, xx = y0 + dy, x0 + dx
            if yy < 0 or xx < 0 or yy + mh > wh or xx + mw > ww:
                continue
            crop = session.world[yy : yy + mh, xx : xx + mw]
            agree = float((crop == m)[painted].mean())
            if agree > best[0]:
                best = (agree, float(painted.mean()))
    return best


def build(frames, cpu: bool):
    import jax

    if cpu:
        jax.config.update("jax_platforms", "cpu")
    from remap_tpu.config import PipelineConfig
    from remap_tpu.pipeline import builder

    cfg = PipelineConfig(screen_width=FW, screen_height=FH)
    t0 = time.perf_counter()
    res = builder.build_from_frames(frames, cfg)
    wall = time.perf_counter() - t0
    maps = [np.asarray(m) for m in (res.maps if hasattr(res, "maps") else res)]
    return maps, wall


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=320)
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--skip-cpu", action="store_true",
                    help="skip the CPU cross-check (TPU + world truth only)")
    args = ap.parse_args()

    from remap_tpu.utils.runtime import setup_cache

    setup_cache()

    from remap_tpu.utils import gameplay

    session = gameplay.play_session(
        seed=args.seed, n_frames=args.frames, frame_hw=(FH, FW)
    )
    print(f"{args.frames} frames {FH}x{FW} (platformer seed "
          f"{args.seed})", flush=True)

    tpu_maps, tpu_wall = build(session.frames, cpu=False)
    print(f"TPU build: {tpu_wall:8.2f} s, {len(tpu_maps)} map(s)",
          flush=True)
    agree, painted = world_agreement(tpu_maps, session)
    print(f"world-truth agreement {agree:.6f} on {painted:.1%} painted",
          flush=True)
    assert agree >= 0.999, agree
    assert painted >= 0.80, painted

    result = {
        "metric": "gameplay five-stage e2e on TPU (312x388 platformer)",
        "frames": args.frames,
        "tpu_wall_s": round(tpu_wall, 2),
        "value": round(args.frames / tpu_wall, 1),
        "unit": "frames/sec e2e",
        "world_agreement": round(agree, 6),
        "painted": round(painted, 4),
    }

    if not args.skip_cpu:
        # CPU cross-check in a subprocess (jax_platforms is sticky
        # per-process once the TPU client exists)
        import pickle
        import subprocess
        import tempfile

        with tempfile.NamedTemporaryFile(suffix=".pkl", delete=False) as f:
            pickle.dump([np.asarray(m) for m in tpu_maps], f)
            tpath = f.name
        code = (
            "import sys, pickle, numpy as np; sys.path.insert(0, '.');"
            f"sys.argv = ['x', '--frames', '{args.frames}', '--seed',"
            f" '{args.seed}'];"
            "from benchmarks.gameplay_e2e_tpu import build, FH, FW;"
            "from remap_tpu.utils import gameplay;"
            f"s = gameplay.play_session(seed={args.seed},"
            f" n_frames={args.frames}, frame_hw=(FH, FW));"
            "maps, wall = build(s.frames, cpu=True);"
            f"tpu = pickle.load(open('{tpath}', 'rb'));"
            "assert len(maps) == len(tpu), (len(maps), len(tpu));"
            "[np.testing.assert_array_equal(a, b)"
            " for a, b in zip(tpu, maps)];"
            "print(f'CPU build {wall:.2f} s: maps BYTE-IDENTICAL to TPU',"
            " flush=True)"
        )
        t0 = time.perf_counter()
        subprocess.run([sys.executable, "-c", code], check=True)
        result["cpu_cross_check"] = "byte-identical"
        result["cpu_wall_s"] = round(time.perf_counter() - t0, 2)

    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
