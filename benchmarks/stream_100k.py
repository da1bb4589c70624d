#!/usr/bin/env python
"""The 100k-frame streaming session, run END TO END (BASELINE config 4).

The sweep rows measure steady-state throughput for a few seconds; this
script actually performs a long session the way a serving deployment
would: the host renders/ingests fixed-size batches of a 100,096-frame
playthrough over a 4096x4096 world (gameplay-shaped camera: held
direction runs and rests, not an iid walk), uploads each batch, and
drives the device-resident streaming step (`make_streaming_step`) whose
atlas + matcher state never leave HBM.  Along the way it verifies, per
batch:

- every frame matched and every declared offset EQUALS the known camera
  delta (a single ±1 mis-track anywhere in the 100k stream would fail),
- zero exactness flags (table / join / vote-range) at the flagship
  fast-path limits, so the static limits provably never bit,
- in-HBM re-anchor events (`_shift_atlas`) are counted as the camera
  drifts across the world — the mechanism that makes UNBOUNDED sessions
  possible in a fixed-size stitch window.

At the end, the retained stitch window is fetched once and every covered
pixel is asserted EQUAL to the ground-truth world at the final anchor.

Usage: python benchmarks/stream_100k.py [--frames N] [--cpu]
Prints one JSON line (wall includes render + upload: the serving loop).
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def make_path(n: int, wh: int, ww: int, fh: int, fw: int,
              rng: np.random.Generator) -> np.ndarray:
    """[n, 2] (x, y) camera positions: held-direction runs + rests."""
    max_y, max_x = wh - fh, ww - fw
    pos = np.empty((n, 2), np.int64)
    x, y = ww // 2, wh // 2
    i = 0
    while i < n:
        run = int(rng.integers(8, 40))
        if rng.random() < 0.15:
            dx = dy = 0                      # rest
        else:
            dx = int(rng.integers(-3, 4))
            dy = int(rng.integers(-3, 4))
        for _ in range(min(run, n - i)):
            x = int(np.clip(x + dx, 0, max_x))
            y = int(np.clip(y + dy, 0, max_y))
            pos[i] = (x, y)
            i += 1
    return pos


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=100_096)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from remap_tpu.utils.runtime import setup_cache

    if args.cpu:
        setup_cache("/root/jax_cache_cpu", per_host=True)
    else:
        setup_cache()

    import jax.numpy as jnp

    from remap_tpu.config import PipelineConfig
    from remap_tpu.core.regions import make_layout
    from remap_tpu.parallel.sharded import make_streaming_step
    from remap_tpu.pipeline.collect import _unpack_jit
    from remap_tpu.pipeline.state import pack_nibbles_batch

    H, W = 240, 256
    B = args.batch
    n = (args.frames // B) * B
    rng = np.random.default_rng(404)
    # bench.py's game-like density recipe: 8-px tiles + 10% pixel noise
    # (~300-500 keypoints/region — testing.make_world's default 4-px/25%
    # overflows the capacity-768 tables on every NES frame)
    wh = ww = 4096
    base = rng.integers(0, 16, size=(wh // 8 + 1, ww // 8 + 1),
                        dtype=np.uint8)
    base = np.kron(base, np.ones((8, 8), np.uint8))[:wh, :ww]
    detail = rng.integers(0, 16, size=(wh, ww), dtype=np.uint8)
    world = np.where(
        rng.random((wh, ww)) < 0.10, detail, base
    ).astype(np.uint8)
    path = make_path(n, wh, ww, H, W, rng)

    cfg = PipelineConfig(
        screen_width=W, screen_height=H,
        region_capacity=768, frame_batch=B,
        join_multiplicity=1, vote_radius=16,
    )
    layout = make_layout(W, H, cfg.grid_width, cfg.grid_height,
                         cfg.grid_overlap)
    # pad >= batch * max_step * 1.5: one batch's position span must fit
    # the resident window (re-anchors happen between batches); 512 px of
    # slack is a ~52 MB uint16 window — cheap HBM insurance
    init, step = make_streaming_step(layout, cfg, atlas_pad=512)
    step = jax.jit(step, donate_argnums=(1,))
    state = init()

    # warm the program outside the timed session
    warm = np.zeros((B, H, W), np.uint8)
    warm[:, ::3, ::5] = np.arange(B, dtype=np.uint8)[:, None, None] % 16
    _, _, _, _, state = step(warm, state)
    state = init()

    def render(lo: int, hi: int) -> np.ndarray:
        return np.stack([
            world[y : y + H, x : x + W] for x, y in path[lo:hi]
        ])

    anchors = []
    n_matched = 0
    n_flags = 0
    pending = []

    def verify(lo, offs, ok, ovf, strayed, anchor) -> None:
        nonlocal n_matched, n_flags
        offs = np.asarray(offs)
        ok = np.asarray(ok)
        assert not bool(np.asarray(strayed)), f"strayed at frame {lo}"
        n_flags += int(np.asarray(ovf.table).sum())
        n_flags += int(np.asarray(ovf.join).sum())
        n_flags += int(np.asarray(ovf.range).sum())
        true = np.diff(path[max(lo - 1, 0) : lo + B], axis=0)
        if lo == 0:
            assert ok[1:].all() and not ok[0]
            np.testing.assert_array_equal(offs[1:], true)
        else:
            assert ok.all()
            np.testing.assert_array_equal(offs, true)
        n_matched += int(ok.sum())
        anchors.append(np.asarray(anchor))

    t0 = time.perf_counter()
    for lo in range(0, n, B):
        # the serving ingest path: packed pixels (2 px/byte) cross the
        # link, nibbles unpack on device (same as pipeline.collect)
        batch = _unpack_jit(jnp.asarray(pack_nibbles_batch(render(lo, lo + B))), W)
        offs, ok, ovf, strayed, state = step(batch, state)
        # the state is donated into the NEXT dispatch; copy the anchor
        # out on device so verification can read it one batch late
        pending.append((lo, offs, ok, ovf, strayed, state.anchor + 0))
        if len(pending) > 1:
            # one-batch-late verification: the blocking fetch of batch
            # i overlaps the render+upload of batch i+1
            verify(*pending.pop(0))
    while pending:
        verify(*pending.pop(0))
    wall = time.perf_counter() - t0

    assert n_flags == 0, f"{n_flags} exactness flags fired"
    re_anchors = int(
        (np.abs(np.diff(np.stack(anchors), axis=0)).sum(axis=1) > 0).sum()
    )

    # the retained stitch window equals the world at the final anchor
    dots = np.asarray(state.dots)
    anchor = np.asarray(state.anchor)
    covered = dots.sum(axis=0) > 0
    ys, xs = np.nonzero(covered)
    wy = ys + anchor[1] + path[0][1]
    wx = xs + anchor[0] + path[0][0]
    np.testing.assert_array_equal(dots.argmax(axis=0)[ys, xs], world[wy, wx])

    print(json.dumps({
        "metric": "100k-frame streaming session, ingest included "
                  f"(re-anchors {re_anchors}, offsets exact, 0 flags)",
        "value": round(n / wall, 1),
        "unit": "frames/sec/chip",
        "frames": n,
        "wall_s": round(wall, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
