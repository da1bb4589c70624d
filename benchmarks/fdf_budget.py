#!/usr/bin/env python
"""Per-op device budget of the foreground (fdf) stage at NES shapes.

The five-stage e2e wall attributes ~50-75% to fdf depending on ambient
tunnel load (BENCHMARKS.md round-4 re-measure); this script isolates the
stage's device components on ONE warmed [B, H, W] batch so the wall can
be split into compute vs link vs ambient:

  1. packed gather from the HBM mirror + device unpack
  2. median recompute (Pallas dense extract — the default
     store_medians=False path, fde.hpp medians are a pure frame function)
  3. background equality mask (vmapped roll-window compare)
  4. connected components + stats (Pallas segmented scan)
  5. component-gated foreground masks
  6. masked vote blit into the fragment canvas

Timing protocol (tunnel-safe, see BENCHMARKS.md "measurement traps"):
each component is dispatched CHAIN_N times back-to-back with a data
dependency, then ONE scalar of the last result is fetched; per-op time =
wall / CHAIN_N.  block_until_ready is not a barrier through the tunnel.

Usage: python benchmarks/fdf_budget.py [--batch 256] [--chain 16]
"""

import argparse
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timed(name, fn, chain, *args):
    """Warm once, then dispatch `chain` iterations back-to-back (the
    device queue serializes them) and fetch ONE element of the last
    output to force completion of the whole chain."""
    out = fn(*args)
    leaf = out[0] if isinstance(out, tuple) else out
    _ = float(np.asarray(leaf.ravel()[0]))  # warm + barrier
    t0 = time.perf_counter()
    for _ in range(chain):
        out = fn(*args)
        leaf = out[0] if isinstance(out, tuple) else out
    _ = float(np.asarray(leaf.ravel()[0]))
    ms = (time.perf_counter() - t0) / chain * 1000
    print(f"{name:42s} {ms:8.2f} ms/batch", flush=True)
    return ms


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--chain", type=int, default=16)
    ap.add_argument("--height", type=int, default=208)
    ap.add_argument("--width", type=int, default=240)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from remap_tpu.utils.runtime import setup_cache

    setup_cache()

    from remap_tpu.config import PipelineConfig
    from remap_tpu.core.regions import make_layout
    from remap_tpu.ops import atlas as atlas_ops
    from remap_tpu.ops import fde as fde_ops
    from remap_tpu.ops import kpe as kpe_ops
    from remap_tpu.ops.pallas import cc as pcc
    from remap_tpu.pipeline.collect import _unpack_jit
    from remap_tpu.pipeline.state import pack_nibbles_batch

    use_pallas = jax.devices()[0].platform in ("tpu", "axon")
    B, H, W = args.batch, args.height, args.width  # default: NES window
    ch, cw = H + 72, W + 80
    rng = np.random.default_rng(7)

    frames = rng.integers(0, 16, size=(B, H, W), dtype=np.uint8)
    packed_np = pack_nibbles_batch(frames)
    packed = jnp.asarray(packed_np)
    background = jnp.asarray(
        rng.integers(0, 16, size=(ch, cw), dtype=np.uint8)
    )
    apos_np = np.stack(
        [rng.integers(0, cw - W, B), rng.integers(0, ch - H, B)], axis=1
    ).astype(np.int32)
    apos = jnp.asarray(apos_np)

    # second regime: tiled world + one small sprite per frame — the
    # production shape of fdf's inputs (changed = sprite pixels only,
    # a handful of KEPT components per frame).  iid noise above is the
    # adversarial regime: ~every pixel is a kept root, so the mask
    # assembly's exactness fallback (dense fill) runs; real content
    # takes the compacted-roots path.  Same programs, different data.
    tile = 16
    tbase = rng.integers(0, 16, size=(ch // tile + 1, cw // tile + 1))
    tworld = np.kron(tbase, np.ones((tile, tile), int))[:ch, :cw].astype(
        np.uint8
    )
    tframes = np.empty((B, H, W), np.uint8)
    for i in range(B):
        x, y = apos_np[i]
        crop = tworld[y : y + H, x : x + W].copy()
        sx = rng.integers(0, W - 16)
        sy = rng.integers(0, H - 12)
        crop[sy : sy + 12, sx : sx + 16] = rng.integers(
            0, 16, size=(12, 16), dtype=np.uint8
        )
        tframes[i] = crop
    t_background = jnp.asarray(tworld)
    t_imgs = jnp.asarray(tframes)
    dots0 = jnp.zeros((ch, cw, atlas_ops.DEPTH), jnp.uint16)
    cfg = PipelineConfig(screen_width=W, screen_height=H)

    walls = {}

    # 1. device unpack of an already-resident packed batch (the HBM
    # mirror gather is a [B]-row take: included)
    idx = jnp.asarray(np.arange(B, dtype=np.int32))
    unpack = jax.jit(lambda p, i: _unpack_jit(p[i], W))
    walls["unpack+gather"] = timed(
        "packed gather + device unpack", unpack, args.chain, packed, idx
    )
    imgs = unpack(packed, idx)

    # 2. median recompute (the default fdf path)
    layout = make_layout(W, H, 1, 1, 0)
    med_fn = jax.jit(
        lambda f: kpe_ops.extract_dense(f, layout, use_pallas).median
    )
    walls["median recompute"] = timed(
        "median recompute (dense extract)", med_fn, args.chain, imgs
    )
    medians = med_fn(imgs)

    # 3. equality mask vs background
    eq_fn = jax.jit(
        lambda bg, f, p: jax.vmap(
            lambda fr, po: ~fde_ops.equality_mask(bg, fr, po)
        )(f, p)
    )
    walls["equality mask"] = timed(
        "background equality mask", eq_fn, args.chain, background, imgs,
        apos,
    )
    changed = eq_fn(background, imgs, apos)

    # 4. CC + stats
    if use_pallas and pcc.supports_stats(H, W):
        cc_fn = jax.jit(lambda m, c: pcc.label_stats_batch(m, c))
        walls["cc+stats"] = timed(
            "connected components + stats (Pallas)", cc_fn, args.chain,
            medians, changed,
        )
    else:
        from remap_tpu.ops import cc as cc_ops

        cc_fn = jax.jit(lambda m, c: (jax.vmap(cc_ops.label_components)(m),))
        walls["cc+stats"] = timed(
            "connected components (XLA scan)", cc_fn, args.chain,
            medians, changed,
        )

    # 4b. mask-assembly pieces (the gap between the component sum and
    # the fused total lives here)
    if use_pallas and pcc.supports_stats(H, W):
        labels, stats = cc_fn(medians, changed)
        from remap_tpu.ops import cc as cc_ops

        big = H * W
        seg_fn = jax.jit(
            lambda lab: jax.vmap(
                lambda s, i: jax.ops.segment_sum(
                    jnp.where(i, 1, 0), s, num_segments=big
                )
            )(jnp.clip(lab.reshape(args.batch, -1), 0, big - 1),
              lab.reshape(args.batch, -1) < big)
        )
        walls["area segment_sum"] = timed(
            "area segment_sum (scatter-add)", seg_fn, args.chain, labels
        )
        ql_fn = jax.jit(cc_ops.quirky_fill_left_batch)
        walls["quirky_fill_left"] = timed(
            "quirky_fill_left_batch", ql_fn, args.chain, labels
        )
        masks_fn = jax.jit(
            lambda lab, st: fde_ops._masks_from_stats(
                lab, st, (H * W) // cfg.fde_area_divisor
            )
        )
        walls["masks_from_stats"] = timed(
            "_masks_from_stats (full assembly)", masks_fn, args.chain,
            labels, stats,
        )
        # sorted-assembly bisect: each cut early-returns, so XLA prunes
        # everything the cut's output does not need — the row DIFFS
        # attribute the assembly (sort -> +scans -> +fill / +unperm)
        if H * W * (W + 1) < (1 << 31):
            limit = (H * W) // cfg.fde_area_divisor
            for cut in ("sort", "scans", "fill", "unperm", None):
                fn = jax.jit(functools.partial(
                    fde_ops._masks_from_stats_sorted,
                    area_limit=limit, _until=cut,
                ))
                walls[f"sorted[{cut or 'total'}]"] = timed(
                    f"_masks_from_stats_sorted (until {cut or 'total'})",
                    fn, args.chain, labels, stats,
                )

    # 4c. labels-only path (no stats kernel — the scoped-VMEM ceiling
    # route used by >=~79k-padded-px screens: 272x372 gameplay, VGA+)
    if use_pallas and H * W * (max(H, W) + 1) < (1 << 31):
        lab_fn = jax.jit(
            pcc.label_components_batch
            if pcc.supports(H, W)
            else pcc.label_components_banded
        )
        walls["cc labels-only"] = timed(
            "connected components, labels only", lab_fn, args.chain,
            medians,
        )
        labels_lo = lab_fn(medians)
        limit = (H * W) // cfg.fde_area_divisor
        for cut in ("sort", "scans", "fill", "unperm", None):
            fn = jax.jit(functools.partial(
                fde_ops._masks_from_labels_sorted,
                area_limit=limit, _until=cut,
            ))
            walls[f"labsorted[{cut or 'total'}]"] = timed(
                f"labels-sorted (until {cut or 'total'})",
                fn, args.chain, labels_lo, changed,
            )

    # 5. whole extract_batch (1+2+3+4+mask assembly fused by XLA)
    ex_fn = jax.jit(
        lambda bg, f, p: fde_ops.extract_batch(
            bg, f, None, p,
            area_divisor=cfg.fde_area_divisor,
            compute_medians=True, use_pallas=use_pallas,
        )
    )
    walls["extract_batch total"] = timed(
        "fde.extract_batch (fused total)", ex_fn, args.chain, background,
        imgs, apos,
    )
    fg = ex_fn(background, imgs, apos)

    # 6. masked vote blit
    blit_fn = jax.jit(
        lambda f, m, d: atlas_ops.blit_frames(
            f, apos, atlas_h=ch, atlas_w=cw, masks=m, dots=d
        )
    )
    walls["masked blit"] = timed(
        "masked vote blit (XLA)", blit_fn, args.chain, imgs, fg, dots0
    )

    per_batch = walls["unpack+gather"] + walls["median recompute"] + \
        walls["equality mask"] + walls["cc+stats"] + walls["masked blit"]
    fused = walls["unpack+gather"] + walls["extract_batch total"] + \
        walls["masked blit"]
    print(json.dumps({
        "metric": "fdf per-batch device budget (compute floor)",
        "regime": "noise (adversarial: ~all pixels kept roots)",
        "batch": B,
        "component_ms": {k: round(v, 2) for k, v in walls.items()},
        "sum_unfused_ms": round(per_batch, 2),
        "pipeline_path_ms": round(fused, 2),
        "value": round(B / (fused / 1000), 1),
        "unit": "frames/sec/chip (fdf device compute only)",
    }), flush=True)

    # ---- tiles regime: same compiled programs, production-shaped data
    twalls = {}
    t_changed = eq_fn(t_background, t_imgs, apos)
    t_medians = med_fn(t_imgs)
    if use_pallas and pcc.supports_stats(H, W):
        twalls["cc+stats"] = timed(
            "[tiles] cc + stats (Pallas)", cc_fn, args.chain, t_medians,
            t_changed,
        )
        t_labels, t_stats = cc_fn(t_medians, t_changed)
        twalls["masks_from_stats"] = timed(
            "[tiles] _masks_from_stats (scatter)", masks_fn, args.chain,
            t_labels, t_stats,
        )
        if H * W * (W + 1) < (1 << 31):
            limit = (H * W) // cfg.fde_area_divisor
            for cut in ("sort", "scans", "fill", "unperm", None):
                fn = jax.jit(functools.partial(
                    fde_ops._masks_from_stats_sorted,
                    area_limit=limit, _until=cut,
                ))
                twalls[f"sorted[{cut or 'total'}]"] = timed(
                    f"[tiles] sorted (until {cut or 'total'})",
                    fn, args.chain, t_labels, t_stats,
                )
            # on-device exactness cross-check of the two formulations
            # on this data (one scalar fetched)
            mism = int(np.asarray(jax.jit(
                lambda lab, st: jnp.sum(
                    fde_ops._masks_from_stats(lab, st, limit)
                    != fde_ops._masks_from_stats_sorted(lab, st, limit)
                )
            )(t_labels, t_stats)))
            print(f"[tiles] sorted-vs-scatter mismatches: {mism}",
                  flush=True)
            assert mism == 0, "mask assembly formulations diverge"
    if use_pallas and H * W * (max(H, W) + 1) < (1 << 31):
        limit = (H * W) // cfg.fde_area_divisor
        t_labels_lo = lab_fn(t_medians)
        for cut in ("sort", "scans", "fill", "unperm", None):
            fn = jax.jit(functools.partial(
                fde_ops._masks_from_labels_sorted,
                area_limit=limit, _until=cut,
            ))
            twalls[f"labsorted[{cut or 'total'}]"] = timed(
                f"[tiles] labels-sorted (until {cut or 'total'})",
                fn, args.chain, t_labels_lo, t_changed,
            )
        # exactness cross-check: labels-only vs the scatter original
        # fed kernel-free stats derived on device from labels+changed
        if use_pallas and pcc.supports_stats(H, W):
            mism = int(np.asarray(jax.jit(
                lambda lab, st, chg: jnp.sum(
                    fde_ops._masks_from_stats(lab, st, limit)
                    != fde_ops._masks_from_labels_sorted(lab, chg, limit)
                )
            )(t_labels, t_stats, t_changed)))
            print(f"[tiles] labels-sorted-vs-scatter mismatches: {mism}",
                  flush=True)
            assert mism == 0, "labels-only assembly diverges"
    twalls["extract_batch total"] = timed(
        "[tiles] fde.extract_batch (fused total)", ex_fn, args.chain,
        t_background, t_imgs, apos,
    )
    t_fused = walls["unpack+gather"] + twalls["extract_batch total"] + \
        walls["masked blit"]
    print(json.dumps({
        "metric": "fdf per-batch device budget (compute floor)",
        "regime": "tiles+sprite (production-shaped: few kept roots)",
        "batch": B,
        "component_ms": {k: round(v, 2) for k, v in twalls.items()},
        "pipeline_path_ms": round(t_fused, 2),
        "value": round(B / (t_fused / 1000), 1),
        "unit": "frames/sec/chip (fdf device compute only)",
    }), flush=True)

    # ---- poisoned regime: production tiles with ONE iid-noise frame.
    # The per-frame escalation (fde._escalated_fill tier 2) must keep
    # this within ~1.2x the clean tiles wall — one adversarial frame
    # rides the static dense subset while the rest of the batch stays
    # on the compacted path (round-4 verdict weak #3).
    p_imgs = t_imgs.at[0].set(jnp.asarray(frames[0]))
    pwalls = {
        "extract_batch total": timed(
            "[poisoned] fde.extract_batch (fused total)", ex_fn,
            args.chain, t_background, p_imgs, apos,
        )
    }
    p_fused = walls["unpack+gather"] + pwalls["extract_batch total"] + \
        walls["masked blit"]
    print(json.dumps({
        "metric": "fdf per-batch device budget (compute floor)",
        "regime": "tiles + 1 poisoned frame (per-frame escalation)",
        "batch": B,
        "component_ms": {k: round(v, 2) for k, v in pwalls.items()},
        "pipeline_path_ms": round(p_fused, 2),
        "vs_clean_tiles": round(p_fused / t_fused, 3),
        "value": round(B / (p_fused / 1000), 1),
        "unit": "frames/sec/chip (fdf device compute only)",
    }), flush=True)


if __name__ == "__main__":
    main()
