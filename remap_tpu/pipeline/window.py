"""Action-window scan stage (aws.hpp:98-156 on TPU).

Frames stream through the device in batches: one small program advances
the persistent equality heatmap for the whole batch and flags which frames
actually changed it; the host labels only the changed states
(ops.aws.best_contour_jit — the heatmap stabilizes within a handful of
frames, so labeling is rare) and runs the tiny growth/stagnation
acceptance machine over the per-frame scalars:

- a changed (color-0) winning contour that grew resets stagnation and
  updates the tracked window (aws.hpp:129-139),
- the window is accepted once ``area > screen/3``, bbox height > 2H/5 and
  width > 2W/3 (inclusive-coordinate differences, i.e. real size minus 1),
- the scan stops after ``stagnation_limit`` stagnant frames once a window
  is accepted (aws.hpp:118-144).
"""

from __future__ import annotations

from typing import Iterable, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from remap_tpu.config import PipelineConfig
from remap_tpu.core.geometry import Rect
from remap_tpu.ops import aws as aws_ops
from remap_tpu.spec.aws import WindowInfo


def scan(
    frames: Iterable[np.ndarray],
    cfg: PipelineConfig,
) -> Optional[WindowInfo]:
    it = iter(frames)
    first = next(it, None)
    if first is None:
        return None
    h, w = first.shape
    robust = cfg.discovery == "robust"

    min_area = (w * h) // cfg.aws_min_area_divisor
    min_height = cfg.aws_min_height_num * h // cfg.aws_min_height_den
    min_width = cfg.aws_min_width_num * w // cfg.aws_min_width_den

    # parity: binary always-static heatmap; robust: per-pixel change
    # event counts (debounced — see config.discovery)
    if robust:
        carry = jnp.zeros((h, w), jnp.int32)
    else:
        carry = jnp.ones((h, w), jnp.uint8)
    prev = jnp.asarray(first)

    result: Optional[Rect] = None
    area = 0
    stagnation = 0
    b = cfg.frame_batch
    #: best-contour scalars of the latest labeled heatmap state
    last: Optional[Tuple] = None

    done = False
    while not done:
        batch = []
        while len(batch) < b:
            nxt = next(it, None)
            if nxt is None:
                done = True
                break
            batch.append(nxt)
        if not batch:
            break
        n_real = len(batch)
        padded = batch + [batch[-1]] * (b - n_real)
        if robust:
            heatmaps, changed, carry = aws_ops.robust_scan_batch(
                prev, jnp.asarray(np.stack(padded)), carry,
                cfg.aws_change_tolerance,
            )
        else:
            heatmaps, changed = aws_ops.scan_batch(
                prev, jnp.asarray(np.stack(padded)), carry
            )
        changed_np = np.asarray(changed)[:n_real]

        for i in range(n_real):
            if stagnation > cfg.aws_stagnation_limit:
                done = True
                break
            if changed_np[i] or last is None:
                fn = (
                    aws_ops.robust_best_contour_jit
                    if robust
                    else aws_ops.best_contour_jit
                )
                last = np.asarray(fn(heatmaps[i]))
            color, carea, cbbox = last[0], last[1], last[2:]
            if color == 0 and carea > area:
                stagnation = 0
                area = int(carea)
                if robust:
                    # true pixel bbox — no cdt::limits running-max quirk
                    window = Rect(
                        left=int(cbbox[0]),
                        top=int(cbbox[1]),
                        right=int(cbbox[2]),
                        bottom=int(cbbox[3]),
                    )
                    width_q = window.right - window.left
                else:
                    # cbbox[0] is the quirky enclosure lower_ (ops.aws:
                    # sentinel w = unset/SIZE_MAX); width wraps unsigned
                    # like the reference's (aws.hpp:110-139,
                    # cdt.hpp:192-195)
                    left_q = int(cbbox[0])
                    if left_q >= w:
                        left_q = 2**64 - 1
                    window = Rect(
                        left=left_q,
                        top=int(cbbox[1]),
                        right=int(cbbox[2]),
                        bottom=int(cbbox[3]),
                    )
                    width_q = (window.right - left_q) % 2**64
                if result is not None or (
                    area > min_area
                    and window.height > min_height
                    and width_q > min_width
                ):
                    result = window
            if result is not None:
                stagnation += 1

        if not robust:
            carry = heatmaps[n_real - 1]
        prev = jnp.asarray(batch[n_real - 1])

    if result is None:
        return None
    return WindowInfo(raw_bounds=result)
