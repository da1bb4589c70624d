"""Spec: contour (connected-component) extraction (cte.hpp, ctr.hpp).

Components are 4-connected regions of *equal pixel value* restricted to the
interior ``[1, H-1) x [1, W-1)`` — the 1-pixel border is a "horizon" frame
that bounds the flood fill (cte.hpp:149-166).  A component becomes a contour
iff it contains at least one *predicate-true* pixel; the predicate is tested
only on scan seeds (cte.hpp:93-99), so one true pixel pulls in the whole
equal-valued component.  Contours are numbered in row-major order of each
component's first predicate-true pixel.

Per contour the observable state is: area (pixel count), color, the
inclusive bounding box derived from edge pixels (ctr.hpp:96-109 — equal to
the component's pixel bbox, since every row's extreme pixels carry
horizontal edges), and the exact pixel mask (ctr::contour::recover's
scanline refill reproduces the component's pixels exactly: every maximal
horizontal run contributes its left/right edge pair, ctr.hpp:151-170).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

from remap_tpu.core.geometry import Rect


@dataclasses.dataclass(eq=False)
class Contour:
    id: int                  # 1-based, discovery order (cte.hpp:96-98)
    color: int
    area: int
    bbox: Rect               # inclusive right/bottom (ctr.hpp:96-109)
    label: int               # value in the labels matrix


@dataclasses.dataclass(eq=False)
class ContoursResult:
    labels: np.ndarray       # [H, W] int32; 0 = border (never a component)
    contours: List[Contour]

    def mask_of(self, contour: Contour) -> np.ndarray:
        return self.labels == contour.label


def label_components(image: np.ndarray) -> np.ndarray:
    """4-connected equal-value components of the interior; 0 on the border.

    Labels are assigned in row-major order of each component's first pixel,
    starting at 1 (matching the reference's seed order, cte.hpp:65-79).

    The interior is ``[1, H-2) x [1, W-1)``: the horizon border covers the
    *two bottom-most rows*, not one — cte::clear_outline's side-border loop
    stops ``2 * width`` before the zeroed block's end and the final loop
    horizons everything after it (cte.hpp:155-165), exactly like kpe's
    ``H - kernel_half - 2`` bound.  Verified against the compiled
    reference (tests/differential/).
    """
    h, w = image.shape
    labels = np.zeros((h, w), dtype=np.int32)
    next_label = 1
    for y in range(1, h - 2):
        for x in range(1, w - 1):
            if labels[y, x] != 0:
                continue
            v = image[y, x]
            lab = next_label
            next_label += 1
            stack = [(y, x)]
            labels[y, x] = lab
            while stack:
                cy, cx = stack.pop()
                for ny, nx in (
                    (cy, cx - 1),
                    (cy, cx + 1),
                    (cy - 1, cx),
                    (cy + 1, cx),
                ):
                    if (
                        1 <= ny < h - 2
                        and 1 <= nx < w - 1
                        and labels[ny, nx] == 0
                        and image[ny, nx] == v
                    ):
                        labels[ny, nx] = lab
                        stack.append((ny, nx))
    return labels


def extract(
    image: np.ndarray,
    pred_mask: Optional[np.ndarray] = None,
) -> ContoursResult:
    """cte::extractor::extract(image, pred) (cte.hpp:64-79).

    ``pred_mask`` ([H, W] bool) gates which components are *extracted* (the
    reference tests the predicate on seed pixels in row-major order); the
    component itself always spans all equal-valued connected pixels.
    """
    h, w = image.shape
    labels = label_components(image)
    flat = labels.ravel()
    n = int(flat.max()) + 1

    areas = np.bincount(flat, minlength=n)

    ys, xs = np.indices((h, w))
    left = np.full(n, w, dtype=np.int64)
    right = np.full(n, -1, dtype=np.int64)
    top = np.full(n, h, dtype=np.int64)
    bottom = np.full(n, -1, dtype=np.int64)
    np.minimum.at(left, flat, xs.ravel())
    np.maximum.at(right, flat, xs.ravel())
    np.minimum.at(top, flat, ys.ravel())
    np.maximum.at(bottom, flat, ys.ravel())

    # Row-major index of each component's first predicate-true pixel.
    if pred_mask is None:
        pm = np.ones((h, w), dtype=bool)
    else:
        pm = pred_mask.astype(bool)
    first = np.full(n, h * w, dtype=np.int64)
    sel = pm.ravel() & (flat > 0)
    np.minimum.at(first, flat[sel], np.nonzero(sel)[0])

    order = [lab for lab in np.argsort(first, kind="stable") if first[lab] < h * w]

    img_flat = image.ravel()
    contours: List[Contour] = []
    for lab in order:
        contours.append(
            Contour(
                id=len(contours) + 1,
                color=int(img_flat[first[lab]]),
                area=int(areas[lab]),
                bbox=Rect(
                    left=int(left[lab]),
                    top=int(top[lab]),
                    right=int(right[lab]),
                    bottom=int(bottom[lab]),
                ),
                label=int(lab),
            )
        )
    return ContoursResult(labels=labels, contours=contours)
