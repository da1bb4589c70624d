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
    bbox: Rect               # TRUE pixel bbox, inclusive right/bottom
    label: int               # value in the labels matrix
    #: The reference enclosure's ``lower_`` — its quirky bbox-left
    #: (cdt.hpp:183-190 with ctr.hpp:96-109): ``None`` when unset
    #: (= SIZE_MAX in the reference).  See :func:`quirky_fill_lefts`.
    fill_left: Optional[int] = None


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


def quirky_fill_lefts(labels: np.ndarray) -> np.ndarray:
    """The reference enclosure's ``lower_`` per component label.

    ``cdt::limits::update`` is ``if (v > upper_) upper_ = v; else if
    (v < lower_) lower_ = v;`` (cdt.hpp:183-190), so a value only ever
    reaches ``lower_`` when it is NOT a strict running maximum.
    ``get_enclosure`` feeds it the x of every *horizontal-edge* cell in
    row-major (sorted-position) order (ctr.hpp:96-109; exactly the run
    endpoints — each row's runs contribute their first and last cell,
    a single-cell run once).  Consequence: ``lower_`` = min over
    endpoint xs that are <= the running maximum of all PRIOR endpoint
    xs (with ``upper_`` initialised to 0); when every endpoint is a
    strict running maximum (e.g. any single-row contour), ``lower_``
    stays SIZE_MAX.  This differs from the true bbox-left exactly when
    the minimum x occurs only at the component's first endpoint — found
    live by the round-3 unit-dump differential (1-2 px fde fill diffs
    per affected frame, invisible at map level).

    Returns an int64 array indexed by label: the quirky left, or
    ``labels.shape[1]`` (= w, one past any real x) when unset.
    """
    h, w = labels.shape
    L = labels
    diff_l = np.ones((h, w), bool)
    diff_l[:, 1:] = L[:, 1:] != L[:, :-1]
    diff_r = np.ones((h, w), bool)
    diff_r[:, :-1] = L[:, :-1] != L[:, 1:]
    ep = (diff_l | diff_r) & (L > 0)
    ys, xs = np.nonzero(ep)                     # row-major order
    labs = L[ys, xs]
    n = int(L.max()) + 1
    out = np.full(n, w, dtype=np.int64)
    if len(xs) == 0:
        return out
    order = np.argsort(labs, kind="stable")     # keeps row-major per label
    sl = labs[order]
    sx = xs[order].astype(np.int64)
    starts = np.ones(len(sl), bool)
    starts[1:] = sl[1:] != sl[:-1]
    seg = np.cumsum(starts) - 1
    comb = seg * (w + 1) + sx
    incl = np.maximum.accumulate(comb) - seg * (w + 1)  # segmented cummax
    prior = np.empty_like(incl)
    prior[0] = 0
    prior[1:] = incl[:-1]
    prior[starts] = 0                           # upper_ init (unsigned 0)
    include = sx <= prior
    np.minimum.at(out, sl[include], sx[include])
    return out


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
    fills = quirky_fill_lefts(labels)
    contours: List[Contour] = []
    for lab in order:
        fl = int(fills[lab])
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
                fill_left=None if fl >= w else fl,
            )
        )
    return ContoursResult(labels=labels, contours=contours)
