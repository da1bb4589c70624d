"""Keypoint-grid region band layout.

The extractor routes keypoints into a ``grid_width x grid_height`` grid of
regions; bands of ``overlap`` pixels at section boundaries belong to *both*
adjacent sections (kpe.hpp:149-306, kpr.hpp:40-91).  The reference encodes
this as a compile-time-unrolled pointer walk; here it is plain static
arithmetic shared by the NumPy spec and the JAX kernels, so both agree on
the exact (quirky) bounds:

- Horizontal: centers start at ``kh = kernel_half``; exclusive bands are
  ``rw = W // grid_w - overlap // 2`` wide; the final section runs to
  ``W - kh`` (exclusive).  (kpe.hpp:84-90, 157-192)
- Vertical: the first processed row ``y = kh`` is handled separately and
  always belongs to section 0 (kpe.hpp:223-229); exclusive bands of
  ``rh = H // grid_h - overlap // 2`` rows then start at ``kh + 1``, and the
  final section ends at ``H - kh - 2`` (exclusive) — i.e. the *two
  bottom-most* interior rows are never processed, a reference quirk
  (kpe.hpp:264-271: ``last = col + height - kernel_half`` bounds the sliding
  window's bottom row, not the center).

A region ``(xs, ys)`` therefore covers the contiguous rectangle
``x in [x_lo[xs], x_hi[xs]) × y in [y_lo[ys], y_hi[ys])`` and its flat index
is ``xs * grid_height + ys`` (kpr.hpp:68-91: outer = column section,
inner = row section, stride = grid height).
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple


@dataclasses.dataclass(frozen=True)
class GridLayout:
    width: int                      # image width
    height: int                     # image height
    grid_w: int
    grid_h: int
    overlap: int
    kernel_half: int

    # Per-section inclusive-exclusive intervals.
    x_spans: Tuple[Tuple[int, int], ...]
    y_spans: Tuple[Tuple[int, int], ...]

    @property
    def region_count(self) -> int:
        return self.grid_w * self.grid_h

    @property
    def x_proc(self) -> Tuple[int, int]:
        """Processed center columns [lo, hi)."""
        return (self.kernel_half, self.width - self.kernel_half)

    @property
    def y_proc(self) -> Tuple[int, int]:
        """Processed center rows [lo, hi) — note the -2 quirk (module doc)."""
        return (self.kernel_half, self.height - self.kernel_half - 2)

    def region_span(self, xs: int, ys: int) -> Tuple[int, int, int, int]:
        """(x_lo, x_hi, y_lo, y_hi) of region (xs, ys)."""
        xl, xh = self.x_spans[xs]
        yl, yh = self.y_spans[ys]
        return xl, xh, yl, yh

    def region_index(self, xs: int, ys: int) -> int:
        return xs * self.grid_h + ys

    def sections_of_x(self, x: int) -> List[int]:
        return [s for s, (lo, hi) in enumerate(self.x_spans) if lo <= x < hi]

    def sections_of_y(self, y: int) -> List[int]:
        return [s for s, (lo, hi) in enumerate(self.y_spans) if lo <= y < hi]


def make_layout(
    width: int,
    height: int,
    grid_w: int,
    grid_h: int,
    overlap: int,
    kernel_half: int = 2,
) -> GridLayout:
    kh = kernel_half
    # Horizontal sections (kpe.hpp:84-90,157-192): section 0 starts at kh;
    # section s>0 starts ov before the end of the previous exclusive band;
    # all sections except the last end after their shared band.
    rw = width // grid_w - overlap // 2
    x_spans = []
    for s in range(grid_w):
        lo = kh if s == 0 else kh + s * (rw + overlap) - overlap
        hi = width - kh if s == grid_w - 1 else kh + (s + 1) * (rw + overlap)
        x_spans.append((lo, hi))

    # Vertical sections: same shape but offset by the specially-handled
    # first row (lo of section 0 is kh; exclusive bands start at kh+1) and
    # the early final bound height - kh - 2 (module docstring).
    rh = height // grid_h - overlap // 2
    y_spans = []
    for s in range(grid_h):
        lo = kh if s == 0 else kh + 1 + s * (rh + overlap) - overlap
        hi = (
            height - kh - 2
            if s == grid_h - 1
            else kh + 1 + (s + 1) * (rh + overlap)
        )
        y_spans.append((lo, hi))

    return GridLayout(
        width=width,
        height=height,
        grid_w=grid_w,
        grid_h=grid_h,
        overlap=overlap,
        kernel_half=kh,
        x_spans=tuple(x_spans),
        y_spans=tuple(y_spans),
    )
