"""Spec contour extraction hand cases (cte.hpp/ctr.hpp).

The interior excludes a 1-px frame on the left/top/right and a 2-px band
at the bottom (cte::clear_outline horizons the last TWO rows,
cte.hpp:155-165 — confirmed against the compiled reference in
tests/differential/), so hand cases pad an extra throwaway bottom row.
"""

import numpy as np

from remap_tpu.spec import cte


def test_components_basic():
    img = np.array(
        [
            [9, 9, 9, 9, 9, 9],
            [9, 1, 1, 0, 2, 9],
            [9, 1, 0, 0, 2, 9],
            [9, 0, 0, 1, 2, 9],
            [9, 9, 9, 9, 9, 9],
            [9, 9, 9, 9, 9, 9],
        ],
        dtype=np.uint8,
    )
    res = cte.extract(img)
    # interior components: 1s(tl), 0s(blob), 2s(col), 1(single)
    colors = [(c.color, c.area) for c in res.contours]
    assert (1, 3) in colors
    assert (0, 5) in colors
    assert (2, 3) in colors
    assert (1, 1) in colors
    assert len(res.contours) == 4
    # discovery order: first pixel row-major: 1s at (1,1); 0 at (1,3);
    # 2 at (1,4); single 1 at (3,3)
    assert [c.color for c in res.contours] == [1, 0, 2, 1]


def test_border_excluded():
    img = np.zeros((6, 5), dtype=np.uint8)
    res = cte.extract(img)
    # only the 3x3 interior forms a component (rows 1-3, cols 1-3)
    assert len(res.contours) == 1
    assert res.contours[0].area == 9
    assert (res.labels[0] == 0).all()
    assert (res.labels[-2:] == 0).all()


def test_bottom_two_rows_are_horizon():
    """The last two rows never join components (clear_outline's early
    side-border stop + final full-row horizon, cte.hpp:155-165)."""
    img = np.zeros((6, 5), dtype=np.uint8)
    res = cte.extract(img)
    assert res.contours[0].bbox.bottom == 3          # not 4
    # shrinking by one row loses one interior row
    res5 = cte.extract(img[:5])
    assert res5.contours[0].area == 6                # rows 1-2 only


def test_bbox_inclusive():
    img = np.zeros((7, 7), dtype=np.uint8)
    img[2:4, 2:5] = 3
    res = cte.extract(img)
    c3 = next(c for c in res.contours if c.color == 3)
    assert (c3.bbox.left, c3.bbox.top, c3.bbox.right, c3.bbox.bottom) == (
        2, 2, 4, 3,
    )


def test_pred_gates_extraction_not_membership():
    img = np.array(
        [
            [9, 9, 9, 9, 9],
            [9, 1, 1, 2, 9],
            [9, 1, 1, 2, 9],
            [9, 9, 9, 9, 9],
            [9, 9, 9, 9, 9],
        ],
        dtype=np.uint8,
    )
    pred = np.zeros_like(img, dtype=bool)
    pred[2, 2] = True  # only one pixel of the 1-component passes
    res = cte.extract(img, pred_mask=pred)
    assert len(res.contours) == 1
    c = res.contours[0]
    assert c.color == 1
    assert c.area == 4  # the whole component is pulled in (cte.hpp:93-99)
