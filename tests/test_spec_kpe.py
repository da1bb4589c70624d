"""Spec kpe vs brute-force definitions."""

import numpy as np
import pytest

from remap_tpu.core import palette
from remap_tpu.core.regions import make_layout
from remap_tpu.spec import kpe


def brute_median(window_ordered: np.ndarray, half: int) -> int:
    """Direct statement of kpe.hpp:326-340."""
    hist = np.bincount(window_ordered.reshape(-1), minlength=16)
    total = 0
    for v in range(15, -1, -1):
        total += hist[v]
        if total >= half:
            return v
    return 0


def test_median_from_top_hand_cases():
    h = np.zeros(16, dtype=int)
    h[5] = 9
    assert kpe.median_from_top(h, 4) == 5
    h = np.zeros(16, dtype=int)
    h[3] = 3
    h[7] = 6  # from top: 6 at 7 >= 4
    assert kpe.median_from_top(h, 4) == 7
    h = np.zeros(16, dtype=int)
    h[3] = 6
    h[7] = 3  # 3 < 4 at bin 7; 9 >= 4 at bin 3
    assert kpe.median_from_top(h, 4) == 3


@pytest.fixture(scope="module")
def small_case():
    rng = np.random.default_rng(42)
    img = rng.integers(0, 16, size=(40, 48), dtype=np.uint8)
    layout = make_layout(48, 40, 2, 2, 4)
    return img, layout, kpe.extract(img, layout)


def test_median_matches_brute_force(small_case):
    img, layout, res = small_case
    ordered = palette.native_to_ordered(img)
    x_lo, x_hi = layout.x_proc
    y_lo, y_hi = layout.y_proc
    for y in range(y_lo, y_hi):
        for x in range(x_lo, x_hi):
            w3 = ordered[y - 1 : y + 2, x - 1 : x + 2]
            expect = palette.ORDERED_TO_NATIVE[brute_median(w3, 4)]
            assert res.median[y, x] == expect, (x, y)
    # Unprocessed rows/borders stay zero (the H-kh-2 quirk).
    assert (res.median[:2] == 0).all()
    assert (res.median[y_hi:] == 0).all()
    assert (res.median[:, :2] == 0).all()
    assert (res.median[:, -2:] == 0).all()


def test_weights_match_brute_force(small_case):
    img, layout, res = small_case
    ordered = palette.native_to_ordered(img)
    x_lo, x_hi = layout.x_proc
    y_lo, y_hi = layout.y_proc
    count = 0
    for y in range(y_lo, y_hi):
        for x in range(x_lo, x_hi):
            p1 = ordered[y, x]
            p3 = brute_median(ordered[y - 1 : y + 2, x - 1 : x + 2], 4)
            p5 = brute_median(ordered[y - 2 : y + 3, x - 2 : x + 3], 12)
            if p1 != p3 and p3 != p5:
                w = 2 if p1 != p5 else 1
            else:
                w = 0
            assert res.weight[y, x] == w, (x, y)
            count += w > 0
    assert count == len(res.keypoints)
    assert count > 0  # random noise must produce keypoints


def test_region_routing(small_case):
    img, layout, res = small_case
    # Each keypoint appears in exactly the regions whose spans contain it.
    per_region = [0] * layout.region_count
    for kp in res.keypoints:
        for xs in layout.sections_of_x(kp.x):
            for ys in layout.sections_of_y(kp.y):
                per_region[layout.region_index(xs, ys)] += 1
    for idx, reg in enumerate(res.regions):
        assert reg.total == per_region[idx]
        assert reg.total == sum(len(v) for v in reg.points.values())


def test_code_identity():
    rng = np.random.default_rng(1)
    a = rng.integers(0, 16, size=(5, 5), dtype=np.uint8)
    b = a.copy()
    assert kpe.pack_code(a, 1) == kpe.pack_code(b, 1)
    assert kpe.pack_code(a, 1) != kpe.pack_code(a, 2)
    b[4, 4] ^= 1
    assert kpe.pack_code(a, 1) != kpe.pack_code(b, 1)
