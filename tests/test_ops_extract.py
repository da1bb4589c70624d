"""Device kpe/tables kernels vs the NumPy spec (bit-exact)."""

import numpy as np
import jax.numpy as jnp
import pytest

from remap_tpu.core.regions import make_layout
from remap_tpu.ops import kpe as jkpe
from remap_tpu.ops import tables as jtab
from remap_tpu.spec import kpe as skpe
from remap_tpu.utils import testing


@pytest.fixture(scope="module", params=[(48, 64, 4, 2, 8), (40, 56, 1, 1, 0)])
def case(request):
    h, w, gw, gh, ov = request.param
    layout = make_layout(w, h, gw, gh, ov)
    rng = np.random.default_rng(21)
    world = testing.make_world(h * 3, w * 3, rng)
    imgs = np.stack(
        [world[i * 7 : i * 7 + h, i * 5 : i * 5 + w] for i in range(4)]
    )
    dense = jkpe.extract_dense(jnp.asarray(imgs), layout)
    specs = [skpe.extract(imgs[i], layout) for i in range(len(imgs))]
    return layout, imgs, dense, specs


def test_median_weight_bit_exact(case):
    _, imgs, dense, specs = case
    for i, s in enumerate(specs):
        np.testing.assert_array_equal(np.asarray(dense.median[i]), s.median)
        np.testing.assert_array_equal(np.asarray(dense.weight[i]), s.weight)


def test_codes_match_spec(case):
    _, imgs, dense, specs = case
    for i, s in enumerate(specs):
        codes = np.asarray(dense.codes[i])
        assert s.keypoints, "case must produce keypoints"
        for kp in s.keypoints:
            got = tuple(int(x) for x in codes[kp.y, kp.x])
            assert got == kp.code


def test_tables_bit_exact(case):
    layout, imgs, dense, specs = case
    tabs = jtab.extract_tables(dense.weight, dense.codes, layout, 2048)
    for i, s in enumerate(specs):
        for r in range(layout.region_count):
            sr = s.regions[r]
            valid = np.asarray(tabs.valid[i, r])
            assert int(valid.sum()) == sr.total
            assert not bool(tabs.overflow[i, r])
            wc = np.asarray(tabs.wcounts[i, r])
            assert (wc[1], wc[2]) == (sr.counts[1], sr.counts[2])
            cod = np.asarray(tabs.codes[i, r])
            pos = np.asarray(tabs.pos[i, r])
            got = {
                (tuple(int(x) for x in cod[k]), int(pos[k, 0]), int(pos[k, 1]))
                for k in range(cod.shape[0])
                if valid[k]
            }
            exp = {
                (c, x, y) for c, pts in sr.points.items() for (x, y) in pts
            }
            assert got == exp


def test_table_overflow_flagged():
    layout = make_layout(64, 48, 4, 2, 8)
    rng = np.random.default_rng(2)
    imgs = rng.integers(0, 16, size=(1, 48, 64), dtype=np.uint8)
    dense = jkpe.extract_dense(jnp.asarray(imgs), layout)
    tabs = jtab.extract_tables(dense.weight, dense.codes, layout, 16)
    # full noise: every region has way more than 16 keypoints
    assert bool(np.asarray(tabs.overflow).all())
    # wcounts stay uncapped
    s = skpe.extract(imgs[0], layout)
    for r in range(8):
        wc = np.asarray(tabs.wcounts[0, r])
        assert (wc[1], wc[2]) == (s.regions[r].counts[1], s.regions[r].counts[2])


def test_sort2_tables_match_topk():
    """Two-level chunk-sort table build == flat top_k bit-exactly (valid,
    codes, pos, wcounts) when no 512-px chunk exceeds the keep quota."""
    from remap_tpu.core.regions import make_layout
    from remap_tpu.ops import tables as jtab

    rng = np.random.default_rng(7)
    b, h, w = 2, 48, 96
    layout = make_layout(w, h, 4, 2, 8)
    weight = np.where(
        rng.random((b, h, w)) < 0.08,
        rng.integers(1, 3, size=(b, h, w)),
        0,
    ).astype(np.uint8)
    codes = rng.integers(0, 1 << 32, size=(b, h, w, 4), dtype=np.uint32)
    for capacity in (16, 64):   # 16 forces capacity overflow
        ref = jtab.build_tables(
            jnp.asarray(weight), jnp.asarray(codes), layout, capacity, "topk"
        )
        out = jtab.build_tables(
            jnp.asarray(weight), jnp.asarray(codes), layout, capacity,
            "sort2",
        )
        valid = np.asarray(ref.valid)
        np.testing.assert_array_equal(np.asarray(out.valid), valid)
        # codes at invalid slots are unspecified (topk gathers junk
        # indices there, sort2 uses 0); consumers mask by valid
        m = valid[..., None]
        np.testing.assert_array_equal(
            np.where(m, np.asarray(out.codes), 0),
            np.where(m, np.asarray(ref.codes), 0),
        )
        np.testing.assert_array_equal(np.asarray(out.pos),
                                      np.asarray(ref.pos))
        np.testing.assert_array_equal(np.asarray(out.wcounts),
                                      np.asarray(ref.wcounts))
        np.testing.assert_array_equal(
            np.asarray(out.overflow), np.asarray(ref.overflow)
        )


def test_sort2_quota_flag():
    """A 512-px chunk denser than SORT2_QUOTA raises overflow (the
    exactness bound) even when the region total fits capacity."""
    from remap_tpu.core.regions import make_layout
    from remap_tpu.ops import tables as jtab

    layout = make_layout(96, 48, 4, 2, 8)
    weight = np.zeros((1, 48, 96), np.uint8)
    weight[0, 3:10, 3:24] = 1     # 147 keypoints early in region (0, 0)
    codes = np.zeros((1, 48, 96, 4), np.uint32)
    out = jtab.build_tables(
        jnp.asarray(weight), jnp.asarray(codes), layout, 512, "sort2"
    )
    assert int(weight.sum()) > jtab.SORT2_QUOTA
    assert bool(np.asarray(out.overflow)[0, 0])
