"""Differential tests: compiled reference C++ vs the NumPy spec.

The reference's scalar subsystems (nic RLE codec, cte/ctr contour
extraction, fgm fragment blit/blend/growth) are compiled from the
read-only reference checkout (tests/differential/builder.py) and fuzzed
against remap_tpu.spec on identical inputs.  This closes the loop the
spec suite cannot: the spec was *derived* from the C++ by reading it —
here actual compiled binaries confirm the derivation.

Skips cleanly when the reference checkout or g++ is unavailable.
"""

import pathlib
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).parent))
from builder import REF_SRC, build_driver, run_driver  # noqa: E402

from remap_tpu.spec import cte as scte
from remap_tpu.spec import fgm as sfgm
from remap_tpu.spec import nic as snic


@pytest.fixture(scope="session")
def driver():
    if not REF_SRC.is_dir():
        pytest.skip("reference checkout not available")
    try:
        return build_driver()
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        pytest.skip(f"cannot build reference driver: {e}")


def _images(rng, n, h, w):
    for _ in range(n):
        kind = rng.integers(0, 4)
        if kind == 0:           # pure noise (worst case for RLE)
            yield rng.integers(0, 16, (h, w), dtype=np.uint8)
        elif kind == 1:         # long runs
            img = np.repeat(
                rng.integers(0, 16, (h, w // 8 + 1), dtype=np.uint8),
                8, axis=1,
            )[:, :w]
            yield np.ascontiguousarray(img)
        elif kind == 2:         # tiles + sparse noise (game-like)
            t = 4
            img = np.kron(
                rng.integers(0, 16, (h // t + 1, w // t + 1), dtype=np.uint8),
                np.ones((t, t), np.uint8),
            )[:h, :w]
            noise = rng.random((h, w)) < 0.1
            img[noise] = rng.integers(0, 16)
            yield np.ascontiguousarray(img)
        else:                   # few colors -> big components
            yield rng.integers(0, 3, (h, w), dtype=np.uint8)


# ---------------------------------------------------------------- nic --

@pytest.mark.parametrize("hw", [
    (17, 23),
    pytest.param((31, 64), marks=pytest.mark.diffquick),
    (64, 37),
])
def test_nic_bytes_exact(driver, hw):
    h, w = hw
    rng = np.random.default_rng(h * 100 + w)
    for img in _images(rng, 6, h, w):
        out = run_driver(driver, ["nic", w, h], img.tobytes())
        clen = int(np.frombuffer(out[:4], np.uint32)[0])
        comp = out[4 : 4 + clen]
        back = np.frombuffer(out[4 + clen :], np.uint8).reshape(h, w)
        assert comp == bytes(snic.compress(img))
        assert np.array_equal(back, img)
        assert np.array_equal(
            snic.decompress(comp, w, h), img
        )


def test_nic_edge_cases(driver):
    cases = [
        np.zeros((4, 4), np.uint8),                        # all one color
        np.full((3, 200), 7, np.uint8),                    # >255 run
        (np.arange(64, dtype=np.uint8) % 16).reshape(8, 8),  # no runs
        np.tile(np.array([[1, 2]], np.uint8), (2, 130)),   # long alternation
    ]
    for img in cases:
        h, w = img.shape
        out = run_driver(driver, ["nic", w, h], img.tobytes())
        clen = int(np.frombuffer(out[:4], np.uint32)[0])
        assert out[4 : 4 + clen] == bytes(snic.compress(img))
        assert np.array_equal(
            np.frombuffer(out[4 + clen :], np.uint8).reshape(h, w), img
        )


# ---------------------------------------------------------------- cte --

def _parse_cte(out, n_hint, h, w):
    n = int(np.frombuffer(out[:4], np.uint32)[0])
    recs = np.frombuffer(out[4 : 4 + n * 28], np.uint32).reshape(n, 7)
    masks = np.frombuffer(out[4 + n * 28 :], np.uint8).reshape(n, h, w)
    return recs, masks


_U32_MAX = 0xFFFFFFFF


def _quirky_left(mask):
    """The reference's enclosure left (PARITY.md 'bbox-left quirk').

    cdt::limits::update is `if (v > upper_) ... else if (v < lower_)`
    (cdt.hpp:183-190): a value that sets a new running max never updates
    the min, so over the contour's row-major edge-x sequence the min
    ignores every prefix record-maximum.  Contours whose true left occurs
    only on that record chain (single rows, some concave shapes) report
    lower_ = SIZE_MAX (u32-truncated by the driver).
    """
    xs = []
    for row in mask:
        on = np.nonzero(row)[0]
        if on.size == 0:
            continue
        runs = np.split(on, np.nonzero(np.diff(on) > 1)[0] + 1)
        for r in runs:
            xs.append(int(r[0]))
            if r[-1] != r[0]:
                xs.append(int(r[-1]))
    lower, upper = _U32_MAX, -1
    for x in xs:
        if x > upper:
            upper = x
        elif x < lower:
            lower = x
    return lower


@pytest.mark.parametrize("seed", [
    pytest.param(0, marks=pytest.mark.diffquick), 1, 2, 3,
])
def test_cte_contours_match_spec(driver, seed):
    rng = np.random.default_rng(seed)
    h, w = 40, 56
    for img in _images(rng, 4, h, w):
        out = run_driver(driver, ["cte", w, h, 0], img.tobytes())
        recs, masks = _parse_cte(out, None, h, w)
        sres = scte.extract(img)
        assert len(sres.contours) == len(recs)
        for c, rec, mask in zip(sres.contours, recs, masks):
            rid, color, area, l, t, r, b = (int(v) for v in rec)
            assert c.id == rid
            assert c.color == color
            assert c.area == area
            # top/right/bottom are the true pixel bbox; left carries the
            # reference's else-if quirk, which the spec deliberately does
            # NOT replicate (PARITY.md) — assert both semantics exactly
            assert (c.bbox.top, c.bbox.right, c.bbox.bottom) == (t, r, b)
            assert l == _quirky_left(mask)
            assert c.bbox.left == int(np.nonzero(mask.any(0))[0][0])
            assert np.array_equal(sres.mask_of(c), mask != 0)


def test_cte_predicate_gates_seeds(driver):
    rng = np.random.default_rng(77)
    h, w = 32, 48
    img = next(_images(rng, 1, h, w))
    pred = (rng.random((h, w)) < 0.15).astype(np.uint8)
    out = run_driver(
        driver, ["cte", w, h, 1], img.tobytes() + pred.tobytes()
    )
    recs, masks = _parse_cte(out, None, h, w)
    sres = scte.extract(img, pred_mask=pred.astype(bool))
    assert len(sres.contours) == len(recs)
    for c, rec, mask in zip(sres.contours, recs, masks):
        assert (c.id, c.color, c.area) == tuple(int(v) for v in rec[:3])
        assert np.array_equal(sres.mask_of(c), mask != 0)


# ---------------------------------------------------------------- fgm --

@pytest.mark.parametrize("seed", [
    pytest.param(10, marks=pytest.mark.diffquick), 11,
])
def test_fgm_blit_growth_blend(driver, seed):
    rng = np.random.default_rng(seed)
    h, w = 24, 32
    n = 6
    frames = [next(_images(rng, 1, h, w)) for _ in range(n)]
    # positions force growth left/up/right/down incl. step rounding
    pos = [(0, 0)]
    for _ in range(n - 1):
        pos.append(
            (
                int(rng.integers(-40, 41)),
                int(rng.integers(-30, 31)),
            )
        )
    payload = b"".join(
        np.array(p, np.int32).tobytes() + f.tobytes()
        for p, f in zip(pos, frames)
    )
    out = run_driver(driver, ["fgm", w, h, n], payload)
    zx, zy = (int(v) for v in np.frombuffer(out[:8], np.int32))
    dw, dh = (int(v) for v in np.frombuffer(out[8:16], np.uint32))
    k = 16 + dw * dh * 16 * 2
    dots = np.frombuffer(out[16:k], np.uint16).reshape(dh, dw, 16)
    blend_img = np.frombuffer(out[k : k + dw * dh], np.uint8).reshape(dh, dw)
    blend_mask = np.frombuffer(out[k + dw * dh :], np.uint8).reshape(dh, dw)

    frag = sfgm.Fragment.create(w, h)
    for i, (p, f) in enumerate(zip(pos, frames)):
        frag.blit_frame(p, f, i)
    assert frag.zero == (zx, zy)
    assert frag.dots.shape == (dh, dw, 16)
    assert np.array_equal(frag.dots, dots)
    simg, smask = frag.blend()
    assert np.array_equal(smask != 0, blend_mask != 0)
    assert np.array_equal(simg[smask != 0], blend_img[blend_mask != 0])


# ---------------------------------------------------------------- kpm --

def _kpm_entries(rng, n_codes, region_count=8, w=256, h=240,
                 offset=(0, 0), noise=0):
    """Synthetic keypoint stores: ``n_codes`` unique codes per region,
    curr = prev shifted by ``offset`` (plus ``noise`` unmatched codes).

    Returns (prev_entries, curr_entries, spec_prev, spec_curr): entries as
    (region, 13-byte code, x, y); spec stores as kpe.RegionPoints.  The
    byte code and the spec's 4-word code are different encodings of the
    same (patch, weight) identity — kpm only observes equality and the
    weight nibble (kpr.hpp:25-27), which both encodings preserve.
    """
    from remap_tpu.spec.kpe import RegionPoints

    prev_e, curr_e = [], []
    spec_prev, spec_curr = [], []
    for r in range(region_count):
        points = {}
        cpoints = {}
        counts = [0, 0, 0]
        ccounts = [0, 0, 0]
        for _ in range(n_codes):
            nibbles = rng.integers(0, 16, 25, dtype=np.uint8)
            weight = int(rng.integers(1, 3))
            raw = bytearray(13)
            for k in range(24):
                raw[k // 2] |= int(nibbles[k]) << (4 * (k % 2))
            raw[12] = (int(nibbles[24]) << 4) | weight
            words = [0, 0, 0, 0]
            for k in range(25):
                words[k // 8] |= int(nibbles[k]) << (4 * (k % 8))
            words[3] |= weight << 4
            code = tuple(words)

            # keep both sides' positions non-negative (mrl::point_t is
            # size_t): sample prev from the shifted-safe range
            x = int(rng.integers(max(16, 16 + offset[0]),
                                 min(w - 16, w - 16 + offset[0])))
            y = int(rng.integers(max(16, 16 + offset[1]),
                                 min(h - 16, h - 16 + offset[1])))
            prev_e.append((r, bytes(raw), x, y))
            points.setdefault(code, []).append((x, y))
            counts[weight] += 1

            cx, cy = x - offset[0], y - offset[1]
            curr_e.append((r, bytes(raw), cx, cy))
            cpoints.setdefault(code, []).append((cx, cy))
            ccounts[weight] += 1
        for _ in range(noise):
            nibbles = rng.integers(0, 16, 25, dtype=np.uint8)
            weight = int(rng.integers(1, 3))
            raw = bytearray(13)
            for k in range(24):
                raw[k // 2] |= int(nibbles[k]) << (4 * (k % 2))
            raw[12] = (int(nibbles[24]) << 4) | weight
            words = [0, 0, 0, 0]
            for k in range(25):
                words[k // 8] |= int(nibbles[k]) << (4 * (k % 8))
            words[3] |= weight << 4
            x = int(rng.integers(16, w - 16))
            y = int(rng.integers(16, h - 16))
            curr_e.append((r, bytes(raw), x, y))
            cpoints.setdefault(tuple(words), []).append((x, y))
            ccounts[weight] += 1
        spec_prev.append(RegionPoints(points=points, counts=counts))
        spec_curr.append(RegionPoints(points=cpoints, counts=ccounts))
    return prev_e, curr_e, spec_prev, spec_curr


def _run_kpm(driver, prev_e, curr_e):
    payload = b""
    for r, code, x, y in prev_e + curr_e:
        payload += np.uint32(r).tobytes() + code
        payload += np.uint32(x).tobytes() + np.uint32(y).tobytes()
    out = run_driver(driver, ["kpm", len(prev_e), len(curr_e)], payload)
    has = out[0]
    dx, dy = np.frombuffer(out[1:9], np.int32)
    return (int(dx), int(dy)) if has else None


@pytest.mark.parametrize("seed,offset", [
    pytest.param(1, (3, -2), marks=pytest.mark.diffquick),
    (2, (0, 0)), (3, (-17, 9)), (4, (120, -80)),
])
def test_kpm_match_agrees(driver, seed, offset):
    """The compiled reference's kpm::match and the spec agree on clean
    scenes (unique codes -> no hash-order ties)."""
    from remap_tpu.spec import kpm as skpm

    rng = np.random.default_rng(seed)
    prev_e, curr_e, sp, sc = _kpm_entries(
        rng, n_codes=40, offset=offset, noise=6
    )
    ref = _run_kpm(driver, prev_e, curr_e)
    spec = skpm.match_frames(sp, sc, weight_switch=10)
    assert ref == spec
    assert ref == offset


def test_kpm_active_gate(driver):
    """active < region_count // 4 -> no match (kpm.hpp:400-403)."""
    from remap_tpu.spec import kpm as skpm

    rng = np.random.default_rng(9)
    prev_e, curr_e, sp, sc = _kpm_entries(rng, n_codes=30, offset=(2, 2))
    # keep only one active region (of 8) on the current side
    curr_e = [e for e in curr_e if e[0] == 0]
    for r in range(1, 8):
        sc[r].points.clear()
        sc[r].counts = [0, 0, 0]
    ref = _run_kpm(driver, prev_e, curr_e)
    spec = skpm.match_frames(sp, sc, weight_switch=10)
    assert ref is None and spec is None


def test_kpm_ambiguous_scene_rejects(driver):
    """Two equally-voted offsets: the declare margin fails in both."""
    from remap_tpu.spec import kpm as skpm

    rng = np.random.default_rng(10)
    a_prev, a_curr, sp_a, sc_a = _kpm_entries(rng, n_codes=20, offset=(5, 0))
    b_prev, b_curr, sp_b, sc_b = _kpm_entries(rng, n_codes=20, offset=(0, 7))
    prev_e = a_prev + b_prev
    curr_e = a_curr + b_curr
    sp = []
    sc = []
    for ra, rb in zip(sp_a, sp_b):
        pts = dict(ra.points)
        pts.update(rb.points)
        cnt = [x + y for x, y in zip(ra.counts, rb.counts)]
        sp.append(type(ra)(points=pts, counts=cnt))
    for ra, rb in zip(sc_a, sc_b):
        pts = dict(ra.points)
        pts.update(rb.points)
        cnt = [x + y for x, y in zip(ra.counts, rb.counts)]
        sc.append(type(ra)(points=pts, counts=cnt))
    ref = _run_kpm(driver, prev_e, curr_e)
    spec = skpm.match_frames(sp, sc, weight_switch=10)
    assert ref is None and spec is None


def test_kpm_fuzz_many_scenes(driver):
    """25 random clean scenes: offsets, densities, weight mixes."""
    from remap_tpu.spec import kpm as skpm

    rng = np.random.default_rng(123)
    agree = 0
    for _ in range(25):
        off = (int(rng.integers(-60, 61)), int(rng.integers(-40, 41)))
        n = int(rng.integers(8, 60))
        noise = int(rng.integers(0, 10))
        prev_e, curr_e, sp, sc = _kpm_entries(
            rng, n_codes=n, offset=off, noise=noise
        )
        ref = _run_kpm(driver, prev_e, curr_e)
        spec = skpm.match_frames(sp, sc, weight_switch=10)
        assert ref == spec, (off, n, noise)
        agree += ref == off
    # nearly all clean scenes must also recover the true offset
    assert agree >= 23


# ---------------------------------------------------------------- fgs --

def _code_words_to_bytes(words):
    """Spec 4-word code -> the driver's 13-byte encoding (same identity:
    kpm observes only code equality + the weight nibble)."""
    nibbles = [(words[k // 8] >> (4 * (k % 8))) & 0xF for k in range(25)]
    weight = (words[3] >> 4) & 0xF
    raw = bytearray(13)
    for k in range(24):
        raw[k // 2] |= nibbles[k] << (4 * (k % 2))
    raw[12] = (nibbles[24] << 4) | weight
    return bytes(raw)


def _run_fgs(driver, prev_region, prev_mask, curr_region, curr_mask):
    def mask_block(m):
        h, w = m.shape
        return (np.uint32(w).tobytes() + np.uint32(h).tobytes()
                + np.ascontiguousarray(m.astype(np.uint8)).tobytes())

    def entries(region):
        out = b""
        n = 0
        for code, pts in region.points.items():
            raw = _code_words_to_bytes(code)
            for x, y in pts:
                out += raw + np.uint32(x).tobytes() + np.uint32(y).tobytes()
                n += 1
        return out, n

    pe, np_ = entries(prev_region)
    ce, nc = entries(curr_region)
    payload = mask_block(prev_mask) + mask_block(curr_mask) + pe + ce
    out = run_driver(driver, ["fgs", np_, nc], payload)
    if not out[0]:
        return None
    dx, dy = np.frombuffer(out[1:9], np.int32)
    count = int(np.frombuffer(out[9:13], np.uint32)[0])
    return (int(dx), int(dy)), count


@pytest.mark.parametrize("seed,crop_b", [
    pytest.param(5, (40, 150, 35, 200), marks=pytest.mark.diffquick),
    (6, (20, 120, 15, 170)),
])
def test_fgs_cellular_match_agrees(driver, seed, crop_b):
    """The compiled cellular matcher (kpm.hpp:371-393) agrees with the
    spec on real extracted keypoints from overlapping world crops."""
    from remap_tpu.core.regions import make_layout
    from remap_tpu.spec import kpe as skpe
    from remap_tpu.spec import kpm as skpm
    from remap_tpu.utils import testing

    rng = np.random.default_rng(seed)
    world = testing.make_world(220, 260, rng)
    a = world[10:110, 10:150]
    y0, y1, x0, x1 = crop_b
    b = world[y0:y1, x0:x1]

    ra = skpe.extract(a, make_layout(a.shape[1], a.shape[0], 1, 1, 0))
    rb = skpe.extract(b, make_layout(b.shape[1], b.shape[0], 1, 1, 0))
    mask_a = np.ones(a.shape, np.uint8)
    mask_b = np.ones(b.shape, np.uint8)

    ref = _run_fgs(driver, ra.regions[0], mask_a, rb.regions[0], mask_b)
    spec = skpm.match_fragments(
        ra.regions[0], mask_a, rb.regions[0], mask_b, (15, 15)
    )
    assert ref == spec
    if spec is not None:
        assert spec[0] == (x0 - 10, y0 - 10)


def test_fgs_cellular_rejects_unrelated(driver):
    from remap_tpu.core.regions import make_layout
    from remap_tpu.spec import kpe as skpe
    from remap_tpu.spec import kpm as skpm
    from remap_tpu.utils import testing

    a = testing.make_world(120, 160, np.random.default_rng(7))
    b = testing.make_world(120, 160, np.random.default_rng(8))
    ra = skpe.extract(a, make_layout(160, 120, 1, 1, 0))
    rb = skpe.extract(b, make_layout(160, 120, 1, 1, 0))
    mask = np.ones(a.shape, np.uint8)
    ref = _run_fgs(driver, ra.regions[0], mask, rb.regions[0], mask.copy())
    spec = skpm.match_fragments(
        ra.regions[0], mask, rb.regions[0], mask, (15, 15)
    )
    assert ref == spec
