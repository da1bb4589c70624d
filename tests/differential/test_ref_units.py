"""UNIT-sensitivity differentials vs the compiled reference's stage dumps.

The map-level e2e oracle (test_ref_e2e/test_ref_fuzz) absorbs almost any
small intermediate divergence in the vote argmaxes — the round-3
palette-ordering bug shifted ~3.5% of median pixels per frame yet moved
only 1-3 map pixels on 3 of 9 clips.  This file diffs the *stages*
directly against the binary (REMAP_REF_DUMP seam in ref_full.py), so a
single diverging pixel in any intermediate fails loudly:

- per-frame aws best contours (area/color/quirky enclosure/stagnation)
  -> heatmap AND, CC labeling, area*color tie-breaks, cdt::limits parity
- per-frame stored images  -> feed + RLE codec parity
- per-frame stored medians -> kpe kernel + ordered-palette parity
- per-frame fde masks      -> contour extraction / bbox-fill parity
- post-splice dot matrices -> frc/fgm/fgs vote parity
- post-fdf dot matrices    -> foreground-masked re-blit parity
- arf heatmap gate + pre-crop result -> pattern counts + blur parity
"""

import numpy as np
import pytest

from remap_tpu.core.regions import make_layout
from remap_tpu.spec import arf, aws, cte, fde, fdf, fgs, frc
from remap_tpu.utils import testing

from tests.differential import ref_full
from tests.differential.test_ref_e2e import FH, FW, _write_clip

pytestmark = pytest.mark.skipif(
    not ref_full.available(),
    reason="reference checkout / g++ / AVX2 / libpng unavailable",
)


def _load(path, dtype):
    raw = path.read_bytes()
    w, h = np.frombuffer(raw[:16], np.uint64)
    flat = np.frombuffer(raw[16:], dtype)
    if dtype == np.uint16:                      # dot matrices: 16 planes
        return flat.reshape(int(h), int(w), 16)
    return flat.reshape(int(h), int(w))


@pytest.mark.diffquick
def test_ref_stage_dumps_pixel_exact(ref_binary, tmp_path):
    rng = np.random.default_rng(4242)
    world = testing.make_world(800, 1200, rng=rng)
    path = testing.make_camera_path(
        60, (800, 1200), (FH, FW), rng, max_step=3, start=(400, 240)
    )
    frames = testing.render_clip(
        world, path, (FH, FW), rng=rng,
        n_sprites=3, sprite_size=10, hud_rows=24, border=8,
    ).frames

    clip_dir = tmp_path / "clip"
    _write_clip(frames, clip_dir)
    ref_out = tmp_path / "refout"
    ref_out.mkdir()
    dump = tmp_path / "dump"
    dump.mkdir()
    pngs = ref_full.run_reference(ref_binary, clip_dir, ref_out, dump)
    assert len(pngs) == 1

    # aws: replay the spec's per-frame heatmap/best-contour machine and
    # compare with the reference's aws-callback trace (aws.hpp:146) —
    # area, color, the QUIRKY enclosure (left may be SIZE_MAX), and the
    # stagnation counter's evolution
    ref_aws = [
        tuple(int(v) for v in line.split())
        for line in (dump / "aws.txt").read_text().splitlines()
    ]
    assert ref_aws, "reference wrote no aws trace"
    heat = np.ones_like(frames[0])
    u64max = 2**64 - 1
    for i, (a, c, l, t, r, b2, _stag) in enumerate(ref_aws):
        heat &= (frames[i] == frames[i + 1]).astype(np.uint8)
        contours = cte.extract(heat).contours
        best = min(contours, key=lambda cc_: cc_.area * cc_.color)
        fl = best.fill_left if best.fill_left is not None else u64max
        got = (best.area, best.color, fl, best.bbox.top,
               best.bbox.right, best.bbox.bottom)
        assert got == (a, c, l, t, r, b2), f"aws frame {i}: {got} != ref"

    window = aws.scan(iter(frames))
    crop = window.crop
    cropped = [
        f[crop.top : crop.bottom, crop.left : crop.right] for f in frames
    ]
    h, w = cropped[0].shape
    layout = make_layout(w, h, frc.GRID_W, frc.GRID_H, frc.OVERLAP)
    spl = fgs.splice(frc.collect(cropped, layout))
    assert len(spl) == 1
    spl = spl[0]

    # post-splice dots: frc vote accumulation + canvas growth + splice
    ref_spl = _load(dump / "spl_dots_0", np.uint16)
    np.testing.assert_array_equal(spl.dots, ref_spl)

    # per-frame stored images (codec/feed) and medians (kpe + palette)
    for rec in spl.frames:
        rimg = _load(dump / f"img_0_{rec.number}", np.uint8)
        np.testing.assert_array_equal(
            rec.image, rimg, err_msg=f"stored image, frame {rec.number}"
        )
        rmed = _load(dump / f"med_0_{rec.number}", np.uint8)
        np.testing.assert_array_equal(
            rec.median, rmed, err_msg=f"stored median, frame {rec.number}"
        )

    # per-frame fde foreground masks
    background, _ = spl.blend()
    for rec in spl.frames:
        pos = (
            rec.position[0] - spl.zero[0],
            rec.position[1] - spl.zero[1],
        )
        cres, kept = fde.extract(background, rec.image, rec.median, pos)
        ours = fde.foreground_mask(cres, kept, rec.image.shape)
        rmask = (_load(dump / f"mask_0_{rec.number}", np.uint8) != 0).astype(
            np.uint8
        )
        np.testing.assert_array_equal(
            ours, rmask, err_msg=f"fde mask, frame {rec.number}"
        )

    # post-fdf dots: foreground-masked re-blit
    frag = fdf.filter_fragments([spl], (h, w))[0]
    ref_fdf = _load(dump / "fdf_dots_0", np.uint16)
    np.testing.assert_array_equal(frag.dots, ref_fdf)

    # arf: heat gate decisions + pre-crop selected image
    image, mask = frag.blend()
    hmap = arf.heat_counts(image, mask, 15, axis=1)
    vmap = arf.heat_counts(image, mask, 15, axis=0)
    heat = arf.combine(hmap, vmap)
    ref_heat = _load(dump / "arf_heat_0", np.float32)
    np.testing.assert_array_equal(heat > 0.25, ref_heat > 0.25)
    out = arf.select(frag.dots, heat, 2.0)
    ref_img = _load(dump / "arf_img_0", np.uint8)
    np.testing.assert_array_equal(out, ref_img)
