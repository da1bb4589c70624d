"""Full JAX pipeline vs the NumPy spec pipeline, end to end."""

import numpy as np
import jax.numpy as jnp
import pytest

from remap_tpu.config import PipelineConfig
from remap_tpu.pipeline import builder
from remap_tpu.pipeline import splice as jsplice
from remap_tpu.ops import arf as jarf
from remap_tpu.spec import arf as sarf
from remap_tpu.spec import pipeline as spipeline
from remap_tpu.utils import testing

CFG = PipelineConfig(
    screen_width=96,
    screen_height=72,
    region_capacity=2048,
    splice_capacity=4096,
    frame_batch=8,
)


@pytest.fixture(scope="module")
def clip():
    return testing.simple_clip(
        n_frames=30,
        frame_hw=(72, 96),
        world_hw=(200, 260),
        seed=7,
        hud_rows=8,
        border=4,
        max_step=4,
        n_sprites=1,
        sprite_size=5,
    )


@pytest.fixture(scope="module")
def both(clip):
    jres = builder.build_from_frames(clip.frames, CFG)
    smaps = spipeline.build(clip.frames)
    return jres, smaps


def test_full_pipeline_matches_spec(both):
    jres, smaps = both
    assert len(jres.maps) == len(smaps)
    for jm, sm in zip(jres.maps, smaps):
        assert jm.shape == sm.shape
        # bit-exact INCLUDING the artifact blur: the device defers
        # knife-edge argmax ties to an exact host re-selection against
        # the canonical f64 spec (ops.arf stability bound)
        np.testing.assert_array_equal(jm, sm)


def test_resume_from_checkpoints(clip, tmp_path):
    """build(resume=True) restarts from the latest stage checkpoint and
    reproduces the full run's maps without touching the frame source."""
    import shutil

    full = builder.build_from_frames(
        clip.frames, CFG, checkpoint_dir=str(tmp_path)
    )

    def untouched():
        raise AssertionError("frame source read during resume")

    # latest checkpoint is "filtered": only the artifact clean re-runs
    r1 = builder.build(
        untouched, CFG, checkpoint_dir=str(tmp_path), resume=True
    )
    assert len(r1.maps) == len(full.maps)
    for a, b in zip(r1.maps, full.maps):
        np.testing.assert_array_equal(a, b)

    # drop "filtered": resume replays splice/filter/clean from "collect"
    shutil.rmtree(tmp_path / "filtered")
    r2 = builder.build(
        untouched, CFG, checkpoint_dir=str(tmp_path), resume=True
    )
    assert len(r2.maps) == len(full.maps)
    for a, b in zip(r2.maps, full.maps):
        np.testing.assert_array_equal(a, b)
    # ... and re-saves the filtered checkpoint as it passes the boundary
    assert (tmp_path / "filtered" / "meta.json").exists()

    # no checkpoint present: resume falls through to a normal full run
    r3 = builder.build_from_frames(
        clip.frames, CFG,
        checkpoint_dir=str(tmp_path / "fresh"), resume=True,
    )
    for a, b in zip(r3.maps, full.maps):
        np.testing.assert_array_equal(a, b)


def test_builder_composes_feed_crop(clip, tmp_path):
    """A feed constructed with its own crop must compose with the window
    crop (the builder offsets the window Rect by the feed's crop origin
    — replacing it would silently crop the wrong raw region)."""
    from remap_tpu.core.geometry import Rect
    from remap_tpu.io.frames import RawDirectoryFeed

    pad_t, pad_l = 6, 8
    d = tmp_path / "frames"
    d.mkdir()
    fh, fw = clip.frames[0].shape
    for i, f in enumerate(clip.frames):
        raw = np.zeros((fh + 10, fw + 12), np.uint8)
        raw[pad_t : pad_t + fh, pad_l : pad_l + fw] = f
        raw.tofile(str(d / str(i)))

    feed = RawDirectoryFeed(
        str(d), fw + 12, fh + 10,
        crop=Rect(left=pad_l, top=pad_t, right=pad_l + fw,
                  bottom=pad_t + fh),
    )
    res = builder.build(lambda: feed, CFG)
    ref = builder.build_from_frames(clip.frames, CFG)
    assert len(res.maps) == len(ref.maps)
    for a, b in zip(res.maps, ref.maps):
        np.testing.assert_array_equal(a, b)


def test_pipeline_no_window():
    frames = [np.full((48, 64), 3, np.uint8)] * 10
    res = builder.build_from_frames(frames, CFG)
    assert res.maps == [] and res.window is None


def test_splice_merges_like_spec():
    rng = np.random.default_rng(11)
    world = testing.make_world(160, 224, rng)
    path_a = [(20 + i, 30) for i in range(8)]
    path_b = [(40 + i, 34) for i in range(8)]
    clip_a = testing.render_clip(world, path_a, (64, 96))
    clip_b = testing.render_clip(world, path_b, (64, 96))
    noise = rng.integers(0, 16, size=(64, 96), dtype=np.uint8)
    frames = clip_a.frames + [noise] + clip_b.frames

    from remap_tpu.pipeline import collect as jcollect
    from remap_tpu.spec import fgs as sfgs
    from remap_tpu.spec import frc as sfrc
    from remap_tpu.core.regions import make_layout

    cfg = PipelineConfig(
        screen_width=96, screen_height=64,
        region_capacity=2048, splice_capacity=4096, frame_batch=8,
    )
    col = jcollect.collect(frames, cfg)
    assert len(col.fragments) == 3
    spliced = jsplice.splice(col.fragments, cfg)

    layout = make_layout(96, 64, 4, 2, 16)
    sfrags = sfrc.collect(frames, layout)
    sspliced = sfgs.splice(sfrags)

    assert len(spliced) == len(sspliced)
    j_sorted = sorted(spliced, key=lambda f: len(f.frames))
    s_sorted = sorted(sspliced, key=lambda f: len(f.frames))
    for jf, sf in zip(j_sorted, s_sorted):
        assert len(jf.frames) == len(sf.frames)
        assert jf.dots.shape == sf.dots.shape
        np.testing.assert_array_equal(jf.dots, sf.dots)
        assert sorted((r.number, r.position) for r in jf.frames) == sorted(
            (r.number, r.position) for r in sf.frames
        )


def test_arf_ops_match_spec():
    rng = np.random.default_rng(17)
    # tiled (frequent) background with a rare-pattern scratch
    tile = rng.integers(0, 16, size=(8, 8), dtype=np.uint8)
    image = np.tile(tile, (10, 12)).astype(np.uint8)
    image[40, 30:70] = (np.arange(40) * 7 % 16).astype(np.uint8)
    mask = np.ones_like(image)
    mask[3, 5] = 0  # a hole breaks pattern runs

    sh = sarf.heat_counts(image, mask, 15, axis=1)
    sv = sarf.heat_counts(image, mask, 15, axis=0)
    sheat = sarf.combine(sh, sv)

    jheat = np.asarray(jarf.heatmap(jnp.asarray(image), jnp.asarray(mask)))
    with np.errstate(invalid="ignore"):
        np.testing.assert_allclose(jheat, sheat, rtol=1e-6)

    dots = np.zeros(image.shape + (16,), dtype=np.uint16)
    ys, xs = np.indices(image.shape)
    dots[ys, xs, image] = 7
    # sprinkle competing votes so blur has something to reselect
    dots[ys, xs, (image.astype(int) + 1) % 16] += 2

    sout = sarf.select(dots, sheat, 2.0)
    jres = jarf.select(jnp.asarray(dots), jnp.asarray(jheat))
    jout = np.asarray(jres.image)
    unstable = np.asarray(jres.unstable)
    if unstable.any():
        ys, xs = np.nonzero(unstable)
        jout = jout.copy()
        jout[ys, xs] = jarf.canonical_rare_picks(dots, ys, xs, 2.0)
    np.testing.assert_array_equal(sout, jout)
