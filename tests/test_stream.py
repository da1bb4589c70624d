"""StreamingStitcher equals the batch collect stage."""

import numpy as np

from remap_tpu.config import PipelineConfig
from remap_tpu.pipeline import collect as jcollect
from remap_tpu.pipeline.stream import StreamingStitcher
from remap_tpu.utils import testing

CFG = PipelineConfig(
    screen_width=96, screen_height=64, region_capacity=1024, frame_batch=5
)


def test_streaming_matches_collect():
    rng = np.random.default_rng(81)
    clip = testing.simple_clip(n_frames=13, frame_hw=(64, 96), seed=81)
    noise = rng.integers(0, 16, size=(64, 96), dtype=np.uint8)
    frames = clip.frames[:7] + [noise] + clip.frames[7:]

    batch_res = jcollect.collect(frames, CFG)

    st = StreamingStitcher(CFG)
    for i in range(0, len(frames), 5):
        st.push(np.stack(frames[i : i + 5]))
    frags = st.finish()

    assert len(frags) == len(batch_res.fragments)
    for a, b in zip(frags, batch_res.fragments):
        np.testing.assert_array_equal(a.dots, b.dots)
        assert [(r.number, r.position) for r in a.frames] == [
            (r.number, r.position) for r in b.frames
        ]


def test_streaming_reports_needed_capacity():
    """needed_capacity tracks the true per-region keypoint maximum: when
    tables overflow, re-running at exactly that size must clear the
    table flags (the capacity re-run hint for streaming consumers)."""
    import dataclasses

    clip = testing.simple_clip(n_frames=10, frame_hw=(64, 96), seed=5)

    tiny = dataclasses.replace(CFG, region_capacity=128)
    st = StreamingStitcher(tiny)
    for i in range(0, 10, 5):
        st.push(np.stack(clip.frames[i : i + 5]))
    assert st.overflow_frames > 0          # 128 cannot hold this content
    need = st.needed_capacity
    assert need > 128

    # pow2-rounded re-run at the reported size: table flags must clear
    cap = 1 << (need - 1).bit_length()
    st2 = StreamingStitcher(dataclasses.replace(CFG, region_capacity=cap))
    for i in range(0, 10, 5):
        st2.push(np.stack(clip.frames[i : i + 5]))
    assert st2.needed_capacity == need     # content measure, not config
    res = jcollect.collect(clip.frames, dataclasses.replace(
        CFG, region_capacity=cap))
    assert res.overflow_frames == 0
