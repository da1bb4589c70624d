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
