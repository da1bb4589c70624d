"""xcorr model family: FFT correlation alignment (ops.correlate)."""

from __future__ import annotations

import jax

from remap_tpu.ops import correlate


def make_matcher(cfg, radius: int = 48):
    @jax.jit
    def match(prev_frames, curr_frames):
        res = correlate.match_xcorr(prev_frames, curr_frames, radius=radius)
        return res.offset, res.ok

    return match
