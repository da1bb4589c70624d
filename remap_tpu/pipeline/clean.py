"""Artifact-clean stage (mpb.hpp:79-94 on TPU).

Per fragment: blend, rare-pattern heatmap, conditional Gaussian color
re-selection (ops.arf), then crop the canvas's empty margins
(arf.hpp:314-328).  Fragments are independent — the reference used a CPU
thread pool here; on TPU each fragment is one device program and multiple
fragments simply queue.
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp
import numpy as np

from remap_tpu.config import PipelineConfig
from remap_tpu.ops import arf as arf_ops
from remap_tpu.ops import atlas as atlas_ops
from remap_tpu.pipeline.state import Fragment


def margins_of(dots: np.ndarray) -> tuple:
    nonempty = dots.any(axis=2)
    h, w = nonempty.shape
    if not nonempty.any():
        return (w, h, w, h)
    cols = np.nonzero(nonempty.any(axis=0))[0]
    rows = np.nonzero(nonempty.any(axis=1))[0]
    return (
        int(cols[0]),
        int(rows[0]),
        int(w - 1 - cols[-1]),
        int(h - 1 - rows[-1]),
    )


def clean_fragment(frag: Fragment, cfg: PipelineConfig) -> np.ndarray:
    dots = jnp.asarray(frag.dots)
    image, mask = atlas_ops.blend(dots)
    out = arf_ops.filter_fragment(
        dots,
        image,
        mask,
        size=cfg.artifact_filter_size,
        dev=cfg.artifact_filter_dev,
        threshold=cfg.artifact_heat_threshold,
    )
    out_np = np.asarray(out)
    left, top, right, bottom = margins_of(frag.dots)
    h, w = out_np.shape
    return out_np[top : h - bottom, left : w - right]


def clean(fragments: List[Fragment], cfg: PipelineConfig) -> List[np.ndarray]:
    import jax

    devs = jax.local_devices()
    if len(devs) > 1 and len(fragments) > 1:
        # the reference's parallel transform (mpb.hpp:82) on the mesh:
        # fragments round-robin across devices, dispatched async,
        # fetched after all dispatches (parallel.fragments)
        from remap_tpu.parallel.fragments import clean_fragments

        return clean_fragments(fragments, cfg, devs)
    return [clean_fragment(f, cfg) for f in fragments]
