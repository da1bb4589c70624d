"""Map builder: the five-stage orchestrator (mpb.hpp:28-41 on TPU).

``build()`` = window scan -> cropped re-feed -> collect -> splice ->
foreground filter -> artifact clean -> native-code map images.  Every
stage boundary invokes the callbacks object with full intermediate state —
the reference's observability seam (mpb.hpp:44-77, main.cpp:127-192) —
and can checkpoint fragments to disk (io.checkpoint, the reference's
unused ful.hpp made real).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Iterable, List, Optional, Sequence

import numpy as np

from remap_tpu.config import PipelineConfig
from remap_tpu.pipeline import clean as clean_stage
from remap_tpu.pipeline import collect as collect_stage
from remap_tpu.pipeline import foreground as fg_stage
from remap_tpu.pipeline import splice as splice_stage
from remap_tpu.pipeline import window as window_stage
from remap_tpu.pipeline.state import Fragment
from remap_tpu.spec.aws import WindowInfo
from remap_tpu.utils.profiling import PerfCounter


class Callbacks:
    """Per-stage observation hooks (default: no-ops).

    Mirrors the reference's callbacks seam: every stage hands back its
    full intermediate state (mpb.hpp:44-77)."""

    def on_window(self, window: Optional[WindowInfo]) -> None: ...

    def on_collect(self, result: collect_stage.CollectResult) -> None: ...

    def on_splice(self, fragments: List[Fragment]) -> None: ...

    def on_filter(self, fragments: List[Fragment]) -> None: ...

    def on_clean(self, images: List[np.ndarray]) -> None: ...


class PerfCallbacks(Callbacks):
    """fps logging like the reference's perf_counter (main.cpp:54-110)."""

    def __init__(self) -> None:
        self.counters = {}

    def _count(self, name: str, n: int) -> None:
        c = self.counters.setdefault(name, PerfCounter(name, 1))
        for _ in range(n):
            c.count()
        c.report()

    def on_collect(self, result) -> None:
        self._count("frc", len(result.offsets))

    def on_filter(self, fragments) -> None:
        self._count("fdf", sum(len(f.frames) for f in fragments))


@dataclasses.dataclass
class BuildResult:
    maps: List[np.ndarray]
    window: Optional[WindowInfo]
    fragments: List[Fragment]
    collect: Optional[collect_stage.CollectResult]


def build(
    frames_factory: Callable[[], Iterable[np.ndarray]],
    cfg: PipelineConfig,
    callbacks: Optional[Callbacks] = None,
    checkpoint_dir: Optional[str] = None,
) -> BuildResult:
    """``frames_factory()`` must yield the frame stream anew on each call
    (the reference re-feeds the files after the window scan, mpb.hpp:32).
    """
    cb = callbacks or Callbacks()

    window = window_stage.scan(frames_factory(), cfg)
    cb.on_window(window)
    if window is None:
        return BuildResult(maps=[], window=None, fragments=[], collect=None)

    crop = window.crop

    def cropped():
        for f in frames_factory():
            yield f[crop.top : crop.bottom, crop.left : crop.right]

    col = collect_stage.collect(cropped(), cfg)
    cb.on_collect(col)
    if checkpoint_dir:
        from remap_tpu.io import checkpoint

        checkpoint.save(checkpoint_dir, "collect", col.fragments)

    spliced = splice_stage.splice(col.fragments, cfg)
    cb.on_splice(spliced)

    filtered = fg_stage.filter_fragments(spliced, cfg)
    cb.on_filter(filtered)
    if checkpoint_dir:
        from remap_tpu.io import checkpoint

        checkpoint.save(checkpoint_dir, "filtered", filtered)

    maps = clean_stage.clean(filtered, cfg)
    cb.on_clean(maps)
    return BuildResult(
        maps=maps, window=window, fragments=filtered, collect=col
    )


def build_from_frames(
    frames: Sequence[np.ndarray],
    cfg: PipelineConfig,
    **kwargs,
) -> BuildResult:
    return build(lambda: iter(frames), cfg, **kwargs)
