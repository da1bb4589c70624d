"""Synthetic gameplay-clip generation.

The reference ships no tests or fixtures (SURVEY.md §4); correctness is
instead established against generated clips with *known* geometry: a world
map is sampled by a scrolling camera, optionally with moving sprites and a
static HUD/border, giving exact expected per-frame offsets, fragment
breaks, and (for sprite-free clips) a pixel-exact expected map.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np


def make_world(
    height: int,
    width: int,
    rng: np.random.Generator,
    tile: int = 4,
    colors: int = 16,
) -> np.ndarray:
    """A busy tiled world map: block-structured with per-pixel detail so
    every neighbourhood is distinctive (plenty of keypoints)."""
    th, tw = height // tile + 1, width // tile + 1
    base = rng.integers(0, colors, size=(th, tw), dtype=np.uint8)
    base = np.kron(base, np.ones((tile, tile), dtype=np.uint8))[:height, :width]
    detail = rng.integers(0, colors, size=(height, width), dtype=np.uint8)
    mask = rng.random((height, width)) < 0.25
    return np.where(mask, detail, base).astype(np.uint8)


@dataclasses.dataclass
class Clip:
    frames: List[np.ndarray]
    #: Camera position (x, y) of each frame in world coordinates.
    positions: List[Tuple[int, int]]
    world: np.ndarray

    @property
    def offsets(self) -> List[Tuple[int, int]]:
        """Expected match offsets: prev_pos - curr_pos... in *keypoint*
        convention the offset is prev_point - curr_point = curr_cam -
        prev_cam."""
        out = []
        for i in range(1, len(self.positions)):
            px, py = self.positions[i - 1]
            cx, cy = self.positions[i]
            out.append((cx - px, cy - py))
        return out


def make_camera_path(
    n: int,
    world_hw: Tuple[int, int],
    frame_hw: Tuple[int, int],
    rng: np.random.Generator,
    max_step: int = 3,
    start: Optional[Tuple[int, int]] = None,
) -> List[Tuple[int, int]]:
    wh, ww = world_hw
    fh, fw = frame_hw
    if start is None:
        x = (ww - fw) // 2
        y = (wh - fh) // 2
    else:
        x, y = start
    path = [(x, y)]
    for _ in range(n - 1):
        x = int(np.clip(x + rng.integers(-max_step, max_step + 1), 0, ww - fw))
        y = int(np.clip(y + rng.integers(-max_step, max_step + 1), 0, wh - fh))
        path.append((x, y))
    return path


def render_clip(
    world: np.ndarray,
    path: Sequence[Tuple[int, int]],
    frame_hw: Tuple[int, int],
    rng: Optional[np.random.Generator] = None,
    n_sprites: int = 0,
    sprite_size: int = 6,
    hud_rows: int = 0,
    border: int = 0,
    hud_bottom_rows: int = 0,
) -> Clip:
    """Render frames along the camera path.

    ``hud_rows``/``hud_bottom_rows``/``border`` add static rows at the
    top / bottom / a static frame around the action window (for aws
    tests); sprites are solid moving rectangles drawn over the world
    (for fde/fdf tests).
    """
    fh, fw = frame_hw
    frames = []
    rng = rng or np.random.default_rng(0)

    sprites = []
    for _ in range(n_sprites):
        color = int(rng.integers(0, 16))
        sx = int(rng.integers(0, fw - sprite_size))
        sy = int(
            rng.integers(
                hud_rows + border,
                fh - border - hud_bottom_rows - sprite_size,
            )
        )
        sprites.append([sx, sy, color])

    hud = rng.integers(0, 16, size=(hud_rows, fw), dtype=np.uint8)
    hud_bottom = rng.integers(
        0, 16, size=(hud_bottom_rows, fw), dtype=np.uint8
    )

    for x, y in path:
        frame = world[y : y + fh, x : x + fw].copy()
        for s in sprites:
            sx, sy, color = s
            frame[sy : sy + sprite_size, sx : sx + sprite_size] = color
            s[0] = int(
                np.clip(sx + rng.integers(-2, 3), 0, fw - sprite_size)
            )
            s[1] = int(
                np.clip(
                    sy + rng.integers(-2, 3),
                    hud_rows + border,
                    fh - border - hud_bottom_rows - sprite_size,
                )
            )
        if hud_rows:
            frame[:hud_rows] = hud
        if hud_bottom_rows:
            frame[-hud_bottom_rows:] = hud_bottom
        if border:
            frame[:border] = 5
            frame[-border:] = 5
            frame[:, :border] = 5
            frame[:, -border:] = 5
        frames.append(frame)

    return Clip(frames=frames, positions=list(path), world=world)


def simple_clip(
    n_frames: int = 24,
    frame_hw: Tuple[int, int] = (64, 96),
    world_hw: Tuple[int, int] = (160, 224),
    seed: int = 0,
    max_step: int = 3,
    **kwargs,
) -> Clip:
    rng = np.random.default_rng(seed)
    world = make_world(*world_hw, rng=rng)
    path = make_camera_path(n_frames, world_hw, frame_hw, rng, max_step=max_step)
    return render_clip(world, path, frame_hw, rng=rng, **kwargs)
