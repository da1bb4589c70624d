"""CLI end-to-end as a subprocess (the reference binary's contract)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from remap_tpu.utils import testing


@pytest.fixture(scope="module")
def clip_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("clip")
    clip = testing.simple_clip(
        n_frames=24, frame_hw=(72, 96), world_hw=(200, 260), seed=7,
        hud_rows=8, border=4, max_step=4,
    )
    for i, f in enumerate(clip.frames):
        f.tofile(d / str(i))
    return d


def run_cli(*args):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [sys.executable, "-m", "remap_tpu.cli", *args, "--cpu"],
        capture_output=True,
        text=True,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )


def test_cli_builds_map(clip_dir, tmp_path):
    out = str(tmp_path / "map")
    r = run_cli(
        str(clip_dir), "--width", "96", "--height", "72",
        "--frame-batch", "8", "--region-capacity", "2048",
        "--out-prefix", out,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "wrote" in r.stdout
    from PIL import Image

    img = np.asarray(Image.open(out + "1.png"))
    assert img.ndim == 3 and img.shape[2] == 3
    assert img.shape[0] > 30 and img.shape[1] > 50


def test_cli_no_frames(tmp_path):
    r = run_cli(str(tmp_path))
    assert r.returncode == 1
    assert "no frames" in r.stderr


def test_cli_missing_dir():
    r = run_cli("/definitely/not/a/dir")
    assert r.returncode == 1
    assert "cannot read frames" in r.stderr


@pytest.mark.slow
def test_cli_png_format(clip_dir, tmp_path):
    # convert the raw clip to PNG frames and run the png feed
    import numpy as np
    from remap_tpu.core import palette
    from PIL import Image

    png_dir = tmp_path / "png"
    png_dir.mkdir()
    for f in sorted(clip_dir.iterdir(), key=lambda p: int(p.name)):
        img = np.fromfile(f, dtype=np.uint8).reshape(72, 96)
        Image.fromarray(palette.native_to_rgb(img)).save(
            png_dir / f"{f.name}.png"
        )
    out = str(tmp_path / "pngmap")
    r = run_cli(
        str(png_dir), "--format", "png",
        "--frame-batch", "8", "--region-capacity", "2048",
        "--out-prefix", out,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    img = np.asarray(Image.open(out + "1.png"))
    assert img.shape[2] == 3


def test_cli_custom_palette(clip_dir, tmp_path):
    """--palette re-derives the luminance tables AND the PNG colors: the
    same raw clip under 'ega' emits a map drawn in EGA RGB."""
    out = str(tmp_path / "egamap")
    r = run_cli(
        str(clip_dir), "--width", "96", "--height", "72",
        "--frame-batch", "8", "--region-capacity", "2048",
        "--palette", "ega", "--out-prefix", out,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    from PIL import Image

    from remap_tpu.core import palette

    img = np.asarray(Image.open(out + "1.png"))
    colors = {tuple(c) for c in img.reshape(-1, 3)}
    ega = {tuple(c) for c in
           palette._derive(palette.PRESETS["ega"])[0].tolist()}
    assert colors <= ega
    # and it genuinely differs from the C64 rendering of the same clip
    c64 = {tuple(c) for c in palette.NATIVE_TO_RGB.tolist()}
    assert not (colors <= c64)
