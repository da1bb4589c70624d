"""Fuzzed parity: device matcher vs NumPy spec over many random scenes.

Broad randomized evidence for the bit-exactness claims (beyond the
hand-picked cases): random worlds, random camera jumps, random weight
switches — every declared offset must match the spec's exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from remap_tpu.core.regions import make_layout
from remap_tpu.ops import kpe as jkpe
from remap_tpu.ops import kpm as jkpm
from remap_tpu.ops import tables as jtab
from remap_tpu.spec import kpe as skpe
from remap_tpu.spec import kpm as skpm
from remap_tpu.utils import testing


@pytest.mark.parametrize("seed", range(10))
def test_random_scene_match_parity(seed):
    rng = np.random.default_rng(1000 + seed)
    world = testing.make_world(
        140, 180, rng, tile=int(rng.integers(2, 10))
    )
    h, w = 48, 64
    layout = make_layout(w, h, 4, 2, 8)
    ws = int(rng.integers(0, 20))

    frames = []
    x, y = 40, 40
    for _ in range(6):
        frames.append(world[y : y + h, x : x + w])
        x = int(np.clip(x + rng.integers(-6, 7), 0, 180 - w))
        y = int(np.clip(y + rng.integers(-6, 7), 0, 140 - h))
    # throw in an unrelated frame
    frames.insert(3, rng.integers(0, 16, size=(h, w), dtype=np.uint8))

    imgs = jnp.asarray(np.stack(frames))
    dense = jkpe.extract_dense(imgs, layout)
    tabs = jtab.extract_tables(dense.weight, dense.codes, layout, 2048)
    prev = jax.tree.map(lambda a: a[:-1], tabs)
    curr = jax.tree.map(lambda a: a[1:], tabs)
    res = jkpm.match_tables_jit(prev, curr, layout, weight_switch=ws)
    assert not bool(np.asarray(res.overflow).any())

    specs = [skpe.extract(f, layout) for f in frames]
    for t in range(1, len(frames)):
        s = skpm.match_frames(
            specs[t - 1].regions, specs[t].regions, weight_switch=ws
        )
        j = (
            tuple(int(v) for v in np.asarray(res.offset[t - 1]))
            if res.ok[t - 1]
            else None
        )
        assert j == s, (seed, t, j, s)
