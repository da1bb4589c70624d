"""Motion detector (ops.motion — functional equivalent of mod.hpp)."""

import numpy as np
import jax.numpy as jnp

from remap_tpu.ops import motion


def scene(sprite_xy):
    img = np.zeros((40, 60), np.uint8)
    img[4:36, 4:56] = 1                      # background
    sx, sy = sprite_xy
    img[sy : sy + 6, sx : sx + 6] = 9        # sprite
    img[20:26, 40:46] = 5                    # static object
    return img


def test_moving_sprite_detected():
    prev = scene((10, 10))
    curr = scene((13, 12))
    res = motion.detect(
        jnp.asarray(prev), jnp.asarray(curr),
        jnp.asarray(np.zeros(2, np.int32)), half=4,
    )
    moving = np.asarray(res.moving)
    offs = np.asarray(res.offset)
    labels = np.asarray(
        __import__("remap_tpu.ops.cc", fromlist=["cc"]).label_components(
            jnp.asarray(curr)
        )
    )
    sprite_label = labels[14, 15]  # inside the moved sprite
    static_label = labels[22, 42]
    assert moving[sprite_label]
    # forward motion since the previous frame: curr - prev = (3, 2)
    assert tuple(offs[sprite_label]) == (3, 2)
    assert not moving[static_label]


def test_no_motion_without_change():
    img = scene((10, 10))
    res = motion.detect(
        jnp.asarray(img), jnp.asarray(img.copy()),
        jnp.asarray(np.zeros(2, np.int32)), half=3,
    )
    assert not np.asarray(res.moving).any()


def test_global_adjustment_compensated():
    # camera moved by (5, 3); the static object should NOT be flagged when
    # the adjustment is supplied
    base = scene((10, 10))
    prev = base
    curr = np.roll(base, (-3, -5), axis=(0, 1))  # camera +5x +3y
    res = motion.detect(
        jnp.asarray(prev), jnp.asarray(curr),
        jnp.asarray(np.array([5, 3], np.int32)), half=3,
    )
    labels = np.asarray(
        __import__("remap_tpu.ops.cc", fromlist=["cc"]).label_components(
            jnp.asarray(curr)
        )
    )
    static_label = labels[19, 37]  # static object, shifted by the roll
    assert not np.asarray(res.moving)[static_label]
