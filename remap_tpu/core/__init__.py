from remap_tpu.core import geometry, palette, regions  # noqa: F401
