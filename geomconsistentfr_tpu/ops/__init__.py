from geomconsistentfr_tpu.ops import geometry, shading, shadows  # noqa: F401
