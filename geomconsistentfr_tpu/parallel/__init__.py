from geomconsistentfr_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    make_mesh,
    replicated,
    shard_batch_spec,
    shard_map_fn,
)
