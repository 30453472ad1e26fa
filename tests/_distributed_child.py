"""Child process for the 2-process jax.distributed test (test_distributed.py).

Usage: python -m tests._distributed_child <process_id> <coordinator_port>
Prints one line "OK <process_id> <psum>" on success.
"""

import sys


def main() -> int:
    process_id = int(sys.argv[1])
    port = sys.argv[2]

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from geomconsistentfr_tpu.parallel import distributed

    distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2,
        process_id=process_id,
    )
    assert jax.process_count() == 2, jax.process_count()
    assert jax.process_index() == process_id

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    mesh = distributed.global_mesh()
    ndev = len(jax.devices())
    nlocal = len(jax.local_devices())
    assert ndev == 2 * nlocal, (ndev, nlocal)

    # Per-host slice loading: this process contributes its own rows.
    sl = distributed.local_batch_slice(ndev)
    full = np.arange(ndev, dtype=np.float32) + 1.0
    local = full[sl]
    sharding = NamedSharding(mesh, P("data"))
    x = jax.make_array_from_process_local_data(sharding, local, full.shape)

    @jax.jit
    def global_sum(v):
        return shard_map(
            lambda s: jax.lax.psum(jnp.sum(s), "data"),
            mesh=mesh,
            in_specs=P("data"),
            out_specs=P(),
        )(v)

    total = float(global_sum(x))
    expect = float(full.sum())
    assert total == expect, (total, expect)
    print(f"OK {process_id} {total}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
