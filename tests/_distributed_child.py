"""Child process for the 2-process jax.distributed test (test_distributed.py).

Usage: python -m tests._distributed_child <process_id> <coordinator_port>
           [shared_ckpt_dir]
Prints "OK <process_id> <psum>" after the collective check; with a
shared_ckpt_dir it additionally runs a REAL data-parallel train step over
the 2-process global mesh, a cross-process orbax save/restore round-trip,
and prints "CKPT <process_id> match" when the resumed step's metrics equal
the uninterrupted ones.
"""

import sys


def main() -> int:
    process_id = int(sys.argv[1])
    port = sys.argv[2]
    ckpt_dir = sys.argv[3] if len(sys.argv) > 3 else None

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

    if ckpt_dir:
        _train_and_checkpoint(mesh, ndev, ckpt_dir, process_id)
    return 0


def _train_and_checkpoint(mesh, ndev, ckpt_dir, process_id) -> None:
    """A real DP train step over the multi-process mesh + orbax round-trip.

    This is the pod failure-recovery path (SURVEY §5): every process loads
    ITS OWN batch rows, the step psums across processes, all processes save
    the (replicated) TrainState, and a restore must continue the run with
    metrics identical to the uninterrupted step.
    """
    import dataclasses
    import os

    import numpy as np

    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from geomconsistentfr_tpu.config import preset_target_lighting_train
    from geomconsistentfr_tpu.parallel import distributed
    from geomconsistentfr_tpu.train import init_state, make_data_parallel_step
    from geomconsistentfr_tpu.utils import checkpoint as ckpt_util

    size = 16
    cfg = preset_target_lighting_train()
    cfg = dataclasses.replace(
        cfg,
        render=dataclasses.replace(
            cfg.render, img_height=size, img_width=size,
            num_sample_points=8, t_stop=0.065, march_chunk=8,
        ),
        train=dataclasses.replace(cfg.train, batch_size=ndev),
    )

    # init_state is deterministic from the seed, so every process builds the
    # same replicated initial state.
    state = init_state(cfg, jax.random.PRNGKey(0), batch_size=ndev)
    step_fn = make_data_parallel_step(cfg, mesh)

    rng = np.random.default_rng(0)  # same seed -> same GLOBAL batch
    full_batch = {
        "image": rng.uniform(0, 1, (ndev, size, size, 3)).astype(np.float32),
        "face_mask": np.ones((ndev, size, size), np.float32),
        "depth_gt": rng.normal(size=(ndev, size, size)).astype(np.float32),
        "depth_mask": np.ones((ndev, size, size), np.float32),
        "albedo_gt": rng.uniform(0, 1, (ndev, size, size)).astype(np.float32),
        "light_gt": np.tile(
            np.asarray([[0.0, 0.7071, 0.7071]], np.float32), (ndev, 1)
        ),
    }
    sl = distributed.local_batch_slice(ndev)
    sharding = NamedSharding(mesh, P("data"))
    batch = {
        k: jax.make_array_from_process_local_data(sharding, v[sl], v.shape)
        for k, v in full_batch.items()
    }

    gates = (False, False, False, False)
    state1, _ = step_fn(state, batch, gates)

    path = os.path.join(ckpt_dir, "step_1")
    ckpt_util.save_variables(path, state1)

    restored_host = ckpt_util.restore_variables(
        path, template=jax.device_get(state1)
    )
    restored = jax.device_put(restored_host, NamedSharding(mesh, P()))

    _, metrics_cont = step_fn(state1, batch, gates)
    _, metrics_res = step_fn(restored, batch, gates)
    metrics_cont = jax.device_get(metrics_cont)
    metrics_res = jax.device_get(metrics_res)
    import math

    for k in metrics_cont:
        a, b = float(metrics_cont[k]), float(metrics_res[k])
        # Bitwise-equal or both-NaN (discriminator metrics are NaN on
        # non-update steps under GD_ratio; NaN != NaN in float compare).
        assert a == b or (math.isnan(a) and math.isnan(b)), (k, a, b)
    print(f"CKPT {process_id} match", flush=True)


if __name__ == "__main__":
    raise SystemExit(main())
