"""Multi-host initialisation (SURVEY.md §5 'Distributed communication backend').

The reference is single-process/single-GPU; multi-host TPU slices here use
jax.distributed + the same 1-D data mesh spanning all processes. Collectives
(psum of gradients / loss reductions, pmean of BN moments) ride ICI within a
slice and DCN across slices — XLA inserts them from the shard_map program.

Typical pod entrypoint:

    from geomconsistentfr_tpu.parallel import distributed
    distributed.initialize()            # no-op on single process
    mesh = distributed.global_mesh()    # all devices across all hosts
    trainer = Trainer(cfg, data=..., mesh=mesh)
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from geomconsistentfr_tpu.parallel.mesh import DATA_AXIS, make_mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize with env-var fallbacks; no-op single-process.

    Honours JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID when
    arguments are omitted (TPU pods usually auto-detect all three).
    """
    num = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if num <= 1 and coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address
        or os.environ.get("JAX_COORDINATOR_ADDRESS"),
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(axis: str = DATA_AXIS):
    """1-D mesh over every device of every process."""
    return make_mesh(jax.devices(), axis=axis)


def local_batch_slice(global_batch: int) -> slice:
    """This process's slice of a globally-sharded batch (per-host loading)."""
    n = jax.process_count()
    per = global_batch // n
    assert per * n == global_batch, (global_batch, n)
    start = jax.process_index() * per
    return slice(start, start + per)
