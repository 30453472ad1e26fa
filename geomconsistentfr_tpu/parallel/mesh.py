"""Device mesh and sharding helpers.

The reference is single-process single-GPU (SURVEY.md §2.3); parallel scaling
is a new first-class subsystem here:
  * data parallelism over a 1-D `data` mesh axis (images, and the 18-light
    sweep at eval time), gradients reduced with psum over ICI,
  * cross-replica BatchNorm (lax.pmean of batch moments inside the modules,
    see models/layers.TorchBatchNorm) so small per-replica batches keep the
    reference's single-device statistics.

Multi-host execution uses jax.distributed + the same mesh spanning all
processes; nothing here assumes a single process.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence] = None, axis: str = DATA_AXIS) -> Mesh:
    """A 1-D data-parallel mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


SAMPLES_AXIS = "samples"


def make_mesh_grid(
    n_data: int,
    n_samples: int,
    devices: Optional[Sequence] = None,
    axes: tuple = (DATA_AXIS, SAMPLES_AXIS),
) -> Mesh:
    """A 2-D (data x samples) mesh for infer.Relighter(parallel='grid'):
    the first axis shards inference batches, the second shards the shadow
    march's sample grid (pmin-combined). Lay the samples axis along the
    faster ICI dimension when the slice topology allows — the per-image
    pmin is the only traffic on it."""
    if devices is None:
        devices = jax.devices()
    n = n_data * n_samples
    if len(devices) < n:
        raise ValueError(
            f"need {n} devices for a {n_data}x{n_samples} grid, "
            f"have {len(devices)}"
        )
    return Mesh(np.asarray(devices[:n]).reshape(n_data, n_samples), axes)


def shard_batch_spec(ndim: int, axis: str = DATA_AXIS) -> P:
    """Partition the leading (batch) dimension over the data axis."""
    return P(axis, *([None] * (ndim - 1)))


def replicated() -> P:
    return P()


def shard_map_fn(
    fn: Callable,
    mesh: Mesh,
    in_specs,
    out_specs,
    check_vma: bool = False,
):
    """Version-tolerant shard_map wrapper."""
    if hasattr(jax, "shard_map"):
        return jax.shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=check_vma
        )
    from jax.experimental.shard_map import shard_map  # pragma: no cover

    return shard_map(
        fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_rep=check_vma
    )


def device_put_sharded_batch(batch: dict, mesh: Mesh, axis: str = DATA_AXIS) -> dict:
    """Place a host batch dict onto the mesh, sharded over the batch axis."""
    return {
        k: jax.device_put(v, NamedSharding(mesh, shard_batch_spec(np.ndim(v), axis)))
        for k, v in batch.items()
    }
