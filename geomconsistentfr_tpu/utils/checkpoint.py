"""Checkpoint save/restore (orbax).

The reference only ever *saves* (torch.save per epoch,
train_raytracing_...py:684-685) and has no resume path; here checkpointing is
step-level and restorable (SURVEY.md §5 'Checkpoint / resume').
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


import functools


@functools.lru_cache(maxsize=1)
def _checkpointer():
    # ONE process-wide checkpointer: every PyTreeCheckpointer instance
    # retains ~0.2x the saved bytes for the life of the process (measured
    # 9.3 MB/save for a 40 MB tree on this image's orbax when constructed
    # per call; 0.0 with a singleton) — per-epoch saves in a 100-epoch
    # protocol run would leak GBs.
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def _malloc_trim() -> None:
    """Return freed glibc arena pages to the OS. The per-epoch save's
    transient peak (host fetch + orbax scratch atop the metrics buffers)
    otherwise ratchets the process high-water RSS up every epoch."""
    try:
        import ctypes

        ctypes.CDLL("libc.so.6").malloc_trim(0)
    except Exception:  # non-glibc / no ctypes: RSS just stays high-water
        pass


def save_variables(path: str, tree: Any) -> None:
    """Save a pytree (e.g. model variables or a full TrainState) to `path`."""
    from geomconsistentfr_tpu.utils.transfer import pack_device_get

    path = os.path.abspath(path)
    # Packed fetch: a plain device_get pays a tunnel round trip PER LEAF
    # (~0.3 s x ~865 TrainState leaves = minutes for tens of MB); the packed
    # path is one jitted pack dispatch + one fetch per dtype group.
    _checkpointer().save(path, pack_device_get(tree), force=True)
    _malloc_trim()


def restore_variables(path: str, template: Optional[Any] = None) -> Any:
    """Restore a pytree saved with `save_variables`."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if template is None:
        return _checkpointer().restore(path)
    return _checkpointer().restore(
        path, args=ocp.args.PyTreeRestore(item=template)
    )


def _step_dirs(root: str) -> list[tuple[int, str]]:
    if not os.path.isdir(root):
        return []
    steps = []
    for name in os.listdir(root):
        if name.startswith("step_"):
            try:
                steps.append((int(name.split("_", 1)[1]), name))
            except ValueError:
                continue
    return sorted(steps)


def latest_step_dir(root: str) -> Optional[str]:
    """Find the highest-numbered step_* checkpoint directory under root."""
    steps = _step_dirs(root)
    if not steps:
        return None
    return os.path.join(root, steps[-1][1])


def prune_step_dirs(root: str, keep: int) -> list[str]:
    """Retention policy: delete all but the newest `keep` step_* checkpoints.

    keep <= 0 disables pruning (keep everything). Returns the removed paths.
    The reference keeps every per-epoch torch.save (train_raytracing_...py:
    684-685) and fills the disk on long runs; this bounds checkpoint storage
    while resume always uses latest_step_dir.
    """
    import shutil

    if keep <= 0:
        return []
    removed = []
    for _, name in _step_dirs(root)[:-keep]:
        path = os.path.join(root, name)
        shutil.rmtree(path)
        removed.append(path)
    return removed
