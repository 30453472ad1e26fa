"""Checkpoint save/restore (orbax).

The reference only ever *saves* (torch.save per epoch,
train_raytracing_...py:684-685) and has no resume path; here checkpointing is
step-level and restorable (SURVEY.md §5 'Checkpoint / resume').
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_variables(path: str, tree: Any) -> None:
    """Save a pytree (e.g. model variables or a full TrainState) to `path`."""
    path = os.path.abspath(path)
    _checkpointer().save(path, jax.device_get(tree), force=True)


def restore_variables(path: str, template: Optional[Any] = None) -> Any:
    """Restore a pytree saved with `save_variables`."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if template is None:
        return _checkpointer().restore(path)
    return _checkpointer().restore(
        path, args=ocp.args.PyTreeRestore(item=template)
    )


def latest_step_dir(root: str) -> Optional[str]:
    """Find the highest-numbered step_* checkpoint directory under root."""
    if not os.path.isdir(root):
        return None
    steps = []
    for name in os.listdir(root):
        if name.startswith("step_"):
            try:
                steps.append((int(name.split("_", 1)[1]), name))
            except ValueError:
                continue
    if not steps:
        return None
    return os.path.join(root, max(steps)[1])
