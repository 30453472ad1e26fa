"""The driver's multi-chip gate must pass regardless of invocation order.

Round-1 regression: `dryrun_multichip(8)` returned rc=1 under the driver
because something resolved the (single-chip) axon backend before the
function's in-process `jax.config.update("jax_platforms", "cpu")` fallback
ran. The rewrite re-execs the step in a child process with a scrubbed env,
so it must now pass even when the calling process has already locked in a
backend with the wrong device count — exactly the situation inside this
test suite (conftest pins an 8-device CPU mesh, and jax is resolved by
earlier tests).
"""

import os
import sys

import pytest


def _load_graft_entry():
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo_root)
    try:
        import __graft_entry__
    finally:
        sys.path.pop(0)
    return __graft_entry__


def test_dryrun_multichip_is_invocation_order_proof():
    import jax

    jax.devices()  # deliberately lock in this process's backend first
    graft = _load_graft_entry()
    graft.dryrun_multichip(8)  # raises (with child output) on failure


def test_dryrun_multichip_propagates_child_failure():
    graft = _load_graft_entry()
    env_backup = dict(os.environ)
    # Force the child to die early: a bogus XLA flag makes jax abort.
    os.environ["XLA_FLAGS"] = "--definitely_not_a_real_xla_flag"
    try:
        with pytest.raises(RuntimeError, match="child failed"):
            graft.dryrun_multichip(2)
    finally:
        os.environ.clear()
        os.environ.update(env_backup)
