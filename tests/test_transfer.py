"""Packed pytree transfer (utils/transfer.py): round-trip exactness.

The packed path is latency armor for the axon tunnel (one transfer per dtype
group instead of one per leaf); on CPU it is normally a passthrough, so these
tests force the packed implementation to validate the concat/slice logic.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from geomconsistentfr_tpu.utils.transfer import pack_device_get, pack_device_put


def _tree():
    rng = np.random.default_rng(0)
    return {
        "params": {
            "conv1": {"kernel": rng.normal(size=(3, 3, 4, 8)).astype(np.float32),
                      "bias": rng.normal(size=(8,)).astype(np.float32)},
            "bn": {"scale": rng.normal(size=(8,)).astype(np.float32)},
        },
        "step": np.int32(17),
        "counts": rng.integers(0, 100, size=(5,)).astype(np.int32),
        "half": rng.normal(size=(4, 4)).astype(jnp.bfloat16),
        "scalar": np.float32(2.5),
    }


def _assert_tree_equal(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        x, y = np.asarray(x), np.asarray(y)
        assert x.dtype == y.dtype, (x.dtype, y.dtype)
        assert x.shape == y.shape, (x.shape, y.shape)
        np.testing.assert_array_equal(x, y)


def test_pack_put_roundtrip_forced():
    tree = _tree()
    on_dev = pack_device_put(tree, force=True)
    for leaf in jax.tree.leaves(on_dev):
        assert isinstance(leaf, jax.Array)
    _assert_tree_equal(tree, jax.device_get(on_dev))


def test_pack_get_roundtrip_forced():
    tree = jax.tree.map(jnp.asarray, _tree())
    host = pack_device_get(tree, force=True)
    for leaf in jax.tree.leaves(host):
        assert isinstance(leaf, np.ndarray) or np.isscalar(leaf)
    _assert_tree_equal(tree, host)


def test_pack_put_then_get_identity():
    tree = _tree()
    back = pack_device_get(pack_device_put(tree, force=True), force=True)
    _assert_tree_equal(tree, back)


def test_empty_and_single_leaf():
    assert pack_device_put({}, force=True) == {}
    assert pack_device_get({}, force=True) == {}
    one = {"x": np.arange(6, dtype=np.float32).reshape(2, 3)}
    _assert_tree_equal(one, jax.device_get(pack_device_put(one, force=True)))


def test_structure_preserved():
    tree = _tree()
    out = pack_device_put(tree, force=True)
    assert jax.tree.structure(out) == jax.tree.structure(tree)
