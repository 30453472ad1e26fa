"""RelightNet architecture behaviour tests (small shapes, random weights)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from geomconsistentfr_tpu.config import ModelConfig
from geomconsistentfr_tpu.models.relightnet import RelightNet


@pytest.fixture(scope="module")
def setup():
    model = RelightNet(cfg=ModelConfig(variant="target"))
    x = jnp.asarray(
        np.random.default_rng(0).uniform(size=(2, 64, 64, 3)).astype(np.float32)
    )
    variables = model.init(jax.random.PRNGKey(1), x, train=False)
    return model, variables, x


def test_output_shapes_and_ranges(setup):
    model, variables, x = setup
    out = model.apply(variables, x, train=False)
    assert out.albedo.shape == (2, 64, 64, 3)
    assert out.depth.shape == (2, 64, 64)
    assert out.lighting.shape == (2, 4)
    assert float(out.albedo.min()) >= 0.0 and float(out.albedo.max()) <= 1.0


def test_skip_gates_change_outputs(setup):
    """Each epoch gate measurably alters the decoders (reference :218-257)."""
    model, variables, x = setup
    prev = model.apply(variables, x, train=False, use_skips=(False,) * 4)
    gates = [
        (True, False, False, False),
        (True, True, False, False),
        (True, True, True, False),
        (True, True, True, True),
    ]
    for g in gates:
        cur = model.apply(variables, x, train=False, use_skips=g)
        assert not np.allclose(np.asarray(cur.albedo), np.asarray(prev.albedo))
        # lighting head is upstream of the gates: unchanged
        np.testing.assert_allclose(
            np.asarray(cur.lighting), np.asarray(prev.lighting), atol=1e-6
        )
        prev = cur


def test_skip_gate_epochs_match_reference():
    cfg = ModelConfig()
    assert cfg.skip_gates(0) == (False, False, False, False)
    assert cfg.skip_gates(9) == (True, False, False, False)
    assert cfg.skip_gates(11) == (True, True, False, False)
    assert cfg.skip_gates(13) == (True, True, True, False)
    assert cfg.skip_gates(15) == (True, True, True, True)
    assert cfg.skip_gates(200) == (True, True, True, True)


def test_variants_have_different_shortcut_shapes():
    target = RelightNet(cfg=ModelConfig(variant="target"))
    transfer = RelightNet(cfg=ModelConfig(variant="transfer"))
    x = jnp.zeros((1, 64, 64, 3))
    vt = jax.eval_shape(lambda: target.init(jax.random.PRNGKey(0), x))
    vx = jax.eval_shape(lambda: transfer.init(jax.random.PRNGKey(0), x))
    t_sc = vt["params"]["conv_shortcut_h1_out"]
    x_sc = vx["params"]["conv_shortcut_h1_out"]
    assert t_sc["kernel"].shape == (3, 3, 16, 32) and "bias" in t_sc
    assert x_sc["kernel"].shape == (1, 1, 16, 32) and "bias" not in x_sc


def test_parameter_count_matches_reference():
    """Trainable-parameter counts verified against the bundled checkpoint:
    model_epoch106.pth has exactly 932,449 trainable values (weights+biases,
    excl. BN running stats); the target variant's 3x3+bias shortcuts add
    272,347 more. (SURVEY §2.1's derived figures were 64 high.)"""
    x = jnp.zeros((1, 256, 256, 3))
    for variant, want in [("target", 1_204_796), ("transfer", 932_449)]:
        model = RelightNet(cfg=ModelConfig(variant=variant))
        shapes = jax.eval_shape(lambda m=model: m.init(jax.random.PRNGKey(0), x))
        n = sum(int(np.prod(v.shape)) for v in jax.tree.leaves(shapes["params"]))
        assert n == want, (variant, n, want)


def test_bfloat16_compute_dtype(setup):
    """compute_dtype='bfloat16' keeps params/BN stats f32, returns f32
    outputs close to the f32 path, and updates BN stats in train mode."""
    model, variables, x = setup
    bf16 = RelightNet(cfg=ModelConfig(variant="target", compute_dtype="bfloat16"))

    # Same variables work for both (params are stored f32 regardless).
    ref = model.apply(variables, x, train=False)
    out = bf16.apply(variables, x, train=False)
    for field in ("albedo", "depth", "lighting"):
        assert getattr(out, field).dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(out.albedo), np.asarray(ref.albedo), atol=0.05
    )
    np.testing.assert_allclose(
        np.asarray(out.lighting), np.asarray(ref.lighting), atol=0.05
    )

    # Fresh init under bf16 still stores f32 params and f32 BN stats.
    v2 = bf16.init(jax.random.PRNGKey(1), x, train=False)
    for leaf in jax.tree.leaves(v2):
        assert leaf.dtype == jnp.float32

    # Train mode updates running stats in f32.
    _, mutated = bf16.apply(v2, x, train=True, mutable=["batch_stats"])
    for leaf in jax.tree.leaves(mutated["batch_stats"]):
        assert leaf.dtype == jnp.float32


def test_compute_dtype_rejects_unknown():
    bad = RelightNet(cfg=ModelConfig(compute_dtype="float16"))
    with pytest.raises(ValueError, match="compute_dtype"):
        bad.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
