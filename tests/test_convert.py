"""Weight-converter and layer-equivalence tests against torch."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from geomconsistentfr_tpu.convert import (
    torch_state_to_variables,
    variables_to_torch_state,
)


def test_roundtrip():
    rng = np.random.default_rng(0)
    state = {
        "conv_a.weight": rng.normal(size=(8, 4, 3, 3)).astype(np.float32),
        "conv_a.bias": rng.normal(size=(8,)).astype(np.float32),
        "deconv_b.weight": rng.normal(size=(4, 8, 3, 3)).astype(np.float32),
        "deconv_b.bias": rng.normal(size=(8,)).astype(np.float32),
        "linear_c.weight": rng.normal(size=(16, 32)).astype(np.float32),
        "linear_c.bias": rng.normal(size=(16,)).astype(np.float32),
        "bn_d.weight": rng.normal(size=(8,)).astype(np.float32),
        "bn_d.bias": rng.normal(size=(8,)).astype(np.float32),
        "bn_d.running_mean": rng.normal(size=(8,)).astype(np.float32),
        "bn_d.running_var": rng.uniform(0.5, 2, size=(8,)).astype(np.float32),
        "bn_d.num_batches_tracked": np.asarray(7, np.int64),
    }
    back = variables_to_torch_state(torch_state_to_variables(state))
    for k, v in state.items():
        if k.endswith("num_batches_tracked"):
            continue
        np.testing.assert_allclose(back[k], v, err_msg=k)


def test_conv_transpose_equivalence():
    """ConvTranspose2d(k3, s1, p1) == conv with flipped, transposed weights."""
    torch = pytest.importorskip("torch")

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 6, 16, 16)).astype(np.float32)
    w = rng.normal(size=(6, 4, 3, 3)).astype(np.float32)  # (in, out, kh, kw)
    b = rng.normal(size=(4,)).astype(np.float32)

    with torch.no_grad():
        want = torch.nn.functional.conv_transpose2d(
            torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b), padding=1
        ).numpy()

    kernel = w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)  # HWIO
    got = jax.lax.conv_general_dilated(
        jnp.asarray(np.moveaxis(x, 1, -1)),
        jnp.asarray(np.ascontiguousarray(kernel)),
        (1, 1),
        ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision="highest",
    ) + b
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(got), -1, 1), want, atol=2e-5
    )


def test_conv_transpose_1x1_equivalence():
    torch = pytest.importorskip("torch")

    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 6, 8, 8)).astype(np.float32)
    w = rng.normal(size=(6, 4, 1, 1)).astype(np.float32)
    with torch.no_grad():
        want = torch.nn.functional.conv_transpose2d(
            torch.from_numpy(x), torch.from_numpy(w)
        ).numpy()
    kernel = w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)
    got = jax.lax.conv_general_dilated(
        jnp.asarray(np.moveaxis(x, 1, -1)),
        jnp.asarray(np.ascontiguousarray(kernel)),
        (1, 1),
        ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision="highest",
    )
    np.testing.assert_allclose(np.moveaxis(np.asarray(got), -1, 1), want, atol=2e-5)


def test_torch_batchnorm_train_semantics():
    """TorchBatchNorm matches torch BatchNorm2d in train mode, incl. the
    running-stat updates (biased normalise, unbiased running var)."""
    torch = pytest.importorskip("torch")

    from geomconsistentfr_tpu.models.layers import TorchBatchNorm

    rng = np.random.default_rng(3)
    x = rng.normal(size=(3, 8, 8, 5)).astype(np.float32) * 2 + 1

    tbn = torch.nn.BatchNorm2d(5)
    with torch.no_grad():
        tbn.weight.copy_(torch.from_numpy(rng.normal(size=(5,)).astype(np.float32)))
        tbn.bias.copy_(torch.from_numpy(rng.normal(size=(5,)).astype(np.float32)))
    tbn.train()
    with torch.no_grad():
        want = tbn(torch.from_numpy(np.moveaxis(x, -1, 1))).numpy()

    model = TorchBatchNorm(5)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), use_running_average=False)
    variables = {
        "params": {
            "scale": jnp.asarray(tbn.weight.detach().numpy()),
            "bias": jnp.asarray(tbn.bias.detach().numpy()),
        },
        "batch_stats": variables["batch_stats"],
    }
    got, mutated = model.apply(
        variables, jnp.asarray(x), use_running_average=False, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(
        np.asarray(got), np.moveaxis(want, 1, -1), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["mean"]),
        tbn.running_mean.numpy(),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["var"]),
        tbn.running_var.numpy(),
        rtol=1e-5,
    )


def test_real_checkpoint_roundtrip_exact():
    """load -> Flax -> back to torch layout reproduces model_epoch106 exactly."""
    import os

    if not os.path.exists("/root/reference/model_lighting_transfer/model_epoch106.pth"):
        pytest.skip("reference checkpoint unavailable")
    from geomconsistentfr_tpu.convert import (
        load_torch_checkpoint,
        torch_state_to_variables,
        variables_to_torch_state,
    )

    state = load_torch_checkpoint(
        "/root/reference/model_lighting_transfer/model_epoch106.pth"
    )
    back = variables_to_torch_state(torch_state_to_variables(state))
    for key, value in state.items():
        if key.endswith("num_batches_tracked"):
            continue
        np.testing.assert_array_equal(back[key], value, err_msg=key)


def test_transfer_to_target_variant_identical_function():
    """The 1x1->3x3 shortcut embedding preserves the function exactly."""
    from geomconsistentfr_tpu.config import ModelConfig
    from geomconsistentfr_tpu.convert import transfer_to_target_variant
    from geomconsistentfr_tpu.models.relightnet import RelightNet

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)).astype(np.float32))

    transfer = RelightNet(cfg=ModelConfig(variant="transfer"))
    v_transfer = transfer.init(jax.random.PRNGKey(2), x)
    v_target = jax.tree.map(jnp.asarray, transfer_to_target_variant(v_transfer))
    target = RelightNet(cfg=ModelConfig(variant="target"))

    out_t = transfer.apply(v_transfer, x, train=False)
    out_g = target.apply(v_target, x, train=False)
    np.testing.assert_allclose(
        np.asarray(out_g.albedo), np.asarray(out_t.albedo), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out_g.depth), np.asarray(out_t.depth), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out_g.lighting), np.asarray(out_t.lighting), atol=1e-6
    )


def test_checkpoint_structure_matches_model():
    """Converted reference checkpoint maps 1:1 onto RelightNet variables."""
    import os

    if not os.path.exists("/root/reference/model_lighting_transfer/model_epoch106.pth"):
        pytest.skip("reference checkpoint unavailable")

    from geomconsistentfr_tpu.config import ModelConfig
    from geomconsistentfr_tpu.convert import load_relightnet_variables
    from geomconsistentfr_tpu.models.relightnet import RelightNet

    conv = load_relightnet_variables(
        "/root/reference/model_lighting_transfer/model_epoch106.pth"
    )
    model = RelightNet(cfg=ModelConfig(variant="transfer"))
    init = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)))
    )
    init_paths = {
        jax.tree_util.keystr(k): v.shape
        for k, v in jax.tree_util.tree_flatten_with_path(init)[0]
    }
    conv_paths = {
        jax.tree_util.keystr(k): np.shape(v)
        for k, v in jax.tree_util.tree_flatten_with_path(conv)[0]
    }
    assert init_paths == conv_paths
    # 391 tensors minus 56 num_batches_tracked = 335 arrays
    assert len(conv_paths) == 335
