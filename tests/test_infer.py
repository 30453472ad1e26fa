"""Relighter API tests on a small random-weight model (CPU)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from geomconsistentfr_tpu.config import preset_single_image
from geomconsistentfr_tpu.infer import Relighter
from geomconsistentfr_tpu.models.relightnet import RelightNet


@pytest.fixture(scope="module")
def small_relighter():
    cfg = preset_single_image()
    cfg = dataclasses.replace(
        cfg,
        render=dataclasses.replace(
            cfg.render,
            img_height=64,
            img_width=64,
            num_sample_points=16,
            t_stop=0.105,
            march_chunk=16,
            use_pallas_shadows=False,
        ),
    )
    model = RelightNet(cfg=cfg.model)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    return Relighter(cfg, variables)


def test_sweep_matches_individual_forwards(small_relighter):
    rl = small_relighter
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(64, 64, 3)).astype(np.float32)
    mask = np.ones((64, 64), np.float32)
    lights = np.asarray(
        [[0.0, 0.7071, 0.7071], [0.7518, 0.0, 0.6594], [-0.5843, 0.0, 0.8115]],
        np.float32,
    )
    ambients = np.asarray([0.5, 0.4, 0.6], np.float32)

    sweep = rl.relight_sweep(img, mask, lights, ambients)
    assert sweep.rendered.shape == (3, 64, 64, 3)
    for i in range(3):
        single = rl.forward(
            img[None], mask[None],
            target_light=lights[i : i + 1],
            target_ambient=ambients[i : i + 1],
        )
        np.testing.assert_allclose(
            np.asarray(sweep.rendered[i]),
            np.asarray(single.rendered[0]),
            atol=1e-5,
        )


def test_transfer_uses_estimated_light(small_relighter):
    # Transfer semantics need ambient_mode='target' (the single_image preset
    # deliberately ignores the target ambient, reference :342).
    rl0 = small_relighter
    cfg = dataclasses.replace(
        rl0.cfg,
        render=dataclasses.replace(
            rl0.cfg.render, ambient_mode="target", z_clamp_min=0.16
        ),
    )
    rl = Relighter(cfg, rl0.variables)
    rng = np.random.default_rng(1)
    img = rng.uniform(size=(1, 64, 64, 3)).astype(np.float32)
    ref = rng.uniform(size=(1, 64, 64, 3)).astype(np.float32)
    mask = np.ones((1, 64, 64), np.float32)

    unit, ambient = rl.estimate_lighting(ref)
    np.testing.assert_allclose(np.linalg.norm(unit, axis=1), 1.0, rtol=1e-5)
    assert unit[0, 2] > 0  # z clamp applied before normalisation
    out = rl.transfer_lighting(img, ref, mask)
    np.testing.assert_allclose(
        np.asarray(out.unit_light_direction), unit, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(out.ambient_values), ambient, atol=1e-6)


def test_forward_outputs_shapes(small_relighter):
    rl = small_relighter
    rng = np.random.default_rng(2)
    img = rng.uniform(size=(2, 64, 64, 3)).astype(np.float32)
    mask = np.ones((2, 64, 64), np.float32)
    out = rl.forward(img, mask, target_light=np.tile([[0.0, 0.0, 1.0]], (2, 1)))
    assert out.albedo.shape == (2, 64, 64, 3)
    assert out.depth.shape == (2, 64, 64)
    assert out.rendered.shape == (2, 64, 64, 3)
    assert out.shadow_mask_weights.shape == (2, 64, 64)
    assert out.surface_normals.shape == (2, 64, 64, 3)
    assert bool(jnp.isfinite(out.rendered).all())


def test_visual_pack_matches_float_path(small_relighter, tmp_path):
    """Device-quantized visual pack writes the same PNGs as the host float
    path (save_render_outputs); both hold the six reference outputs."""
    import imageio.v2 as imageio

    from geomconsistentfr_tpu.infer import VISUAL_PACK_LAYOUT
    from geomconsistentfr_tpu.utils.io import save_render_outputs, save_visual_pack

    rng = np.random.default_rng(3)
    img = rng.uniform(size=(2, 64, 64, 3)).astype(np.float32)
    mask = (rng.uniform(size=(2, 64, 64)) > 0.3).astype(np.float32)
    light = np.array([[0.69, 0.4, 0.6], [-0.76, 0.0, 0.65]], np.float32)
    amb = np.array([0.5, 0.4], np.float32)

    out = small_relighter.forward(img, mask, target_light=light, target_ambient=amb)
    pack = np.asarray(
        small_relighter.forward_visuals(
            img, mask, target_light=light, target_ambient=amb
        )
    )
    assert pack.shape == (2, 64, 64, sum(w for _, w in VISUAL_PACK_LAYOUT))
    assert pack.dtype == np.uint8

    a_dir, b_dir = tmp_path / "float", tmp_path / "pack"
    a_dir.mkdir(), b_dir.mkdir()
    for k in range(2):
        single = type(out)(
            **{
                f: np.asarray(getattr(out, f))[k : k + 1]
                for f in out._fields
            }
        )
        save_render_outputs(str(a_dir), f"im{k}", single, mask[k])
        save_visual_pack(str(b_dir), f"im{k}", pack[k])
    for k in range(2):
        for kind, _ in VISUAL_PACK_LAYOUT:
            a = imageio.imread(a_dir / f"im{k}_{kind}.png").astype(np.int16)
            b = imageio.imread(b_dir / f"im{k}_{kind}.png").astype(np.int16)
            diff = np.abs(a - b)
            # f32-on-device vs f64-on-host can flip a unit at quantization
            # boundaries; anything larger is a real transform mismatch.
            assert diff.max() <= 1, (kind, k, diff.max())
            assert (diff > 0).mean() < 0.01, (kind, k, (diff > 0).mean())


def test_uint8_inputs_match_float_path(small_relighter):
    """uint8 batches (device-side /255) produce bit-identical results to the
    equivalent f32 inputs — uploads are bytes, semantics unchanged."""
    rng = np.random.default_rng(11)
    img_u8 = rng.integers(0, 256, (2, 64, 64, 3)).astype(np.uint8)
    mask_u8 = (rng.uniform(size=(2, 64, 64)) > 0.3).astype(np.uint8) * 255
    light = np.array([[0.69, 0.4, 0.6], [-0.76, 0.0, 0.65]], np.float32)
    amb = np.array([0.5, 0.4], np.float32)

    img_f = img_u8.astype(np.float32) / 255.0
    mask_f = mask_u8.astype(np.float32) / 255.0

    out_f = small_relighter.forward(img_f, mask_f, target_light=light,
                                    target_ambient=amb)
    out_u = small_relighter.forward(img_u8, mask_u8, target_light=light,
                                    target_ambient=amb)
    # XLA lowers the device-side /255 to a reciprocal multiply: 1-ulp
    # (~6e-8) drift vs the host division, amplified to ~1e-4 worst-case
    # through the depth(x100)->normals->shading chain.
    for f in out_f._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(out_f, f)), np.asarray(getattr(out_u, f)),
            atol=2e-4, err_msg=f,
        )

    pack_f = np.asarray(small_relighter.forward_visuals(
        img_f, mask_f, target_light=light, target_ambient=amb))
    pack_u = np.asarray(small_relighter.forward_visuals(
        img_u8, mask_u8, target_light=light, target_ambient=amb))
    assert np.abs(pack_f.astype(int) - pack_u.astype(int)).max() <= 1

    u_f, a_f = small_relighter.estimate_lighting(img_f)
    u_u, a_u = small_relighter.estimate_lighting(img_u8)
    np.testing.assert_allclose(u_f, u_u, atol=1e-6)
    np.testing.assert_allclose(a_f, a_u, atol=1e-6)


def test_sweep_accepts_uint8_inputs(small_relighter):
    """relight_sweep(_rendered_u8) honors the uint8-input convention."""
    rng = np.random.default_rng(13)
    img_u8 = rng.integers(0, 256, (64, 64, 3)).astype(np.uint8)
    mask_u8 = (rng.uniform(size=(64, 64)) > 0.3).astype(np.uint8) * 255
    lights = np.array([[0.69, 0.4, 0.6], [-0.76, 0.0, 0.65]], np.float32)

    t_f = np.asarray(small_relighter.relight_sweep_rendered_u8(
        img_u8.astype(np.float32) / 255.0, mask_u8.astype(np.float32) / 255.0,
        lights))
    t_u = np.asarray(small_relighter.relight_sweep_rendered_u8(
        img_u8, mask_u8, lights))
    assert np.abs(t_f.astype(int) - t_u.astype(int)).max() <= 1

    out_f = small_relighter.relight_sweep(
        img_u8.astype(np.float32) / 255.0, mask_u8.astype(np.float32) / 255.0,
        lights)
    out_u = small_relighter.relight_sweep(img_u8, mask_u8, lights)
    np.testing.assert_allclose(
        np.asarray(out_f.rendered), np.asarray(out_u.rendered), atol=2e-4)
