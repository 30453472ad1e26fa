"""End-to-end parity: JAX framework vs the reference PyTorch forward.

The committed fixture tests/golden/ref_transfer_00104.npz holds the reference
lighting-transfer forward (bundled checkpoint model_epoch106.pth, CPU) on an
FFHQ sample; regenerate with tools/make_golden_fixture.py. These tests convert
the same checkpoint and require the full pipeline (encoder/decoders, lighting
head, kornia-parity normals, branchless shadow march, shading composite) to
reproduce it. North-star: rendered PSNR >= 40 dB (BASELINE.md).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.conftest import reference_available

CKPT = "/root/reference/model_lighting_transfer/model_epoch106.pth"
FIXTURE = os.path.join(os.path.dirname(__file__), "golden", "ref_transfer_00104.npz")


@pytest.fixture(scope="module")
def fixture():
    return np.load(FIXTURE)


@pytest.fixture(scope="module")
def outputs(fixture):
    if not os.path.exists(CKPT):
        pytest.skip("reference checkpoint unavailable")
    import dataclasses

    from geomconsistentfr_tpu.config import preset_lighting_transfer
    from geomconsistentfr_tpu.convert import load_relightnet_variables
    from geomconsistentfr_tpu.infer import Relighter

    cfg = preset_lighting_transfer()
    # 'highest' precision isolates implementation parity from XLA's fast
    # (bf16-pass) conv kernels; the default path is separately checked below.
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, conv_precision="highest")
    )
    variables = jax.tree.map(jnp.asarray, load_relightnet_variables(CKPT))
    relighter = Relighter(cfg, variables)
    return relighter.forward(
        fixture["image"][None],
        fixture["mask"][None],
        target_light=fixture["target_light"],
        target_ambient=fixture["target_ambient"],
    )


def _nchw_to_nhwc(x):
    return np.moveaxis(x, 1, -1)


def test_albedo_parity(outputs, fixture):
    got = np.asarray(outputs.albedo)
    want = _nchw_to_nhwc(fixture["albedo"])
    assert np.abs(got - want).max() < 2e-3


def test_depth_parity(outputs, fixture):
    got = np.asarray(outputs.depth)
    want = fixture["depth"].reshape(got.shape)
    # depth spans ~[-54, 70]; tolerance is ~0.05% of the range
    assert np.abs(got - want).max() < 0.08


def test_lighting_head_parity(outputs, fixture):
    np.testing.assert_allclose(
        np.asarray(outputs.estimated_unit_light_direction).ravel(),
        fixture["est_dir"].ravel(),
        atol=5e-4,
    )
    np.testing.assert_allclose(
        np.asarray(outputs.estimated_ambient).ravel(),
        fixture["est_amb"].ravel(),
        atol=5e-4,
    )


def test_normals_parity(outputs, fixture):
    got = np.asarray(outputs.surface_normals)
    want = _nchw_to_nhwc(fixture["normals"])
    assert np.abs(got - want).mean() < 2e-3


def test_shadow_weights_parity(outputs, fixture):
    got = np.asarray(outputs.shadow_mask_weights)
    want = fixture["shadow_weights"].reshape(got.shape)
    assert np.abs(got - want).mean() < 1e-3


def test_rendered_psnr_north_star(outputs, fixture):
    got = np.asarray(outputs.rendered)
    want = _nchw_to_nhwc(fixture["rendered"])
    mse = float(np.mean((got - want) ** 2))
    psnr = 10.0 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr >= 45.0, f"rendered PSNR {psnr:.2f} dB below target"


def test_bottom_left_light_parity():
    """Second transfer-path fixture with a bottom-left light (A60E-20): the
    pixel->light segments exit through different border zones than the
    upper-right fixture, exercising the corner branches of the endpoint solve
    end to end against the reference forward."""
    if not os.path.exists(CKPT):
        pytest.skip("reference checkpoint unavailable")
    import dataclasses

    from geomconsistentfr_tpu.config import preset_lighting_transfer
    from geomconsistentfr_tpu.convert import load_relightnet_variables
    from geomconsistentfr_tpu.infer import Relighter

    fx = np.load(
        os.path.join(
            os.path.dirname(__file__), "golden", "ref_transfer_00508_bottomleft.npz"
        )
    )
    cfg = preset_lighting_transfer()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, conv_precision="highest")
    )
    variables = jax.tree.map(jnp.asarray, load_relightnet_variables(CKPT))
    rl = Relighter(cfg, variables)
    out = rl.forward(
        fx["image"][None],
        fx["mask"][None],
        target_light=fx["target_light"],
        target_ambient=fx["target_ambient"],
    )
    got = np.asarray(out.rendered)
    want = _nchw_to_nhwc(fx["rendered"])
    mse = float(np.mean((got - want) ** 2))
    psnr = 10.0 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr >= 45.0, f"bottom-left-light PSNR {psnr:.2f} dB"
    sw = np.asarray(out.shadow_mask_weights)
    assert np.abs(sw - fx["shadow_weights"].reshape(sw.shape)).mean() < 1e-3


def test_inside_light_parity():
    """Light xy inside the image: the endpoint IS the light (reference :400-402)
    and every ray converges on it — the remaining endpoint family, end to end.
    Also exercises the near-degenerate slope guards (+1e-4 epsilons)."""
    if not os.path.exists(CKPT):
        pytest.skip("reference checkpoint unavailable")
    import dataclasses

    from geomconsistentfr_tpu.config import preset_lighting_transfer
    from geomconsistentfr_tpu.convert import load_relightnet_variables
    from geomconsistentfr_tpu.infer import Relighter

    fx = np.load(
        os.path.join(
            os.path.dirname(__file__), "golden", "ref_transfer_00322_insidelight.npz"
        )
    )
    cfg = preset_lighting_transfer()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, conv_precision="highest")
    )
    variables = jax.tree.map(jnp.asarray, load_relightnet_variables(CKPT))
    rl = Relighter(cfg, variables)
    out = rl.forward(
        fx["image"][None],
        fx["mask"][None],
        target_light=fx["target_light"],
        target_ambient=fx["target_ambient"],
    )
    got = np.asarray(out.rendered)
    want = _nchw_to_nhwc(fx["rendered"])
    mse = float(np.mean((got - want) ** 2))
    psnr = 10.0 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr >= 45.0, f"inside-light PSNR {psnr:.2f} dB"
    sw = np.asarray(out.shadow_mask_weights)
    assert np.abs(sw - fx["shadow_weights"].reshape(sw.shape)).mean() < 1e-3


def test_target_lighting_path_parity():
    """End-to-end parity of the single_image (target-lighting) preset against
    the reference test_relight_single_image forward — run with the embedded
    transfer->target weights (fixture from tools/make_golden_fixture_target.py).
    Covers the target-variant 3x3 shortcuts, ambient est-0.1, the inside-image
    +5.0 gate, and f=1570 intrinsics."""
    if not os.path.exists(CKPT):
        pytest.skip("reference checkpoint unavailable")
    import dataclasses

    from geomconsistentfr_tpu.config import preset_single_image
    from geomconsistentfr_tpu.infer import load_relighter

    fx = np.load(
        os.path.join(os.path.dirname(__file__), "golden", "ref_target_00295.npz")
    )
    cfg = preset_single_image()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, conv_precision="highest")
    )
    rl = load_relighter(CKPT, cfg=cfg)  # auto-embeds transfer -> target
    out = rl.forward(fx["image"][None], fx["mask"][None], target_light=fx["target_light"])

    got = np.asarray(out.rendered)
    want = _nchw_to_nhwc(fx["rendered"])
    mse = float(np.mean((got - want) ** 2))
    psnr = 10.0 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr >= 45.0, f"target-path rendered PSNR {psnr:.2f} dB"

    sw = np.asarray(out.shadow_mask_weights)
    assert np.abs(sw - fx["shadow_weights"].reshape(sw.shape)).mean() < 1e-3


NEW_TARGET_FIXTURES = [
    # The six bundled FFHQ triples whose recorded generating presets
    # (/root/reference/test_relight_single_image.py:519-562) were not covered
    # by the original four fixtures: right low-elevation (MP4), left high-z
    # (MP9), far-left (MP10) and upper-left (MP17) light classes.
    "ref_target_00110_mp4.npz",
    "ref_target_00300_mp4.npz",
    "ref_target_00525_mp4.npz",
    "ref_target_00290_mp9.npz",
    "ref_target_00572_mp10.npz",
    "ref_target_00695_mp17.npz",
]


@pytest.fixture(scope="module")
def target_relighter():
    if not os.path.exists(CKPT):
        pytest.skip("reference checkpoint unavailable")
    import dataclasses

    from geomconsistentfr_tpu.config import preset_single_image
    from geomconsistentfr_tpu.infer import load_relighter

    cfg = preset_single_image()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, conv_precision="highest")
    )
    return load_relighter(CKPT, cfg=cfg)


@pytest.mark.parametrize("fname", NEW_TARGET_FIXTURES)
def test_target_light_class_parity(target_relighter, fname):
    """All remaining bundled light classes, end to end vs the reference
    forward (one shared compile; fixtures from make_golden_fixture_target.py)."""
    fx = np.load(os.path.join(os.path.dirname(__file__), "golden", fname))
    out = target_relighter.forward(
        fx["image"][None], fx["mask"][None], target_light=fx["target_light"]
    )
    got = np.asarray(out.rendered)
    want = _nchw_to_nhwc(fx["rendered"])
    mse = float(np.mean((got - want) ** 2))
    psnr = 10.0 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr >= 45.0, f"{fname} rendered PSNR {psnr:.2f} dB"
    sw = np.asarray(out.shadow_mask_weights)
    assert np.abs(sw - fx["shadow_weights"].reshape(sw.shape)).mean() < 1e-3


def test_rendered_psnr_default_precision(fixture):
    """The fast (default-precision) path still clears the 40 dB north star."""
    if not os.path.exists(CKPT):
        pytest.skip("reference checkpoint unavailable")
    from geomconsistentfr_tpu.config import preset_lighting_transfer
    from geomconsistentfr_tpu.convert import load_relightnet_variables
    from geomconsistentfr_tpu.infer import Relighter

    variables = jax.tree.map(jnp.asarray, load_relightnet_variables(CKPT))
    relighter = Relighter(preset_lighting_transfer(), variables)
    out = relighter.forward(
        fixture["image"][None],
        fixture["mask"][None],
        target_light=fixture["target_light"],
        target_ambient=fixture["target_ambient"],
    )
    want = _nchw_to_nhwc(fixture["rendered"])
    mse = float(np.mean((np.asarray(out.rendered) - want) ** 2))
    psnr = 10.0 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr >= 40.0, f"default-precision PSNR {psnr:.2f} dB below north star"
