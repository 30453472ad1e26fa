"""Renderer-mode semantics tests (fake net outputs, small shapes, CPU)."""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from geomconsistentfr_tpu.config import RenderConfig
from geomconsistentfr_tpu.render import render

BASE = RenderConfig(
    img_height=32,
    img_width=32,
    num_sample_points=16,
    t_stop=0.105,
    march_chunk=16,
    use_pallas_shadows=False,
    shadow_bias_gate="none",
)


def _inputs(b=2):
    rng = np.random.default_rng(0)
    albedo = jnp.asarray(rng.uniform(size=(b, 32, 32, 3)).astype(np.float32))
    depth = jnp.asarray((rng.normal(size=(b, 32, 32)) * 10).astype(np.float32))
    lighting = jnp.asarray(rng.normal(size=(b, 4)).astype(np.float32))
    mask = jnp.ones((b, 32, 32))
    return albedo, depth, lighting, mask


def test_ambient_modes():
    albedo, depth, lighting, mask = _inputs()
    base = dataclasses.replace(BASE, lighting_mode="self_estimated")
    est = render(albedo, depth, lighting, mask, base)  # ambient_mode='estimated'
    np.testing.assert_allclose(
        np.asarray(est.ambient_values), np.asarray(lighting[:, 0]), atol=1e-6
    )

    minus = render(
        albedo, depth, lighting, mask,
        dataclasses.replace(base, ambient_mode="estimated_minus_0.1"),
    )
    np.testing.assert_allclose(
        np.asarray(minus.ambient_values),
        np.asarray(lighting[:, 0]) - 0.1,
        atol=1e-6,
    )

    target = render(
        albedo, depth, lighting, mask,
        dataclasses.replace(base, ambient_mode="target"),
        target_ambient=jnp.asarray([0.3, 0.7]),
    )
    np.testing.assert_allclose(
        np.asarray(target.ambient_values), [0.3, 0.7], atol=1e-6
    )


def test_lighting_modes_and_z_clamp():
    albedo, depth, lighting, mask = _inputs()
    # self_estimated: unit direction from head channels 1:4 with z clamped.
    lighting = lighting.at[:, 3].set(jnp.asarray([-0.5, 0.4]))
    cfg = dataclasses.replace(BASE, lighting_mode="self_estimated", z_clamp_min=0.0)
    out = render(albedo, depth, lighting, mask, cfg)
    dirs = np.asarray(out.unit_light_direction)
    np.testing.assert_allclose(np.linalg.norm(dirs, axis=1), 1.0, rtol=1e-5)
    assert dirs[0, 2] >= 0.0  # clamped from -0.5
    # target mode normalises the provided direction.
    cfg2 = dataclasses.replace(BASE, lighting_mode="target")
    out2 = render(
        albedo, depth, lighting, mask, cfg2,
        target_light=jnp.asarray([[0.0, 0.0, 2.0], [3.0, 0.0, 0.0]]),
    )
    np.testing.assert_allclose(
        np.asarray(out2.unit_light_direction),
        [[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]],
        atol=1e-6,
    )


def test_missing_target_raises():
    albedo, depth, lighting, mask = _inputs()
    with pytest.raises(ValueError):
        render(albedo, depth, lighting, mask, BASE)  # lighting_mode='target', no light
    with pytest.raises(ValueError):
        render(
            albedo, depth, lighting, mask,
            dataclasses.replace(
                BASE, lighting_mode="self_estimated", ambient_mode="target"
            ),
        )


def test_no_nans_under_degenerate_inputs():
    """Serving guard: extreme depths, zero masks and degenerate lights must
    not produce NaN/Inf anywhere in the outputs (the reference's epsilon
    guards are reproduced; this pins them)."""
    import jax.numpy as jnp

    b = 3
    albedo = jnp.full((b, 32, 32, 3), 0.5)
    depth = jnp.stack([
        jnp.zeros((32, 32)),                 # flat zero
        jnp.full((32, 32), 1e4),             # huge
        jnp.full((32, 32), -1e4),            # huge negative
    ])
    lighting = jnp.asarray([
        [0.0, 0.0, 0.0, 0.0],                # all-zero head output
        [5.0, 1.0, 0.0, -3.0],               # negative z (clamped)
        [-2.0, 0.0, 0.0, 0.0],               # zero direction
    ])
    mask = jnp.stack([
        jnp.zeros((32, 32)),                 # fully off-face
        jnp.ones((32, 32)),
        jnp.ones((32, 32)),
    ])
    cfg = dataclasses.replace(BASE, lighting_mode="self_estimated")
    out = render(albedo, depth, lighting, mask, cfg)
    for field in out._fields:
        arr = np.asarray(getattr(out, field))
        assert np.isfinite(arr).all(), field


def test_bias_gate_and_composite_blend():
    """A mostly-frontal light keeps its xy inside the wide gate -> +5 bias ->
    weights near 1; the composite follows w*full + (1-w)*ambient exactly."""
    albedo, depth, lighting, mask = _inputs(1)
    lighting = lighting.at[:, 1:4].set(jnp.asarray([[0.01, 0.01, 0.9999]]))
    cfg = dataclasses.replace(
        BASE, lighting_mode="self_estimated", shadow_bias_gate="wide"
    )
    out = render(albedo, depth, lighting, mask, cfg)
    w = np.asarray(out.shadow_mask_weights)
    assert w.min() > 0.95  # w(d=5) ~ 0.973
    blend = (
        w * np.asarray(out.full_shading)
        + (1 - w) * np.asarray(out.ambient_light)
    )
    np.testing.assert_allclose(np.asarray(out.final_shading), blend, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out.rendered),
        np.asarray(out.albedo) * np.asarray(out.final_shading)[..., None],
        atol=1e-6,
    )
