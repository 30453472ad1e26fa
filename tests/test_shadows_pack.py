"""shadow_step_pack=2 (lane-packed step pairs) vs the unpacked kernel.

The packed path's extra matmul contraction terms are exact zeros (block-
diagonal operand; hat weights vanish outside [coord-1, coord+1]); the only
numeric difference from the unpacked kernel is f32 summation-order in the
longer dot contractions (measured: <= 6e-6 absolute on interpret-mode
min distances, zero sentinel or argmin disagreements on random scenes).
Same knife-edge veto class as the 'bilinear' gather it packs.
"""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from geomconsistentfr_tpu.config import RenderConfig
from geomconsistentfr_tpu.ops import shadows_pallas as SP

BASE = RenderConfig(
    img_height=32,
    img_width=32,
    num_sample_points=32,
    t_start=0.025,
    t_stop=0.185,
    march_chunk=32,
    shadow_matmul_precision="default",
    shadow_mask_gather="bilinear",
)


def _inputs(cfg, b=2, seed=0, face_rows=None):
    rng = np.random.default_rng(seed)
    depth = rng.normal(size=(b, cfg.img_height, cfg.img_width)).astype(
        np.float32
    ) * 30
    mask = (rng.uniform(size=depth.shape) > 0.1).astype(np.float32)
    if face_rows is not None:
        keep = np.zeros_like(mask)
        keep[:, face_rows] = 1.0
        mask = mask * keep
    lights = (
        np.asarray([[0.3, 0.4, 0.866], [-0.6, 0.1, 0.79]], np.float32)[:b]
        * cfg.light_distance
    )
    return jnp.asarray(depth), jnp.asarray(mask), jnp.asarray(lights)


@pytest.mark.parametrize("want_tstar", [False, True])
def test_pack2_bitwise_equals_pack1_interpret(want_tstar):
    cfg1 = BASE
    cfg2 = dataclasses.replace(BASE, shadow_step_pack=2)
    depth, mask, lights = _inputs(BASE)
    a = SP.ray_march_min_distance_pallas(
        depth, mask, lights, cfg1, interpret=True, return_argmin_t=want_tstar
    )
    b = SP.ray_march_min_distance_pallas(
        depth, mask, lights, cfg2, interpret=True, return_argmin_t=want_tstar
    )
    if want_tstar:
        a, at = (np.asarray(v) for v in a)
        b, bt = (np.asarray(v) for v in b)
        # Near-tie ULP reorders could flip an argmin in principle; none
        # observed — hold the line at exact.
        np.testing.assert_array_equal(at, bt)
    else:
        a, b = np.asarray(a), np.asarray(b)
    sa, sb = a >= 1e5, b >= 1e5
    np.testing.assert_array_equal(sa, sb)
    np.testing.assert_allclose(a[~sa], b[~sb], rtol=0, atol=1e-4)


def test_pack2_with_cull_and_odd_step_count():
    # 30 steps pad to 32 (the wrapper's sublane pad); culled off-face row
    # groups must emit the same sentinel under the pack.
    cfg1 = dataclasses.replace(
        BASE, num_sample_points=30, t_stop=0.025 + 30 * 0.005,
        shadow_mask_cull=True,
    )
    cfg2 = dataclasses.replace(cfg1, shadow_step_pack=2)
    depth, mask, lights = _inputs(cfg1, face_rows=range(8, 24))
    a = np.asarray(
        SP.ray_march_min_distance_pallas(depth, mask, lights, cfg1, interpret=True)
    )
    b = np.asarray(
        SP.ray_march_min_distance_pallas(depth, mask, lights, cfg2, interpret=True)
    )
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-4)
    # The culled groups really are sentinels.
    assert float(np.asarray(b)[:, :8].min()) >= 1e6


def test_pack2_interleave_mode_matches():
    cfg1 = dataclasses.replace(BASE, shadow_slab_interleave=True)
    cfg2 = dataclasses.replace(cfg1, shadow_step_pack=2)
    depth, mask, lights = _inputs(BASE, seed=3)
    a = np.asarray(
        SP.ray_march_min_distance_pallas(depth, mask, lights, cfg1, interpret=True)
    )
    b = np.asarray(
        SP.ray_march_min_distance_pallas(depth, mask, lights, cfg2, interpret=True)
    )
    sa, sb = a >= 1e5, b >= 1e5
    np.testing.assert_array_equal(sa, sb)
    np.testing.assert_allclose(a[~sa], b[~sb], rtol=0, atol=1e-4)


def test_pack2_rejects_non_bilinear_modes():
    depth, mask, lights = _inputs(BASE)
    strict = dataclasses.replace(
        BASE, shadow_matmul_precision="highest",
        shadow_mask_gather="auto", shadow_step_pack=2,
    )
    with pytest.raises(ValueError, match="bilinear"):
        SP.ray_march_min_distance_pallas(
            depth, mask, lights, strict, interpret=True
        )
    with pytest.raises(ValueError, match="shadow_step_pack"):
        dataclasses.replace(BASE, shadow_step_pack=3)


def test_pack1_refine_unaffected_by_pack_flag():
    # The refine kernel ignores shadow_step_pack (kept unpacked).
    cfg = dataclasses.replace(
        BASE, shadow_step_pack=2, shadow_resolution_scale=2,
        shadow_refine_halfwidth=2,
    )
    rng = np.random.default_rng(1)
    depth = jnp.asarray(
        rng.normal(size=(2, cfg.img_height, cfg.img_width)).astype(np.float32)
        * 30
    )
    mask = jnp.asarray(
        (rng.uniform(size=depth.shape) > 0.1).astype(np.float32)
    )
    lights = jnp.asarray(
        np.asarray([[0.3, 0.4, 0.866], [-0.6, 0.1, 0.79]], np.float32)
        * cfg.light_distance
    )
    tmap = jnp.full(depth.shape, 0.1, jnp.float32)
    out = SP.refine_min_distance_pallas(
        depth, mask, lights, tmap, cfg, interpret=True
    )
    assert np.isfinite(np.asarray(out)).all()
