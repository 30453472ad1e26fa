"""Mask-aware march culling (RenderConfig.shadow_mask_cull).

Pixels in fully-off-face 8-row-aligned groups read the all-vetoed sentinel
(1e6 + gate bias) without marching; every other pixel must be bit-identical
to the uncull'd march. Every reference-visible surface is masked
(test_raytracing_...py:601-608 eval dump, masked losses, masked composite),
so culling is exact there — asserted end-to-end on render() below.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from geomconsistentfr_tpu.config import RenderConfig, apply_precision_tier
from geomconsistentfr_tpu.ops import shadows as S
from geomconsistentfr_tpu.ops import shadows_pallas as SP

BASE = RenderConfig(
    img_height=64,
    img_width=64,
    num_sample_points=32,
    t_start=0.025,
    t_stop=0.185,
    march_chunk=32,
)
CULL = dataclasses.replace(BASE, shadow_mask_cull=True)


def _face_mask(rng, b, h, w, empty_groups):
    """Random mask (90% density, matching the established kernel-parity
    tests' workload), then zero out the given 8-row groups entirely."""
    mask = (rng.uniform(size=(b, h, w)) > 0.1).astype(np.float32)
    for g in empty_groups:
        mask[:, 8 * g : 8 * (g + 1), :] = 0.0
    return mask


def _inputs(cfg, b=2, seed=0, empty_groups=(0, 1, 7)):
    rng = np.random.default_rng(seed)
    h, w = cfg.img_height, cfg.img_width
    depth = rng.normal(size=(b, h, w)).astype(np.float32) * 30
    mask = _face_mask(rng, b, h, w, empty_groups)
    lights = (
        np.asarray([[0.3, 0.4, 0.866], [-0.6, 0.1, 0.79]], np.float32)[:b]
        * cfg.light_distance
    )
    return jnp.asarray(depth), jnp.asarray(mask), jnp.asarray(lights)


def test_xla_cull_semantics():
    depth, mask, lights = _inputs(BASE)
    plain = np.asarray(S.ray_march_min_distance_batch(depth, mask, lights, BASE))
    culled = np.asarray(S.ray_march_min_distance_batch(depth, mask, lights, CULL))
    live = np.asarray(jax.vmap(S.cull_live_rows)(mask))[:, :, None]
    live = np.broadcast_to(live, plain.shape)
    # Live rows bit-identical; culled rows exactly the sentinel.
    np.testing.assert_array_equal(culled[live], plain[live])
    assert (culled[~live] == 1.0e6).all()
    # The test is vacuous unless both classes are populated.
    assert live.any() and (~live).all(axis=(0, 2)).any()


def test_stray_pixel_keeps_group_exact():
    """One on-face pixel anywhere in an 8-row group disables its cull."""
    depth, mask, lights = _inputs(BASE)
    mask = np.array(mask)
    mask[:, 9, 3] = 1.0  # group 1 (rows 8..15) now has a single face pixel
    mask = jnp.asarray(mask)
    plain = np.asarray(S.ray_march_min_distance_batch(depth, mask, lights, BASE))
    culled = np.asarray(S.ray_march_min_distance_batch(depth, mask, lights, CULL))
    np.testing.assert_array_equal(culled[:, 8:16, :], plain[:, 8:16, :])


def test_cull_with_bias_gate():
    """Culled pixels read sentinel + bias when the gate fires (store order
    matches the reference: veto sentinel first, +bias after)."""
    cfg = dataclasses.replace(CULL, shadow_bias_gate="inside_image")
    depth, mask, _ = _inputs(cfg, b=1)
    light = jnp.asarray([[5.0, -3.0, 900.0]], jnp.float32)  # xy inside image
    culled = np.asarray(S.ray_march_min_distance_batch(depth, mask, light, cfg))
    assert (culled[0, 0:16, :] == 1.0e6 + cfg.shadow_bias).all()


@pytest.mark.parametrize("precision", ["highest", "default"])
def test_pallas_cull_matches_xla_cull(precision):
    cfg = dataclasses.replace(CULL, shadow_matmul_precision=precision)
    depth, mask, lights = _inputs(cfg)
    want = np.asarray(S.ray_march_min_distance_batch(depth, mask, lights, cfg))
    got = np.asarray(
        SP.ray_march_min_distance_pallas(depth, mask, lights, cfg, interpret=True)
    )
    live = np.asarray(jax.vmap(S.cull_live_rows)(mask))[:, :, None]
    live = np.broadcast_to(live, want.shape)
    # Culled rows: exactly the sentinel in BOTH paths (the cull decision is
    # veto-mode independent — it reads the mask rows, not the march).
    np.testing.assert_array_equal(got[~live], want[~live])
    assert (got[~live] == 1.0e6).all()
    # Live rows: the same tolerant comparison the uncull'd kernel tests use
    # (the fast tier's bilinear veto may flip samples in the mask-boundary
    # half-pixel band, moving a few pixels' winning sample entirely; the
    # iid 70%-density mask here is maximally boundary-rich, so 'default'
    # flips more pixels than the established 90%-density kernel tests).
    big_w = want[live] >= 1e5
    big_g = got[live] >= 1e5
    diff = np.abs(got[live] - want[live])[~(big_w | big_g)]
    if precision == "highest":   # exact one-hot veto
        assert (big_w == big_g).mean() > 0.9999
        assert np.quantile(diff, 0.9999) < 1e-3
    else:                        # bilinear veto: established fast-mode bounds
        assert (big_w == big_g).mean() > 0.98
        assert np.quantile(diff, 0.95) < 1e-2


def test_pallas_cull_slab4_group_alignment():
    """4-row slabs read their PARENT 8-row group's flags: a slab whose own
    rows are empty but whose group sibling has face pixels still marches.

    The mask is all-ones except rows 8..11, so those pixels' rays sample
    on-face positions immediately — a wrongly culled slab would emit the
    1e6 sentinel where the correct march finds real distances."""
    cfg = dataclasses.replace(
        CULL, shadow_slab_rows=4, shadow_matmul_precision="highest"
    )
    rng = np.random.default_rng(4)
    h, w = cfg.img_height, cfg.img_width
    depth = jnp.asarray(rng.normal(size=(1, h, w)).astype(np.float32) * 30)
    mask = np.ones((1, h, w), np.float32)
    mask[:, 8:12, :] = 0.0   # first half of group 1 empty; group still live
    mask = jnp.asarray(mask)
    lights = jnp.asarray([[0.3, 0.4, 0.866]], jnp.float32) * cfg.light_distance
    want = np.asarray(S.ray_march_min_distance_batch(depth, mask, lights, cfg))
    got = np.asarray(
        SP.ray_march_min_distance_pallas(depth, mask, lights, cfg, interpret=True)
    )
    big = (want[:, 8:12] >= 1e5) | (got[:, 8:12] >= 1e5)
    assert not big.all(), "live half-slab was wrongly culled"
    diff = np.abs(got[:, 8:12] - want[:, 8:12])[~big]
    assert np.quantile(diff, 0.9999) < 1e-3


def test_pallas_cull_argmin_t():
    cfg = CULL
    depth, mask, lights = _inputs(cfg, b=1)
    got, t_star = SP.ray_march_min_distance_pallas(
        depth, mask, lights, cfg, interpret=True, return_argmin_t=True
    )
    ts = S.sample_ts(cfg)
    t_star = np.asarray(t_star)
    got = np.asarray(got)
    assert (t_star[0, 0:16, :] == np.float32(ts[0])).all()
    # Sanity: live region has varied winners.
    assert len(np.unique(t_star[got < 1e5])) > 1


def test_render_masked_outputs_invariant():
    """End-to-end: culling changes NOTHING the pipeline ships — the masked
    composite and every mask-multiplied output are bit-identical."""
    from geomconsistentfr_tpu.losses import masked_composite
    from geomconsistentfr_tpu.render import render

    cfg_off = dataclasses.replace(
        BASE, lighting_mode="self_estimated", ambient_mode="estimated"
    )
    cfg_on = dataclasses.replace(cfg_off, shadow_mask_cull=True)
    rng = np.random.default_rng(3)
    b, h, w = 2, cfg_on.img_height, cfg_on.img_width
    albedo = jnp.asarray(rng.uniform(size=(b, h, w, 3)).astype(np.float32))
    depth_raw = jnp.asarray(rng.normal(size=(b, h, w)).astype(np.float32) * 20)
    lighting = jnp.asarray(
        np.tile(np.asarray([[0.4, 0.3, 0.4, 0.7]], np.float32), (b, 1))
    )
    mask = jnp.asarray(_face_mask(rng, b, h, w, empty_groups=(0, 1, 6, 7)))
    images = jnp.asarray(rng.uniform(size=(b, h, w, 3)).astype(np.float32))

    out_off = render(albedo, depth_raw, lighting, mask, cfg_off)
    out_on = render(albedo, depth_raw, lighting, mask, cfg_on)

    m3 = np.asarray(mask)[..., None]
    np.testing.assert_array_equal(
        np.asarray(masked_composite(out_on.rendered, images, mask)),
        np.asarray(masked_composite(out_off.rendered, images, mask)),
    )
    for field in ("rendered", "shadow_mask_weights", "final_shading"):
        a = np.asarray(getattr(out_on, field))
        bfield = np.asarray(getattr(out_off, field))
        m = m3 if a.ndim == 4 else np.asarray(mask)
        np.testing.assert_array_equal(a * m, bfield * m)


def test_precision_tiers_enable_cull():
    from geomconsistentfr_tpu.config import PipelineConfig

    for tier in ("strict", "high", "fast", "draft"):
        cfg = apply_precision_tier(PipelineConfig(), tier)
        assert cfg.render.shadow_mask_cull, tier
    assert not PipelineConfig().render.shadow_mask_cull
