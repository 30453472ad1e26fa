"""Pallas shadow kernel vs the pure-JAX reference path (interpret mode, CPU).

TPU-compiled parity/throughput is exercised separately (the kernel is used by
render() on TPU and covered by the driver's bench); here the kernel algebra
(two-hot/hat matmul gather + VPU reductions + veto + bias gate) is checked
against ops/shadows on small configs.
"""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from geomconsistentfr_tpu.config import RenderConfig
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


def _compare(cfg, lights_np, seed=0):
    rng = np.random.default_rng(seed)
    b = lights_np.shape[0]
    depth = jnp.asarray(
        rng.normal(size=(b, cfg.img_height, cfg.img_width)).astype(np.float32) * 30
    )
    mask = jnp.asarray(
        (rng.uniform(size=(b, cfg.img_height, cfg.img_width)) > 0.1).astype(np.float32)
    )
    lights = jnp.asarray(lights_np)
    want = np.asarray(S.ray_march_min_distance_batch(depth, mask, lights, cfg))
    got = np.asarray(
        SP.ray_march_min_distance_pallas(depth, mask, lights, cfg, interpret=True)
    )
    # Off-face sentinel positions must agree exactly; elsewhere compare values
    # (rare knife-edge .5-rounding pixels may differ -> quantile bound).
    big_w = want >= 1e5
    big_g = got >= 1e5
    assert (big_w == big_g).mean() > 0.9999
    diff = np.abs(got - want)[~(big_w | big_g)]
    assert np.quantile(diff, 0.9999) < 1e-3, float(diff.max())
    assert diff.mean() < 1e-4


def test_pallas_matches_reference_path():
    lights = np.asarray(
        [[0.3, 0.4, 0.866], [-0.6, 0.1, 0.79]], np.float32
    ) * BASE.light_distance
    _compare(BASE, lights)


def test_pallas_bias_gates():
    cfg = dataclasses.replace(BASE, shadow_bias_gate="inside_image")
    lights = np.asarray([[0.0, 0.0, 10.0], [4000.0, 0.0, 600.0]], np.float32)
    _compare(cfg, lights, seed=1)


def test_pallas_light_inside_image():
    lights = np.asarray([[5.0, -3.0, 20.0]], np.float32)
    _compare(BASE, lights, seed=2)


def test_argmin_t_output(monkeypatch):
    """t* from the forward kernel is the offset of the winning sample."""
    import jax

    cfg = BASE
    rng = np.random.default_rng(7)
    depth = jnp.asarray(rng.normal(size=(1, 64, 64)).astype(np.float32) * 30)
    mask = jnp.ones((1, 64, 64))
    light = jnp.asarray([[0.5, 0.1, 0.86]], np.float32) * cfg.light_distance

    min_d, t_star = SP.ray_march_min_distance_pallas(
        depth, mask, light, cfg, interpret=True, return_argmin_t=True
    )
    # Explicit per-step distances via the single-step evaluator.
    dists = np.stack(
        [
            np.asarray(
                S.sample_distance_at(depth[0], mask[0], light[0], float(t), cfg)
            )
            for t in S.sample_ts(cfg)
        ]
    )
    want_min = dists.min(axis=0)
    got_min = np.asarray(min_d[0])
    agree = np.isclose(got_min, want_min, atol=1e-3)
    assert agree.mean() > 0.999

    # The recorded t* reproduces the min when re-evaluated.
    re_eval = np.asarray(
        S.sample_distance_at(depth[0], mask[0], light[0], np.asarray(t_star[0]), cfg)
    )
    close = np.isclose(re_eval, got_min, atol=1e-3)
    assert close.mean() > 0.999

    # The kernel carries the compact int32 sample INDEX and the wrapper
    # looks t up in the sample table: every returned t* must be bitwise
    # equal to one of the sample_ts constants (no arithmetic on t).
    table = S.sample_ts(cfg).astype(np.float32)
    assert np.isin(np.asarray(t_star).ravel(), table).all()


def test_custom_vjp_matches_pure_jax_grad(monkeypatch):
    """Gradient through the Pallas wrapper == gradient of the pure-JAX march."""
    import functools

    import jax

    monkeypatch.setattr(
        SP,
        "ray_march_min_distance_pallas",
        functools.partial(SP.ray_march_min_distance_pallas.__wrapped__
                          if hasattr(SP.ray_march_min_distance_pallas, "__wrapped__")
                          else SP.ray_march_min_distance_pallas, interpret=True),
    )
    cfg = BASE
    rng = np.random.default_rng(5)
    depth = jnp.asarray(rng.normal(size=(1, 64, 64)).astype(np.float32) * 30)
    mask = jnp.ones((1, 64, 64))
    light = jnp.asarray([[0.4, 0.2, 0.89]], np.float32) * cfg.light_distance

    def loss_pallas(d, l):
        return jnp.sum(jnp.tanh(SP.ray_march_min_distance_pallas_vjp(d, mask, l, cfg)))

    def loss_ref(d, l):
        return jnp.sum(jnp.tanh(S.ray_march_min_distance_batch(d, mask, l, cfg)))

    gp_d, gp_l = jax.grad(loss_pallas, argnums=(0, 1))(depth, light)
    gr_d, gr_l = jax.grad(loss_ref, argnums=(0, 1))(depth, light)
    # Near-tie pixels (two samples with ~equal min distance) may pick
    # different argmins under the two arithmetics -> different (but equally
    # valid) subgradients. Require agreement on >99.5% of entries and a small
    # aggregate error; the light gradient (summed over pixels) stays close.
    diff = np.abs(np.asarray(gp_d) - np.asarray(gr_d))
    assert (diff < 5e-4).mean() > 0.995, float(diff.max())
    assert diff.mean() < 1e-3
    np.testing.assert_allclose(
        np.asarray(gp_l), np.asarray(gr_l), rtol=0.02, atol=1e-3
    )


def test_pallas_hat_mask_gather_mode():
    """'hat' veto (widened-operand matmul) vs the exact one-hot reference.

    The nearest tap of the -1e-4-shifted coordinate can differ from the
    reference's banker's-rounded coordinate within 1e-4 of half-integer
    sample positions, so the sentinel bound is slightly looser than the
    exact mode's.
    """
    cfg = dataclasses.replace(
        BASE, shadow_matmul_precision="default", shadow_mask_gather="hat"
    )
    rng = np.random.default_rng(13)
    lights = (
        np.asarray([[0.3, 0.4, 0.866], [-0.6, 0.1, 0.79]], np.float32)
        * BASE.light_distance
    )
    depth = jnp.asarray(rng.normal(size=(2, 64, 64)).astype(np.float32) * 30)
    mask = jnp.asarray(
        (rng.uniform(size=(2, 64, 64)) > 0.1).astype(np.float32)
    )
    want = np.asarray(
        S.ray_march_min_distance_batch(depth, mask, jnp.asarray(lights), BASE)
    )
    got = np.asarray(
        SP.ray_march_min_distance_pallas(
            depth, mask, jnp.asarray(lights), cfg, interpret=True
        )
    )
    big_w = want >= 1e5
    big_g = got >= 1e5
    assert (big_w == big_g).mean() > 0.999
    both = ~(big_w | big_g)
    diff = np.abs(got - want)[both]
    # Depth interp is bit-identical to the exact mode; the veto flips only
    # at half-integer knife-edge samples (~0.3% of pixels on random masks,
    # large |diff| there; see RenderConfig.shadow_mask_gather).
    assert (diff > 1e-2).mean() < 5e-3, float((diff > 1e-2).mean())
    assert np.median(diff) < 1e-5


def test_pallas_high_precision_split():
    """'high' (manual bf16x3 gather split + bf16x2-split matvec reduce)
    tracks the f32 reference to ~1e-3 worst case and keeps the veto
    sentinels exact (auto veto stays exact onehot for this tier: hat_y's
    bf16-threshold band was measured to flip ~0.2% of pixels — rejected)."""
    cfg = dataclasses.replace(BASE, shadow_matmul_precision="high")
    rng = np.random.default_rng(0)
    lights = (
        jnp.asarray([[0.3, 0.4, 0.866], [-0.6, 0.1, 0.79]], jnp.float32)
        * BASE.light_distance
    )
    depth = jnp.asarray(rng.normal(size=(2, 64, 64)).astype(np.float32) * 30)
    mask = jnp.asarray((rng.uniform(size=(2, 64, 64)) > 0.1).astype(np.float32))
    want = np.asarray(S.ray_march_min_distance_batch(depth, mask, lights, BASE))
    got = np.asarray(
        SP.ray_march_min_distance_pallas(depth, mask, lights, cfg, interpret=True)
    )
    big = want >= 1e5
    assert (big == (got >= 1e5)).all()
    diff = np.abs(got - want)[~big]
    assert diff.max() < 2e-3, float(diff.max())
    assert diff.mean() < 2e-4


def test_pallas_hat_y_mask_gather_mode():
    """'hat_y' (veto y-tap reuses the depth hat weights): matches the exact
    path except at knife-edge half-integer sample rows (measure-zero on
    generic data, so the quantile bound holds on random depth/masks)."""
    cfg = dataclasses.replace(
        BASE, shadow_matmul_precision="default", shadow_mask_gather="hat_y"
    )
    lights = np.asarray(
        [[0.3, 0.4, 0.866], [-0.6, 0.1, 0.79]], np.float32
    ) * BASE.light_distance
    rng = np.random.default_rng(5)
    b = lights.shape[0]
    depth = jnp.asarray(rng.normal(size=(b, 64, 64)).astype(np.float32) * 30)
    mask = jnp.asarray((rng.uniform(size=(b, 64, 64)) > 0.1).astype(np.float32))
    want = np.asarray(
        S.ray_march_min_distance_batch(depth, mask, jnp.asarray(lights), BASE)
    )
    got = np.asarray(
        SP.ray_march_min_distance_pallas(
            depth, mask, jnp.asarray(lights), cfg, interpret=True
        )
    )
    big_w, big_g = want >= 1e5, got >= 1e5
    assert (big_w == big_g).mean() > 0.999
    diff = np.abs(got - want)[~(big_w | big_g)]
    # Depth interp is bit-identical to the exact mode; the veto flips only
    # at half-integer knife-edge sample rows (same ~0.3%-of-pixels class as
    # 'hat'; systematic exact halves come from integer pixel-to-border
    # spans stepping t by 0.005).
    assert (diff > 1e-2).mean() < 5e-3, float((diff > 1e-2).mean())
    assert np.median(diff) < 1e-5


def test_pallas_bilinear_mask_gather_mode():
    """'bilinear' (thresholded bilinear indicator veto): agrees with the
    exact path away from the mask boundary; a fully-on-face mask must agree
    everywhere (all taps 1 -> never vetoes, like the reference interior)."""
    cfg = dataclasses.replace(
        BASE, shadow_matmul_precision="default", shadow_mask_gather="bilinear"
    )
    lights = np.asarray([[0.3, 0.4, 0.866]], np.float32) * BASE.light_distance
    rng = np.random.default_rng(6)
    depth = jnp.asarray(rng.normal(size=(1, 64, 64)).astype(np.float32) * 30)

    # All-ones mask: bilinear(1)=1 everywhere, so the veto NEVER flips and
    # the only deviation is the fast mode's bf16 interp noise (which can
    # swap the argmin winner on isolated pixels).
    ones = jnp.ones((1, 64, 64), jnp.float32)
    want = np.asarray(
        S.ray_march_min_distance_batch(depth, ones, jnp.asarray(lights), BASE)
    )
    got = np.asarray(
        SP.ray_march_min_distance_pallas(
            depth, ones, jnp.asarray(lights), cfg, interpret=True
        )
    )
    diff = np.abs(got - want)
    assert (diff > 1e-2).mean() < 1e-3, float((diff > 1e-2).mean())
    assert np.median(diff) < 1e-3

    # Random mask: deviation confined to boundary-band veto flips — the
    # overwhelming majority of pixels still match.
    mask = jnp.asarray((rng.uniform(size=(1, 64, 64)) > 0.1).astype(np.float32))
    want = np.asarray(
        S.ray_march_min_distance_batch(depth, mask, jnp.asarray(lights), BASE)
    )
    got = np.asarray(
        SP.ray_march_min_distance_pallas(
            depth, mask, jnp.asarray(lights), cfg, interpret=True
        )
    )
    big_w, big_g = want >= 1e5, got >= 1e5
    assert (big_w == big_g).mean() > 0.98
    diff = np.abs(got - want)[~(big_w | big_g)]
    assert np.quantile(diff, 0.95) < 1e-2


def test_mask_gather_auto_resolution():
    """'auto' keeps the exact veto for strict/high precision and picks the
    VPU-lighter 'hat_y' only for the fast bf16 mode."""
    lights = np.asarray([[0.3, 0.4, 0.866]], np.float32) * BASE.light_distance
    rng = np.random.default_rng(7)
    depth = jnp.asarray(rng.normal(size=(1, 64, 64)).astype(np.float32) * 30)
    mask = jnp.ones((1, 64, 64), jnp.float32)
    # strict auto == explicit onehot, bitwise
    strict_auto = np.asarray(SP.ray_march_min_distance_pallas(
        depth, mask, jnp.asarray(lights), BASE, interpret=True))
    strict_onehot = np.asarray(SP.ray_march_min_distance_pallas(
        depth, mask, jnp.asarray(lights),
        dataclasses.replace(BASE, shadow_mask_gather="onehot"), interpret=True))
    np.testing.assert_array_equal(strict_auto, strict_onehot)

    with pytest.raises(ValueError, match="shadow_mask_gather"):
        SP.ray_march_min_distance_pallas(
            depth, mask, jnp.asarray(lights),
            dataclasses.replace(BASE, shadow_mask_gather="nearest"),
            interpret=True)


def test_ts_override_slices_combine_to_full_march():
    """Kernel ts override (the sample-parallel mesh path): marching two
    slices of the sample grid and taking the elementwise min must equal the
    full march EXACTLY — f32 min is associative and the post-min transforms
    (sqrt/denom, off-face sentinel, bias gate) commute with it."""
    cfg = BASE
    rng = np.random.default_rng(7)
    b = 2
    depth = jnp.asarray(
        rng.normal(size=(b, cfg.img_height, cfg.img_width)).astype(np.float32) * 30
    )
    mask = jnp.asarray(
        (rng.uniform(size=(b, cfg.img_height, cfg.img_width)) > 0.1).astype(np.float32)
    )
    lights = jnp.asarray(
        np.array([[40.0, -25.0, 60.0], [-120.0, 80.0, 90.0]], np.float32)
    )
    full = np.asarray(
        SP.ray_march_min_distance_pallas(depth, mask, lights, cfg, interpret=True)
    )
    ts = S.sample_ts(cfg).astype(np.float32)
    parts = [
        np.asarray(
            SP.ray_march_min_distance_pallas(
                depth, mask, lights, cfg, interpret=True, ts=jnp.asarray(sl)
            )
        )
        # Uneven split: 20 + 12 of the 32 samples; the first slice pads its
        # SMEM grid to 24 by duplicating the final offset.
        for sl in (ts[:20], ts[20:])
    ]
    np.testing.assert_array_equal(np.minimum(*parts), full)

    # XLA-path override agrees with its own full march the same way.
    full_ref = np.asarray(S.ray_march_min_distance_batch(depth, mask, lights, cfg))
    parts_ref = [
        np.asarray(
            S.ray_march_min_distance_batch(depth, mask, lights, cfg, ts=jnp.asarray(sl))
        )
        for sl in (ts[:20], ts[20:])
    ]
    np.testing.assert_array_equal(np.minimum(*parts_ref), full_ref)


def test_vjp_sp_gradient_slice_invariant():
    """The sample-sharded training march (ray_march_min_distance_pallas_vjp_sp)
    must produce BIT-IDENTICAL forward values, winning offsets and gradients
    regardless of how the sample grid is sliced: a 1-shard axis (the
    unsharded estimator through the same code) vs a 4-shard axis. Forward:
    f32 min is associative. t*: first-global-winner combine. Backward: the
    same replicated single-sample recompute from identical residuals."""
    import jax
    from jax.sharding import Mesh, PartitionSpec as P

    from geomconsistentfr_tpu.parallel.mesh import shard_map_fn

    cfg = BASE
    rng = np.random.default_rng(3)
    b = 2
    depth = jnp.asarray(
        rng.normal(size=(b, cfg.img_height, cfg.img_width)).astype(np.float32) * 30
    )
    mask = jnp.asarray(
        (rng.uniform(size=(b, cfg.img_height, cfg.img_width)) > 0.15).astype(
            np.float32
        )
    )
    lights = jnp.asarray(
        np.array([[40.0, -25.0, 60.0], [-120.0, 80.0, 90.0]], np.float32)
    )
    ts = jnp.asarray(S.sample_ts(cfg).astype(np.float32))  # 32 samples
    g = jnp.asarray(
        rng.normal(size=(b, cfg.img_height, cfg.img_width)).astype(np.float32)
    )

    def run(n_shards):
        mesh = Mesh(np.asarray(jax.devices()[:n_shards]), ("s",))

        def local(depth, mask, lights, ts_local, g):
            def f(d, l):
                return SP.ray_march_min_distance_pallas_vjp_sp(
                    d, mask, l, cfg, "s", ts_local
                )

            out, pullback = jax.vjp(f, depth, lights)
            d_depth, d_light = pullback(g)
            return out, d_depth, d_light

        mapped = shard_map_fn(
            local, mesh,
            in_specs=(P(), P(), P(), P("s"), P()),
            out_specs=(P(), P(), P()),
        )
        return jax.jit(mapped)(depth, mask, lights, ts, g)

    out1, dd1, dl1 = run(1)
    out4, dd4, dl4 = run(4)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out4))
    np.testing.assert_array_equal(np.asarray(dd1), np.asarray(dd4))
    np.testing.assert_array_equal(np.asarray(dl1), np.asarray(dl4))
    # The forward also matches the plain full march — to a tolerance, not
    # bitwise: the march's cross products cancel ~1e6-scale terms down to
    # ~1e1, so XLA:CPU's per-compilation FMA-contraction choices move
    # individual sample distances by up to ~3e-4 between separately
    # compiled graphs (the 1-vs-4-shard equality above is the bitwise
    # check, holding the compilation environment fixed).
    full = np.asarray(S.ray_march_min_distance_batch(depth, mask, lights, cfg))
    np.testing.assert_allclose(np.asarray(out1), full, atol=1e-3)
