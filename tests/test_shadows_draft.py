"""Draft-mode (reduced-resolution) shadow march: the 'draft' serving tier.

Covers the scene-scaling transform (ops/shadows.scale_march_inputs /
upscale_min_distance), its grid-alignment claim, the render() dispatch, the
precision-tier plumbing, and the accuracy envelope vs the full-resolution
march. The draft tier intentionally deviates from reference semantics
(the reference always marches at full resolution,
test_relight_single_image.py:348-503); these tests pin the *size* of that
deviation rather than exactness.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from geomconsistentfr_tpu.config import (
    PipelineConfig,
    RenderConfig,
    apply_precision_tier,
)
from geomconsistentfr_tpu.ops import shadows as S
from geomconsistentfr_tpu.ops.shading import shadow_weights

BASE = RenderConfig(
    img_height=64, img_width=64, shadow_bias_gate="none",
    use_pallas_shadows=False,
)


def _smooth_scene(b=2, h=64, w=64, seed=3):
    """Random low-frequency depth + an elliptical face mask."""
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    depth = np.zeros((b, h, w), np.float32)
    for i in range(b):
        for _ in range(6):
            fx, fy = rng.uniform(0.5, 3.0, 2)
            ph = rng.uniform(0, 2 * np.pi, 2)
            depth[i] += rng.uniform(5, 15) * np.cos(
                2 * np.pi * fx * xx / w + ph[0]
            ) * np.cos(2 * np.pi * fy * yy / h + ph[1])
    mask = (
        (((yy - h / 2) / (0.44 * h)) ** 2 + ((xx - w / 2) / (0.34 * w)) ** 2)
        < 1.0
    ).astype(np.float32)[None].repeat(b, 0)
    lights = np.asarray(
        [[0.3, 0.4, 0.866], [-0.55, 0.2, 0.81]][:b], np.float32
    ) * 1003.0
    return jnp.asarray(depth), jnp.asarray(mask), jnp.asarray(lights)


def test_pool_resize_alignment_exact():
    """The s x s mean-pool centres coincide with jax.image.resize's bilinear
    half-pixel sample positions: pooling then upsampling a linear field
    round-trips exactly (away from the clamped border ring)."""
    h = w = 64
    r = np.arange(h)[:, None].astype(np.float32)
    c = np.arange(w)[None, :].astype(np.float32)
    f = (0.37 * r - 1.21 * c + 3.0)[None]
    pooled = f.reshape(1, h // 2, 2, w // 2, 2).mean((2, 4))
    back = np.asarray(
        jax.image.resize(jnp.asarray(pooled), (1, h, w), "bilinear")
    )
    assert np.abs(back - f)[:, 1:-1, 1:-1].max() < 1e-4


def test_scale_march_inputs_shapes_and_values():
    cfg = dataclasses.replace(BASE, shadow_resolution_scale=2)
    depth, mask, lights = _smooth_scene()
    dh, mh, lh, ch = S.scale_march_inputs(depth, mask, lights, cfg)
    assert dh.shape == (2, 32, 32) and mh.shape == (2, 32, 32)
    assert ch.img_height == 32 and ch.img_width == 32
    assert ch.shadow_resolution_scale == 1
    assert ch.shadow_bias == pytest.approx(cfg.shadow_bias / 2)
    # Depth pools to the MASK-WEIGHTED block mean / s (plain mean only for
    # all-off blocks), so off-face depth cannot bleed into silhouette texels.
    d = np.asarray(depth).reshape(2, 32, 2, 32, 2)
    on = (np.asarray(mask) != 0).astype(np.float32).reshape(2, 32, 2, 32, 2)
    cnt = on.sum((2, 4))
    want = np.where(
        cnt > 0,
        (d * on).sum((2, 4)) / np.maximum(cnt, 1.0),
        d.mean((2, 4)),
    ) / 2
    np.testing.assert_allclose(np.asarray(dh), want, rtol=1e-5, atol=1e-5)
    # Mask pools by majority and stays {0,1}.
    assert set(np.unique(np.asarray(mh))) <= {0.0, 1.0}
    # Light: xy scaled with the (s-1)/(2s) grid alignment shift, z plain /s.
    l = np.asarray(lights)
    got = np.asarray(lh)
    np.testing.assert_allclose(got[:, 0], l[:, 0] / 2 - 0.25, rtol=1e-6)
    np.testing.assert_allclose(got[:, 1], l[:, 1] / 2 + 0.25, rtol=1e-6)
    np.testing.assert_allclose(got[:, 2], l[:, 2] / 2, rtol=1e-6)


def test_upscale_restores_off_face_sentinel():
    """All-zero mask => every sample vetoed => the draft output is exactly
    the full-resolution path's 1e6 sentinel everywhere."""
    cfg = dataclasses.replace(BASE, shadow_resolution_scale=2)
    depth, _, lights = _smooth_scene()
    mask = jnp.zeros_like(depth)
    dh, mh, lh, ch = S.scale_march_inputs(depth, mask, lights, cfg)
    low = S.ray_march_min_distance_batch(dh, mh, lh, ch)
    out = np.asarray(S.upscale_min_distance(low, cfg))
    assert out.shape == (2, 64, 64)
    np.testing.assert_array_equal(out, np.full_like(out, 1e6))


def test_draft_march_tracks_full_resolution():
    """Shadow weights from the half-resolution march track the full march:
    interiors agree tightly; deviations concentrate in the shadow-boundary
    band. The synthetic scene (random +-45-unit cosine terrain at 64^2) is
    far rougher than a face depth map, so these bounds are a loose envelope
    — the golden-fixture test below pins the realistic number."""
    cfg = dataclasses.replace(BASE, shadow_resolution_scale=2)
    depth, mask, lights = _smooth_scene()
    full = S.ray_march_min_distance_batch(depth, mask, lights, BASE)
    dh, mh, lh, ch = S.scale_march_inputs(depth, mask, lights, cfg)
    low = S.ray_march_min_distance_batch(dh, mh, lh, ch)
    draft = S.upscale_min_distance(low, cfg)
    wf = np.asarray(shadow_weights(full))
    wd = np.asarray(shadow_weights(draft))
    d = np.abs(wf - wd)[np.asarray(mask) > 0]
    assert np.median(d) < 0.05, float(np.median(d))
    assert d.mean() < 0.12, float(d.mean())
    assert (d > 0.1).mean() < 0.15, float((d > 0.1).mean())


def test_render_dispatches_draft_scale():
    """render() with shadow_resolution_scale=2 produces full-resolution
    outputs whose min_distance equals the composed scale->march->upscale."""
    from geomconsistentfr_tpu.render import render

    cfg = dataclasses.replace(
        BASE, shadow_resolution_scale=2, focal_length=700.0,
        lighting_mode="target", ambient_mode="target",
    )
    depth, mask, lights = _smooth_scene(b=1)
    albedo = jnp.ones((1, 64, 64, 3), jnp.float32) * 0.5
    lighting = jnp.asarray([[0.4, 0.3, 0.4, 0.866]], jnp.float32)
    out = render(
        albedo, depth, lighting, mask, cfg,
        target_light=lights[:1] / 1003.0, target_ambient=jnp.asarray([0.5]),
    )
    assert out.min_distance.shape == (1, 64, 64)
    assert out.rendered.shape == (1, 64, 64, 3)
    # render() places the light at light_distance * normalize(target_light).
    unit = lights[:1] / jnp.linalg.norm(lights[:1], axis=-1, keepdims=True)
    light_point = cfg.light_distance * unit
    dh, mh, lh, ch = S.scale_march_inputs(depth, mask, light_point, cfg)
    low = S.ray_march_min_distance_batch(dh, mh, lh, ch)
    want = S.upscale_min_distance(low, cfg)
    # f32 normalize/light-placement rounding differs slightly between the
    # two call paths; distances are O(0.01..1e6).
    np.testing.assert_allclose(
        np.asarray(out.min_distance), np.asarray(want), rtol=1e-3, atol=1e-3
    )


def test_render_draft_march_fn_gets_scaled_inputs():
    """A custom march_fn (the sample/grid-parallel hook) composes with the
    draft tier: render() hands it the POOLED inputs at the scaled resolution
    and upscales its output, so a pmin-sharded march slots in unchanged
    (the t grid is scale-invariant)."""
    from geomconsistentfr_tpu.render import render

    cfg = dataclasses.replace(
        BASE, shadow_resolution_scale=2, lighting_mode="target",
        ambient_mode="target",
    )
    depth, mask, lights = _smooth_scene(b=1)
    albedo = jnp.ones((1, 64, 64, 3), jnp.float32) * 0.5
    lighting = jnp.asarray([[0.4, 0.3, 0.4, 0.866]], jnp.float32)
    seen = {}

    def march_fn(d, m, lp):
        seen["shape"] = d.shape
        mcfg = S.scaled_render_cfg(cfg)
        return S.ray_march_min_distance_batch(d, m, lp, mcfg)

    got = render(
        albedo, depth, lighting, mask, cfg,
        target_light=lights[:1], target_ambient=jnp.asarray([0.5]),
        march_fn=march_fn,
    )
    assert seen["shape"] == (1, 32, 32)  # pooled march resolution
    want = render(
        albedo, depth, lighting, mask, cfg,
        target_light=lights[:1], target_ambient=jnp.asarray([0.5]),
    )
    np.testing.assert_allclose(
        np.asarray(got.min_distance), np.asarray(want.min_distance),
        rtol=1e-5, atol=1e-5,
    )


def test_precision_tier_draft_plumbing():
    cfg = PipelineConfig()
    draft = apply_precision_tier(cfg, "draft")
    assert draft.render.shadow_resolution_scale == 4
    assert draft.render.shadow_matmul_precision == "default"
    assert draft.render.shadow_refine_halfwidth == 4
    assert draft.render.shadow_lowres_t_stride == 2
    assert draft.model.compute_dtype == "bfloat16"
    # Tier application is idempotent/resetting: re-applying a full-res tier
    # clears the draft downscale, the refine window and the t-grid stride.
    back = apply_precision_tier(draft, "high")
    assert back.render.shadow_resolution_scale == 1
    assert back.render.shadow_matmul_precision == "high"
    assert back.render.shadow_refine_halfwidth == 0
    assert back.render.shadow_lowres_t_stride == 1


# ---------------------------------------------------------------------------
# Boundary refine (shadow_refine_halfwidth)
# ---------------------------------------------------------------------------


def _draft_cfg(**kw):
    return dataclasses.replace(
        BASE, shadow_resolution_scale=2, shadow_refine_halfwidth=4, **kw
    )


def test_refine_offsets_window():
    """2k offsets j*t_step, j in [-k, k-1] — pad-free for the 8-step-aligned
    Pallas grid; the dropped +k edge measured < 0.01 dB on every fixture."""
    cfg = _draft_cfg()
    offs = S.refine_offsets(cfg)
    assert offs.shape == (8,) and offs.dtype == np.float32
    np.testing.assert_allclose(offs, np.arange(-4, 4) * cfg.t_step, rtol=1e-6)


def test_upsample_tstar_nn_is_blockwise_constant():
    """NN upsample assigns each s x s block its own low-res texel's t* —
    never an average (t* is discontinuous across shadow boundaries, and
    averaging centres the refine window where no occluder is)."""
    t = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (2, 4, 4)),
                    jnp.float32)
    cfg = dataclasses.replace(
        BASE, img_height=8, img_width=8, shadow_resolution_scale=2
    )
    up = np.asarray(S.upsample_tstar_nn(t, cfg))
    assert up.shape == (2, 8, 8)
    np.testing.assert_array_equal(up, np.asarray(t).repeat(2, 1).repeat(2, 2))


def test_refine_min_distance_matches_bruteforce():
    """refine == elementwise min of sample_distance_at over the clipped
    window offsets, plus the gate bias."""
    cfg = _draft_cfg(shadow_bias_gate="wide")
    depth, mask, lights = _smooth_scene()
    dh, mh, lh, ch = S.scale_march_inputs(depth, mask, lights, cfg)
    _, tstar = S.ray_march_min_distance_batch(dh, mh, lh, ch,
                                              return_argmin_t=True)
    tmap = S.upsample_tstar_nn(tstar, cfg)
    got = np.asarray(S.refine_min_distance_batch(depth, mask, lights, tmap, cfg))
    ts = S.sample_ts(cfg)
    want = np.full(depth.shape, 1e6, np.float32)
    for i in range(2):
        for off in S.refine_offsets(cfg):
            # f32 clip like the shipped scan (np.clip's f64 bounds would
            # upcast and shift bilinear taps by one ulp near the clamp).
            t = np.clip(
                np.asarray(tmap)[i] + off,
                np.float32(ts[0]), np.float32(ts[-1]),
            ).astype(np.float32)
            d = np.asarray(S.sample_distance_at(
                depth[i], mask[i], lights[i], jnp.asarray(t), cfg
            ))
            want[i] = np.minimum(want[i], d)
        gate = bool(np.asarray(S._bias_gate(lights[i, 0], lights[i, 1], cfg)))
        want[i] += cfg.shadow_bias if gate else 0.0
    # The scan body compiles as one fused XLA computation (FMA contraction,
    # knife-edge tap flips at one-ulp coordinate differences) vs the eager
    # per-offset oracle — same tolerance class as the kernel parity tests.
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_refine_respects_cull_groups():
    """Culled 8-row groups read the sentinel; a single stray on-face pixel
    keeps its whole group fully refined (same fixed groups as the march)."""
    cfg = _draft_cfg(shadow_mask_cull=True)
    depth, mask, lights = _smooth_scene()
    mask = np.asarray(mask).copy()
    mask[:, :16, :] = 0.0          # two dead groups
    mask[1, 3, 5] = 1.0            # stray pixel revives image 1's group 0
    mask = jnp.asarray(mask)
    dh, mh, lh, ch = S.scale_march_inputs(depth, mask, lights, cfg)
    _, tstar = S.ray_march_min_distance_batch(dh, mh, lh, ch,
                                              return_argmin_t=True)
    tmap = S.upsample_tstar_nn(tstar, cfg)
    got = np.asarray(S.refine_min_distance_batch(depth, mask, lights, tmap, cfg))
    nocull = np.asarray(S.refine_min_distance_batch(
        depth, mask, lights, tmap, dataclasses.replace(cfg, shadow_mask_cull=False)
    ))
    assert (got[0, :16] == 1e6).all()
    assert (got[1, 8:16] == 1e6).all()
    np.testing.assert_array_equal(got[1, :8], nocull[1, :8])  # revived group
    np.testing.assert_array_equal(got[:, 16:], nocull[:, 16:])


def test_pallas_refine_matches_xla():
    """The fused refine kernel (per-pixel t centres) == the pure-XLA refine,
    including cull + gate composition (interpret mode)."""
    from geomconsistentfr_tpu.ops import shadows_pallas as SP

    depth, mask, lights = _smooth_scene()
    for cfg in (
        _draft_cfg(),
        _draft_cfg(shadow_mask_cull=True, shadow_bias_gate="wide"),
    ):
        dh, mh, lh, ch = S.scale_march_inputs(depth, mask, lights, cfg)
        _, tstar = S.ray_march_min_distance_batch(dh, mh, lh, ch,
                                                  return_argmin_t=True)
        tmap = S.upsample_tstar_nn(tstar, cfg)
        want = np.asarray(
            S.refine_min_distance_batch(depth, mask, lights, tmap, cfg)
        )
        got = np.asarray(SP.refine_min_distance_pallas(
            depth, mask, lights, tmap, cfg, interpret=True
        ))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_render_dispatches_draft_refine():
    """render() at scale=2 + halfwidth=4 equals the composed low-res-argmin
    -> NN-upsample -> full-res windowed refine."""
    from geomconsistentfr_tpu.render import render

    cfg = _draft_cfg(
        focal_length=700.0, lighting_mode="target", ambient_mode="target"
    )
    depth, mask, lights = _smooth_scene(b=1)
    albedo = jnp.ones((1, 64, 64, 3), jnp.float32) * 0.5
    lighting = jnp.asarray([[0.4, 0.3, 0.4, 0.866]], jnp.float32)
    out = render(
        albedo, depth, lighting, mask, cfg,
        target_light=lights[:1] / 1003.0, target_ambient=jnp.asarray([0.5]),
    )
    unit = lights[:1] / jnp.linalg.norm(lights[:1], axis=-1, keepdims=True)
    light_point = cfg.light_distance * unit
    dh, mh, lh, ch = S.scale_march_inputs(depth, mask, light_point, cfg)
    _, tstar = S.ray_march_min_distance_batch(dh, mh, lh, ch,
                                              return_argmin_t=True)
    want = S.refine_min_distance_batch(
        depth, mask, light_point, S.upsample_tstar_nn(tstar, cfg), cfg
    )
    np.testing.assert_allclose(
        np.asarray(out.min_distance), np.asarray(want), rtol=1e-3, atol=1e-3
    )


def test_render_refine_march_fn_protocol():
    """With refine on, render() calls march_fn(..., return_argmin_t=True)
    and routes the refine through its refine_fn attribute (the sample/grid-
    parallel hook)."""
    from geomconsistentfr_tpu.render import render

    cfg = _draft_cfg(lighting_mode="target", ambient_mode="target")
    depth, mask, lights = _smooth_scene(b=1)
    albedo = jnp.ones((1, 64, 64, 3), jnp.float32) * 0.5
    lighting = jnp.asarray([[0.4, 0.3, 0.4, 0.866]], jnp.float32)
    calls = {}

    def march_fn(d, m, lp, return_argmin_t=False):
        calls["march"] = (d.shape, return_argmin_t)
        mcfg = S.scaled_render_cfg(cfg)
        return S.ray_march_min_distance_batch(
            d, m, lp, mcfg, return_argmin_t=return_argmin_t
        )

    def refine_fn(d, m, lp, tmap):
        calls["refine"] = (d.shape, tmap.shape)
        return S.refine_min_distance_batch(d, m, lp, tmap, cfg)

    march_fn.refine_fn = refine_fn
    got = render(
        albedo, depth, lighting, mask, cfg,
        target_light=lights[:1], target_ambient=jnp.asarray([0.5]),
        march_fn=march_fn,
    )
    assert calls["march"] == ((1, 32, 32), True)
    assert calls["refine"] == ((1, 64, 64), (1, 64, 64))
    want = render(
        albedo, depth, lighting, mask, cfg,
        target_light=lights[:1], target_ambient=jnp.asarray([0.5]),
    )
    np.testing.assert_allclose(
        np.asarray(got.min_distance), np.asarray(want.min_distance),
        rtol=1e-5, atol=1e-5,
    )


def test_config_validates_scale():
    with pytest.raises(ValueError, match="shadow_resolution_scale"):
        RenderConfig(shadow_resolution_scale=3)
    with pytest.raises(ValueError, match="even"):
        RenderConfig(img_height=4, img_width=4, shadow_resolution_scale=4)


def test_pallas_kernel_runs_scaled_inputs():
    """On TPU the draft tier routes the pooled inputs through the Pallas
    kernel at the scaled dims; interpret mode must match the pure march."""
    from geomconsistentfr_tpu.ops import shadows_pallas as SP

    cfg = dataclasses.replace(BASE, shadow_resolution_scale=2)
    depth, mask, lights = _smooth_scene()
    dh, mh, lh, ch = S.scale_march_inputs(depth, mask, lights, cfg)
    want = np.asarray(S.ray_march_min_distance_batch(dh, mh, lh, ch))
    got = np.asarray(
        SP.ray_march_min_distance_pallas(dh, mh, lh, ch, interpret=True)
    )
    # Same tolerance class as the full-resolution kernel tests: bit-close
    # except at measure-zero hat/two-tap knife edges.
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_golden_draft_psnr():
    """End-to-end draft-tier parity on the primary golden fixture. The
    shipping tier is scale 4 + halfwidth-4 boundary refine (promoted
    2026-08-19): 53.7 dB face-visible here, >= 45.8 dB visible on ALL
    bundled fixtures on chip (docs/BENCH_draft4.json; worst: target-path
    00295 — up from 38.8 dB visible before the refine existed).

    The gate is the FACE-VISIBLE PSNR (mask-weighted, the parity-matrix
    metric): every reference entry point masks or pastes its outputs
    (test_raytracing_...py:601-608; test_relight_single_image.py's
    through-mask paste), and since round 5 the tiers' column-aware cull
    (shadow_col_chunk) deliberately changes raw off-face renders near the
    face margins — pixels whose real march distances are small there, so
    culling flips them to lit. Raw PSNR is only reference-comparable with
    the cull off (see tools/parity_matrix.py's strict_nocull rows)."""
    import os

    ckpt = "/root/reference/model_lighting_transfer/model_epoch106.pth"
    if not os.path.exists(ckpt):
        pytest.skip("reference checkpoint unavailable")
    from geomconsistentfr_tpu.config import PRESETS
    from geomconsistentfr_tpu.infer import load_relighter

    fx = np.load(
        os.path.join(os.path.dirname(__file__), "golden", "ref_transfer_00104.npz")
    )
    cfg = apply_precision_tier(PRESETS["lighting_transfer"](), "draft")
    rl = load_relighter(ckpt, cfg=cfg)
    out = rl.forward(
        fx["image"][None], fx["mask"][None],
        target_light=fx["target_light"], target_ambient=fx["target_ambient"],
    )
    want = np.moveaxis(fx["rendered"], 1, -1)
    mask = fx["mask"]
    sq = (np.asarray(out.rendered, np.float32) - want) ** 2
    mse = float(
        np.sum(sq * mask[None, :, :, None]) / (3.0 * max(np.sum(mask), 1.0))
    )
    psnr = 10.0 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr >= 45.0, f"draft-tier face-visible PSNR {psnr:.2f} dB"


def test_relighter_accepts_sample_parallel_draft():
    """Draft composes with sample parallelism since round 4 (render hands
    the sharded march the pooled inputs; see
    tests/test_parallel.py::test_relighter_draft_sample_parallel_matches_
    single_device for the numerical equivalence)."""
    from geomconsistentfr_tpu.infer import Relighter
    from geomconsistentfr_tpu.models.relightnet import RelightNet
    from geomconsistentfr_tpu.parallel.mesh import make_mesh

    import dataclasses as _dc

    cfg = apply_precision_tier(PipelineConfig(), "draft")
    cfg = _dc.replace(
        cfg,
        render=_dc.replace(
            cfg.render, img_height=32, img_width=32, num_sample_points=12,
            t_stop=0.085, march_chunk=12, use_pallas_shadows=False,
        ),
    )
    model = RelightNet(cfg=cfg.model)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    rl = Relighter(cfg, variables, mesh=make_mesh(), parallel="samples")
    assert rl.parallel == "samples"


# ---------------------------------------------------------------------------
# Low-res march t-grid stride (shadow_lowres_t_stride)
# ---------------------------------------------------------------------------


def test_stride_grid_is_every_rth_sample():
    """The strided low-res grid is exactly every r-th reference offset, and
    the stride is consumed by scaled_render_cfg (not reapplied downstream)."""
    for r in (2, 4):
        cfg = _draft_cfg(shadow_lowres_t_stride=r)
        scaled = S.scaled_render_cfg(cfg)
        np.testing.assert_allclose(
            S.sample_ts(scaled), S.sample_ts(BASE)[::r], rtol=1e-12
        )
        assert scaled.shadow_lowres_t_stride == 1
        assert scaled.num_sample_points == S.sample_ts(BASE)[::r].shape[0]


def test_stride_keeps_full_res_refine_window():
    """The refine window spacing stays at the reference t_step regardless of
    the low-res stride — the whole point of the knob."""
    cfg = _draft_cfg(shadow_lowres_t_stride=4)
    np.testing.assert_allclose(
        S.refine_offsets(cfg), np.arange(-4, 4) * BASE.t_step, rtol=1e-6
    )


def test_config_validates_stride():
    with pytest.raises(ValueError, match="stride"):
        RenderConfig(shadow_lowres_t_stride=2)  # needs the draft march
    with pytest.raises(ValueError, match="stride"):
        # refine window too narrow to cover the strided argmin error
        RenderConfig(
            shadow_resolution_scale=2,
            shadow_refine_halfwidth=1,
            shadow_lowres_t_stride=2,
        )


def test_stride_tracks_unstrided_draft():
    """Strided draft+refine tracks the unstrided draft+refine closely: the
    refine window re-searches the full-rate neighbourhood of the strided
    argmin, so only pixels whose true winner lies outside the window (a
    different occluder lobe) can deviate."""
    depth, mask, lights = _smooth_scene()
    weights = {}
    for r in (1, 2):
        cfg = _draft_cfg(shadow_lowres_t_stride=r)
        dh, mh, lh, ch = S.scale_march_inputs(depth, mask, lights, cfg)
        _, t_star = S.ray_march_min_distance_batch(
            dh, mh, lh, ch, return_argmin_t=True
        )
        t_map = S.upsample_tstar_nn(t_star, cfg)
        md = S.refine_min_distance_batch(depth, mask, lights, t_map, cfg)
        weights[r] = np.asarray(shadow_weights(md))
    m = np.asarray(mask) > 0
    diff = np.abs(weights[1] - weights[2])[m]
    assert diff.mean() < 0.01, diff.mean()
    assert (diff > 0.25).mean() < 0.02, (diff > 0.25).mean()
