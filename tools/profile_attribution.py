"""On-chip time attribution + MFU for the relight pipeline and train step.

Produces the measured numbers behind docs/PROFILE.md:
  * stage decomposition of a relight batch (CNN / shadow march / rest-of-
    render) by timing jitted sub-pipelines with the scalar-fetch protocol
    bench.py uses (block_until_ready is async under the axon tunnel);
  * XLA's own FLOP count per stage via compiled cost_analysis(), giving
    sustained TFLOPS and MFU vs the v5e peak;
  * device->host fetch bandwidth of the uint8 visual pack;
  * a jax.profiler device trace (utils/profiling.trace) per mode, written
    under --trace-dir for Perfetto/TensorBoard inspection.

Usage: python tools/profile_attribution.py [--tiers fast,strict] [--batch 64]
       [--train] [--trace-dir /tmp/profile_traces] [--out docs/PROFILE_raw.json]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# v5e TensorCore peak (Google-published): 197 bf16 TFLOPS per chip.
V5E_PEAK_BF16_TFLOPS = 197.0


def _time(fn, *args, iters=5):
    """Median-of-iters wall time; scalar fetch forces device completion."""
    float(fn(*args, np.float32(0)))  # warm/compile
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        float(fn(*args, np.float32(i + 1)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def _flops(fn, *args):
    import jax

    try:
        comp = jax.jit(fn).lower(*args, np.float32(0)).compile()
        ca = comp.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("flops", float("nan")))
    except Exception as e:  # axon remote may not expose cost analysis
        print(f"cost_analysis unavailable: {e}", file=sys.stderr)
        return float("nan")


def profile_relight(tier: str, batch: int, trace_dir: str | None, mask_kind: str):
    import jax
    import jax.numpy as jnp

    from geomconsistentfr_tpu.config import apply_precision_tier, preset_single_image
    from geomconsistentfr_tpu.infer import pack_visuals
    from geomconsistentfr_tpu.models.relightnet import RelightNet
    from geomconsistentfr_tpu.ops.shadows_pallas import ray_march_min_distance_pallas
    from geomconsistentfr_tpu.render import render

    cfg = apply_precision_tier(preset_single_image(), tier)
    model = RelightNet(cfg=cfg.model)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 1, (batch, 256, 256, 3)), jnp.float32)
    # Default mask is the REAL FFHQ skin mask bench.py uses: whole off-face
    # 8-row bands let the march cull fire, matching the shipping workload.
    # --mask random restores the scattered 80%-coverage mask (cull never
    # fires; the round-3 profile basis).
    if mask_kind == "random":
        mask_np = (rng.uniform(0, 1, (256, 256)) > 0.2).astype(np.float32)
    else:
        mask_np = np.load(
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "tests/golden/ref_transfer_00104.npz",
            )
        )["mask"]
    masks = jnp.asarray(np.broadcast_to(mask_np, (batch, 256, 256)))
    lights = jnp.tile(jnp.asarray([[0.3, 0.4, 0.8660254]], jnp.float32), (batch, 1))
    variables = model.init(jax.random.PRNGKey(0), images[:1], train=False)

    def cnn_only(variables, images, salt):
        net = model.apply(variables, images + salt * 1e-7, train=False)
        return net.albedo.sum() + net.depth.sum() + net.lighting.sum()

    def full(variables, images, masks, lights, salt):
        net = model.apply(variables, images + salt * 1e-7, train=False)
        out = render(net.albedo, net.depth, net.lighting, masks, cfg.render,
                     target_light=lights)
        return out.rendered.sum()

    # March-only on representative depth stats (the CNN's depth decoder spans
    # roughly [-54, 70] on faces).
    depth = jnp.asarray(rng.uniform(-54, 70, (batch, 256, 256)), jnp.float32)
    light_point = lights * cfg.render.light_distance

    scale = cfg.render.shadow_resolution_scale
    refine = scale > 1 and cfg.render.shadow_refine_halfwidth > 0

    def march_only(depth, masks, light_point, salt):
        # Route through the same reduced-resolution path render() uses for
        # the draft tier (shadow_resolution_scale > 1) so the stage measures
        # the march that actually executes, not a full-res stand-in. With
        # the boundary refine on, the low-res march also carries the argmin
        # t*, exactly as in render().
        from geomconsistentfr_tpu.ops import shadows as shadows_ops

        d = depth + salt * 1e-7
        if scale > 1:
            m_depth, m_mask, m_light, m_cfg = shadows_ops.scale_march_inputs(
                d, masks, light_point, cfg.render
            )
        else:
            m_depth, m_mask, m_light, m_cfg = d, masks, light_point, cfg.render
        if refine:
            md, t_star = ray_march_min_distance_pallas(
                m_depth, m_mask, m_light, m_cfg, return_argmin_t=True
            )
            return md.sum() + t_star.sum()
        md = ray_march_min_distance_pallas(m_depth, m_mask, m_light, m_cfg)
        if scale > 1:
            md = shadows_ops.upscale_min_distance(md, cfg.render)
        return md.sum()

    def march_and_refine(depth, masks, light_point, salt):
        # The draft tier's complete min-distance pipeline: low-res march
        # (with argmin t*) -> NN t* upsample -> full-res windowed re-march.
        from geomconsistentfr_tpu.ops import shadows as shadows_ops
        from geomconsistentfr_tpu.ops.shadows_pallas import (
            refine_min_distance_pallas,
        )

        d = depth + salt * 1e-7
        m_depth, m_mask, m_light, m_cfg = shadows_ops.scale_march_inputs(
            d, masks, light_point, cfg.render
        )
        _, t_star = ray_march_min_distance_pallas(
            m_depth, m_mask, m_light, m_cfg, return_argmin_t=True
        )
        t_map = shadows_ops.upsample_tstar_nn(t_star, cfg.render)
        md = refine_min_distance_pallas(d, masks, light_point, t_map, cfg.render)
        return md.sum()

    jit_cnn = jax.jit(cnn_only)
    jit_full = jax.jit(full)
    jit_march = jax.jit(march_only)

    res = {
        "tier": tier,
        "batch": batch,
        "mask": mask_kind,
        "cnn_s": _time(jit_cnn, variables, images),
        "full_s": _time(jit_full, variables, images, masks, lights),
        "march_s": _time(jit_march, depth, masks, light_point),
        # NOTE: XLA's cost_analysis does NOT see inside the Pallas custom
        # call, so full/march_flops here count only the XLA-visible ops
        # (march_flops is just the wrapper's epilogue). The march's
        # algorithmic FLOPs are computed analytically below.
        "cnn_flops": _flops(cnn_only, variables, images),
        "full_flops_xla_visible": _flops(full, variables, images, masks, lights),
        "march_flops_xla_visible": _flops(march_only, depth, masks, light_point),
    }
    if refine:
        jit_mr = jax.jit(march_and_refine)
        res["march_refine_s"] = _time(jit_mr, depth, masks, light_point)
        res["refine_s"] = res["march_refine_s"] - res["march_s"]
        res["rest_s"] = res["full_s"] - res["cnn_s"] - res["march_refine_s"]
    else:
        res["rest_s"] = res["full_s"] - res["cnn_s"] - res["march_s"]
    # Analytic march matmul FLOPs (single-pass accounting): per sample step
    # and 8-row slab the kernel issues 2 gather matmuls of
    # (8*W, W) @ (W, H) — the hat-weighted depth gather and the indicator
    # gather — i.e. 2 * 2 * 8 * W^2 * H FLOPs; reduce matvecs are <0.5%.
    # The draft tier marches at the SCALED resolution (W/s x H/s), so the
    # analytic count must use the inner march's config or draft MFU is
    # overcounted ~s^4-fold.
    r = cfg.render
    if r.shadow_resolution_scale > 1:
        from geomconsistentfr_tpu.ops import shadows as shadows_ops

        r = shadows_ops.scaled_render_cfg(r)
    per_step_slab = 2 * 2 * 8 * r.img_width**2 * r.img_height
    n_slabs = r.img_height // 8
    res["march_flops_algorithmic"] = float(
        batch * r.num_sample_points * n_slabs * per_step_slab
    )
    res["march_sustained_tflops_single_pass"] = (
        res["march_flops_algorithmic"] / res["march_s"] / 1e12
    )
    if refine:
        # The boundary refine re-marches 2k offsets at FULL resolution
        # (ops/shadows.refine_offsets): same per-step slab cost as the
        # full-res march, 2k steps.
        fr = cfg.render
        per_step_full = 2 * 2 * 8 * fr.img_width**2 * fr.img_height
        res["refine_flops_algorithmic"] = float(
            batch
            * 2 * fr.shadow_refine_halfwidth
            * (fr.img_height // 8)
            * per_step_full
        )
        res["refine_sustained_tflops_single_pass"] = (
            res["refine_flops_algorithmic"] / res["refine_s"] / 1e12
        )

    # device->host fetch of the uint8 visual pack (the dump-pipeline payload).
    out = jax.jit(lambda v, i, m, l: render(
        *(lambda n: (n.albedo, n.depth, n.lighting))(model.apply(v, i, train=False)),
        m, cfg.render, target_light=l))(variables, images, masks, lights)
    pack = jax.jit(pack_visuals)(out, masks)
    float(pack.sum())  # force materialization
    t0 = time.perf_counter()
    host = jax.device_get(pack)
    res["fetch_s"] = time.perf_counter() - t0
    res["fetch_mb"] = host.nbytes / 1e6

    if trace_dir:
        from geomconsistentfr_tpu.utils.profiling import trace

        tdir = os.path.join(trace_dir, f"relight_{tier}")
        with trace(tdir):
            float(jit_full(variables, images, masks, lights, np.float32(99)))
        res["trace_dir"] = tdir
    return res


def profile_train(batch: int, trace_dir: str | None):
    import jax
    import jax.numpy as jnp

    from geomconsistentfr_tpu import train as train_mod
    from geomconsistentfr_tpu.config import preset_target_lighting_train

    cfg = preset_target_lighting_train()
    state = train_mod.init_state(cfg, jax.random.PRNGKey(0), batch_size=batch)
    step = train_mod.make_single_device_step(cfg)
    rng = np.random.default_rng(0)
    s = cfg.render.img_height
    b = {
        "image": jnp.asarray(rng.uniform(0, 1, (batch, s, s, 3)), jnp.float32),
        "face_mask": jnp.asarray(
            (rng.uniform(size=(batch, s, s)) > 0.1).astype(np.float32)
        ),
        "depth_gt": jnp.asarray(rng.normal(size=(batch, s, s)), jnp.float32),
        "depth_mask": jnp.ones((batch, s, s), jnp.float32),
        "albedo_gt": jnp.asarray(rng.uniform(0, 1, (batch, s, s)), jnp.float32),
        "light_gt": jnp.tile(
            jnp.asarray([[0.0, 0.7071, 0.7071]], jnp.float32), (batch, 1)
        ),
    }
    gates = (True, True, True, True)

    state, m = step(state, b, gates)  # compile
    float(m["total"])
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        state, m = step(state, b, gates)
        float(m["total"])
        ts.append(time.perf_counter() - t0)
    res = {"tier": "strict", "batch": batch, "step_s": float(np.median(ts))}
    try:
        comp = step.lower(state, b, gates).compile()
        ca = comp.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        res["step_flops"] = float(ca.get("flops", float("nan")))
    except Exception as e:
        print(f"train cost_analysis unavailable: {e}", file=sys.stderr)
        res["step_flops"] = float("nan")
    if trace_dir:
        from geomconsistentfr_tpu.utils.profiling import trace

        tdir = os.path.join(trace_dir, "train_strict")
        with trace(tdir):
            state, m = step(state, b, gates)
            float(m["total"])
        res["trace_dir"] = tdir
    return res


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiers", default="fast,strict")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--train-batch", type=int, default=3)
    ap.add_argument("--trace-dir", default=None)
    ap.add_argument("--mask", choices=("face", "random"), default="face")
    ap.add_argument("--out", default=os.path.join("docs", "PROFILE_raw.json"))
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    device = jax.devices()[0]
    out = {
        "device": f"{device.platform}:{device.device_kind}",
        "v5e_peak_bf16_tflops": V5E_PEAK_BF16_TFLOPS,
        "relight": [],
    }
    for tier in args.tiers.split(","):
        r = profile_relight(tier, args.batch, args.trace_dir, args.mask)
        print(json.dumps(r), flush=True)
        out["relight"].append(r)
    if args.train:
        t = profile_train(args.train_batch, args.trace_dir)
        print(json.dumps(t), flush=True)
        out["train"] = t
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
