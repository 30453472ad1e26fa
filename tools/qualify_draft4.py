"""Qualify the scale-4 draft march (64x fewer march FLOPs + boundary refine).

Qualifies the QUARTER-resolution draft march (shadow_resolution_scale=4:
~64x fewer march FLOPs + the full-resolution boundary refine) ON CHIP: the
4-fixture parity cells (same metric as tools/parity_matrix.py —
face-mask-weighted PSNR over the reference-visible surface,
test_raytracing_relighting_CelebAHQ_DSSIM_8x.py:601-608) and the
bench.py-methodology throughput at batch 64, writing docs/BENCH_draft4.json.
The scene-scaling identity is exact at any integer scale; CPU parity had
already measured scale=4 + refine above the then-shipping
scale-2-no-refine numbers (TODO.md: 53.7/49.5/58.4/45.8 dB face-visible).
This on-chip run (231.5 img/s, worst fixture 45.75 dB visible) is what
promoted scale 4 to the shipping 'draft' tier — so today
apply_precision_tier(cfg, "draft") already sets scale 4 and the
dataclasses.replace below is a no-op kept so the script stays an
independent qualifier if the tier definition moves again.

Usage: python tools/qualify_draft4.py [--out docs/BENCH_draft4.json]
       [--halfwidth 4] [--batch 64] [--iters 5]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CKPT = "/root/reference/model_lighting_transfer/model_epoch106.pth"
GOLDEN = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")

FIXTURES = [
    ("ref_transfer_00104.npz", "lighting_transfer", "upper-right light"),
    ("ref_transfer_00508_bottomleft.npz", "lighting_transfer", "corner light"),
    ("ref_transfer_00322_insidelight.npz", "lighting_transfer", "inside-image light"),
    ("ref_target_00295.npz", "single_image", "target path"),
]


def draft4_cfg(base, halfwidth: int, t_stride: int = 1, step_pack: int = 1):
    from geomconsistentfr_tpu.config import apply_precision_tier

    cfg = apply_precision_tier(base, "draft")
    return dataclasses.replace(
        cfg,
        render=dataclasses.replace(
            cfg.render,
            shadow_resolution_scale=4,
            shadow_refine_halfwidth=halfwidth,
            shadow_lowres_t_stride=t_stride,
            shadow_step_pack=step_pack,
        ),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join("docs", "BENCH_draft4.json"))
    ap.add_argument("--halfwidth", type=int, default=4)
    ap.add_argument("--t-stride", type=int, default=1,
                    help="low-res march t-grid stride "
                    "(RenderConfig.shadow_lowres_t_stride)")
    ap.add_argument("--step-pack", type=int, default=1,
                    help="march steps fused per kernel loop iteration "
                    "(RenderConfig.shadow_step_pack)")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--skip-bench", action="store_true",
                    help="parity cells only (e.g. on CPU)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from geomconsistentfr_tpu.config import PRESETS, preset_single_image
    from geomconsistentfr_tpu.infer import load_relighter
    from geomconsistentfr_tpu.models.relightnet import RelightNet
    from geomconsistentfr_tpu.render import render

    device = jax.devices()[0]
    result = {
        "device": f"{device.platform}:{device.device_kind}",
        "halfwidth": args.halfwidth,
        "t_stride": args.t_stride,
        "step_pack": args.step_pack,
        "metric": "psnr_db = face-mask-weighted rendered PSNR vs the "
        "reference torch forward (the reference-visible surface); "
        "throughput per bench.py methodology (real FFHQ face mask, "
        "scalar-fetch timing)",
        "cells": [],
    }

    # --- Parity: 4 fixtures through draft-scale4 -------------------------
    if os.path.exists(CKPT):
        for fname, preset, klass in FIXTURES:
            fx = np.load(os.path.join(GOLDEN, fname))
            want = np.moveaxis(fx["rendered"], 1, -1)
            mask = fx["mask"]
            kwargs = {"target_light": fx["target_light"]}
            if "target_ambient" in fx:
                kwargs["target_ambient"] = fx["target_ambient"]
            cfg = draft4_cfg(PRESETS[preset](), args.halfwidth,
                             args.t_stride, args.step_pack)
            rl = load_relighter(CKPT, cfg=cfg)
            out = rl.forward(fx["image"][None], fx["mask"][None], **kwargs)
            got = np.asarray(out.rendered, np.float32)
            sq = (got - want) ** 2
            mse_vis = float(
                np.sum(sq * mask[None, :, :, None])
                / (3.0 * max(np.sum(mask), 1.0))
            )
            cell = {
                "fixture": fname,
                "class": klass,
                "tier": f"draft_scale4_hw{args.halfwidth}_ts{args.t_stride}"
                f"_sp{args.step_pack}",
                "psnr_db": round(10.0 * np.log10(1.0 / max(mse_vis, 1e-12)), 2),
                "psnr_raw_db": round(
                    10.0 * np.log10(1.0 / max(float(np.mean(sq)), 1e-12)), 2
                ),
            }
            result["cells"].append(cell)
            print(json.dumps(cell), flush=True)
        result["worst_psnr_db"] = min(c["psnr_db"] for c in result["cells"])
    else:
        result["cells"] = "reference checkpoint unavailable"

    # --- Throughput: bench.py methodology at scale 4 ----------------------
    if args.skip_bench:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
        print(f"wrote {args.out} (parity only)", flush=True)
        return
    cfg = draft4_cfg(preset_single_image(), args.halfwidth,
                     args.t_stride, args.step_pack)
    model = RelightNet(cfg=cfg.model)
    rng = np.random.default_rng(0)
    batch = args.batch
    images = jnp.asarray(rng.uniform(0, 1, (batch, 256, 256, 3)), jnp.float32)
    mask = np.load(os.path.join(GOLDEN, "ref_transfer_00104.npz"))["mask"]
    masks = jnp.asarray(np.broadcast_to(mask, (batch, 256, 256)))
    lights = jnp.tile(jnp.asarray([[0.3, 0.4, 0.8660254]], jnp.float32), (batch, 1))
    variables = model.init(jax.random.PRNGKey(0), images[:1], train=False)

    @jax.jit
    def forward(variables, images, masks, lights, salt):
        net = model.apply(variables, images + salt * 1e-7, train=False)
        out = render(
            net.albedo, net.depth, net.lighting, masks, cfg.render,
            target_light=lights,
        )
        return out.rendered.sum()

    float(forward(variables, images, masks, lights, jnp.float32(0)))
    t0 = time.perf_counter()
    for i in range(args.iters):
        float(forward(variables, images, masks, lights, jnp.float32(i + 1)))
    elapsed = time.perf_counter() - t0
    result["relight_throughput_img_per_s"] = round(batch * args.iters / elapsed, 3)
    result["batch"] = batch

    ref_path = os.path.join(os.path.dirname(GOLDEN), "..", "BENCH_CPU_REF.json")
    with open(os.path.abspath(ref_path)) as f:
        ref = json.load(f)
    target = ref["north_star_multiplier"] * ref["cpu_reference_imgs_per_sec"]
    result["vs_baseline"] = round(
        result["relight_throughput_img_per_s"] / target, 3
    )

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: result[k] for k in (
        "relight_throughput_img_per_s", "vs_baseline")}), flush=True)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
