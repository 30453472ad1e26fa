"""Parity matrix: rendered PSNR for every golden fixture x precision tier.

Runs all four committed golden fixtures (transfer upper-right / bottom-left /
inside-light + the target-lighting path) through the shipping serving
precision tiers (config.apply_precision_tier: strict / high / fast / draft)
exactly as the CLI/server would configure them, and writes
docs/PARITY_matrix.json with per-cell PSNR (dB) and shadow-weight MAE, plus
the device the run executed on.

The PRIMARY metric is psnr_db over the REFERENCE-VISIBLE surface: rendered
error weighted by the face mask, because every reference entry point masks
its outputs before anything consumes them (the eval dump multiplies all six
outputs by the mask, test_raytracing_relighting_CelebAHQ_DSSIM_8x.py:601-608;
the single-image test pastes the render into the original THROUGH the mask,
test_relight_single_image.py:614-620). The shipping tiers enable
shadow_mask_cull, which changes raw values only at pixels inside fully
off-face 8-row groups -- invisible on every reference surface -- so raw
(unmasked) PSNR is reported per cell as psnr_raw_db but is only an apples
-to-apples reference comparison for cull-off configs; the extra
'strict_nocull' row per fixture (the bare parity-suite configuration) is
that raw anchor.

North star (BASELINE.md): every shipping tier >= 40 dB on every fixture
class. Reference forward being reproduced:
/root/reference/test_relighting_lighting_transfer.py:430-520 (transfer),
/root/reference/test_relight_single_image.py:445-520 (target).

Usage: python tools/parity_matrix.py [--out docs/PARITY_matrix.json]
"""

import dataclasses

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CKPT = "/root/reference/model_lighting_transfer/model_epoch106.pth"
GOLDEN = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")

FIXTURES = [
    # (file, preset, class) — all 10 bundled FFHQ triples, each under the
    # lighting preset the reference recorded for it
    # (/root/reference/test_relight_single_image.py:519-562); the transfer
    # fixtures additionally exercise the f=700 transfer forward.
    ("ref_transfer_00104.npz", "lighting_transfer", "upper-right light"),
    ("ref_transfer_00508_bottomleft.npz", "lighting_transfer", "corner light"),
    ("ref_transfer_00322_insidelight.npz", "lighting_transfer", "inside-image light"),
    ("ref_target_00295.npz", "single_image", "target path (top light A00E45)"),
    ("ref_target_00110_mp4.npz", "single_image", "right low-elev light (MP4)"),
    ("ref_target_00300_mp4.npz", "single_image", "right low-elev light (MP4)"),
    ("ref_target_00525_mp4.npz", "single_image", "right low-elev light (MP4)"),
    ("ref_target_00290_mp9.npz", "single_image", "left high-z light (MP9)"),
    ("ref_target_00572_mp10.npz", "single_image", "far-left light (MP10)"),
    ("ref_target_00695_mp17.npz", "single_image", "upper-left light (MP17)"),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join("docs", "PARITY_matrix.json"))
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from geomconsistentfr_tpu.config import PRESETS, apply_precision_tier
    from geomconsistentfr_tpu.infer import load_relighter

    if not os.path.exists(CKPT):
        raise SystemExit("reference checkpoint unavailable")

    device = jax.devices()[0]
    result = {
        "device": f"{device.platform}:{device.device_kind}",
        "checkpoint": CKPT,
        "metric": "psnr_db = face-mask-weighted rendered PSNR vs the "
        "reference torch forward (the reference-visible surface: every "
        "reference entry point masks its outputs, test_raytracing_...py:"
        "601-608 / test_relight_single_image.py:614-620); psnr_raw_db = "
        "unmasked whole-array PSNR (reference-comparable only for cull-off "
        "configs -- the 'strict_nocull' rows); shadow_mae = mask-weighted "
        "mean |shadow weight delta| (shadow_mae_raw = unmasked)",
        "cells": [],
    }
    for fname, preset, klass in FIXTURES:
        fx = np.load(os.path.join(GOLDEN, fname))
        want = np.moveaxis(fx["rendered"], 1, -1)
        mask = fx["mask"]
        kwargs = {"target_light": fx["target_light"]}
        if "target_ambient" in fx:
            kwargs["target_ambient"] = fx["target_ambient"]
        for tier in ("strict_nocull", "strict", "high", "fast", "draft"):
            cfg = apply_precision_tier(PRESETS[preset](), tier.split("_")[0])
            if tier == "strict_nocull":
                cfg = dataclasses.replace(
                    cfg,
                    render=dataclasses.replace(
                        cfg.render, shadow_mask_cull=False
                    ),
                )
            rl = load_relighter(CKPT, cfg=cfg)
            out = rl.forward(fx["image"][None], fx["mask"][None], **kwargs)
            got = np.asarray(out.rendered, np.float32)
            sq = (got - want) ** 2  # (1, H, W, 3)
            mse_raw = float(np.mean(sq))
            mse_vis = float(
                np.sum(sq * mask[None, :, :, None])
                / (3.0 * max(np.sum(mask), 1.0))
            )
            sw_err = np.abs(
                np.asarray(out.shadow_mask_weights, np.float32)
                - fx["shadow_weights"].reshape(out.shadow_mask_weights.shape)
            )
            cell = {
                "fixture": fname,
                "class": klass,
                "tier": tier,
                "psnr_db": round(
                    10.0 * np.log10(1.0 / max(mse_vis, 1e-12)), 2
                ),
                "psnr_raw_db": round(
                    10.0 * np.log10(1.0 / max(mse_raw, 1e-12)), 2
                ),
                "shadow_mae": round(
                    float(
                        np.sum(sw_err * mask[None])
                        / max(np.sum(mask), 1.0)
                    ),
                    6,
                ),
                "shadow_mae_raw": round(float(sw_err.mean()), 6),
            }
            result["cells"].append(cell)
            print(json.dumps(cell), flush=True)

    worst = min(c["psnr_db"] for c in result["cells"])
    result["worst_psnr_db"] = worst
    result["worst_psnr_raw_db_nocull"] = min(
        c["psnr_raw_db"] for c in result["cells"]
        if c["tier"] == "strict_nocull"
    )
    result["north_star_40db"] = bool(worst >= 40.0)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {args.out}: worst cell {worst:.2f} dB", flush=True)


if __name__ == "__main__":
    main()
