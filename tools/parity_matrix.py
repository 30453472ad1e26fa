"""Parity matrix: rendered PSNR for every golden fixture x precision tier.

Runs all four committed golden fixtures (transfer upper-right / bottom-left /
inside-light + the target-lighting path) through the shipping serving
precision tiers (config.apply_precision_tier: strict / high / fast / draft)
exactly as the CLI/server would configure them, and writes
docs/PARITY_matrix.json with the rendered PSNR (dB) and shadow-weight MAE per
cell, plus the device the run executed on.

North star (BASELINE.md): every shipping tier >= 40 dB on every fixture
class. Reference forward being reproduced:
/root/reference/test_relighting_lighting_transfer.py:430-520 (transfer),
/root/reference/test_relight_single_image.py:445-520 (target).

Usage: python tools/parity_matrix.py [--out docs/PARITY_matrix.json]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CKPT = "/root/reference/model_lighting_transfer/model_epoch106.pth"
GOLDEN = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")

FIXTURES = [
    # (file, preset, class)
    ("ref_transfer_00104.npz", "lighting_transfer", "upper-right light"),
    ("ref_transfer_00508_bottomleft.npz", "lighting_transfer", "corner light"),
    ("ref_transfer_00322_insidelight.npz", "lighting_transfer", "inside-image light"),
    ("ref_target_00295.npz", "single_image", "target path"),
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
        "metric": "rendered PSNR dB vs the reference torch forward "
        "(shadow_mae = mean |shadow weight delta|)",
        "cells": [],
    }
    for fname, preset, klass in FIXTURES:
        fx = np.load(os.path.join(GOLDEN, fname))
        want = np.moveaxis(fx["rendered"], 1, -1)
        kwargs = {"target_light": fx["target_light"]}
        if "target_ambient" in fx:
            kwargs["target_ambient"] = fx["target_ambient"]
        for tier in ("strict", "high", "fast", "draft"):
            cfg = apply_precision_tier(PRESETS[preset](), tier)
            rl = load_relighter(CKPT, cfg=cfg)
            out = rl.forward(fx["image"][None], fx["mask"][None], **kwargs)
            got = np.asarray(out.rendered, np.float32)
            mse = float(np.mean((got - want) ** 2))
            psnr = 10.0 * np.log10(1.0 / max(mse, 1e-12))
            sw_mae = float(
                np.abs(
                    np.asarray(out.shadow_mask_weights, np.float32)
                    - fx["shadow_weights"].reshape(out.shadow_mask_weights.shape)
                ).mean()
            )
            cell = {
                "fixture": fname,
                "class": klass,
                "tier": tier,
                "psnr_db": round(psnr, 2),
                "shadow_mae": round(sw_mae, 6),
            }
            result["cells"].append(cell)
            print(json.dumps(cell), flush=True)

    worst = min(c["psnr_db"] for c in result["cells"])
    result["worst_psnr_db"] = worst
    result["north_star_40db"] = bool(worst >= 40.0)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {args.out}: worst cell {worst:.2f} dB", flush=True)


if __name__ == "__main__":
    main()
