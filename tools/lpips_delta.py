"""LPIPS north-star delta artifact: JAX metric vs the torch transcription.

BASELINE.md's "LPIPS delta < 1e-3 vs the PyTorch reference" cannot be
asserted against real torchvision trunk weights in this offline environment
(pretrained_networks.py:1-180 pulls the torchvision zoo; no hub cache here).
What IS assertable, and what this tool commits as docs/LPIPS_delta.json:
with a SHARED trunk (fixed-seed, the same tensors in both frameworks) and
the REFERENCE lin heads (PerceptualSimilarity/lpips/weights/v0.1/<net>.pth),
the full eval pipeline — evaluate_output_dir's masked spatial mean with the
reference's strictly-positive denominator (test_network.py:46-48) — agrees
with a line-faithful torch transcription of lpips/lpips.py:22-241 to
|delta| < 1e-3 per image over a synthetic Multi-PIE-layout dump. Real
torchvision weights drop in with zero code change (eval-multipie
--lpips-trunk <torchvision .pth/.npz>), at which point the same number IS
the north star.

Usage: python tools/lpips_delta.py [--images 48] [--net alex]
"""

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_protocol_dump(root: str, n_images: int, rng) -> tuple[str, str, str]:
    """A synthetic 6-outputs-per-image eval dump + GT + masks on disk,
    shaped like the reference protocol directory (only the rendered file of
    each six-file group is scored, DSSIM_MP_RGB.m:3-4)."""
    import imageio.v2 as imageio
    import numpy as np
    from scipy.ndimage import gaussian_filter

    out_dir = os.path.join(root, "dump")
    gt_dir = os.path.join(root, "gt")
    mask_dir = os.path.join(root, "masks")
    for d in (out_dir, gt_dir, mask_dir):
        os.makedirs(d, exist_ok=True)
    for i in range(n_images):
        # Smooth image pairs (pred = gt + noise), face-like elliptical mask.
        gt = gaussian_filter(
            rng.uniform(0, 1, (256, 256, 3)), sigma=(6, 6, 0)
        )
        gt = (gt - gt.min()) / max(float(np.ptp(gt)), 1e-6)
        pred = np.clip(gt + rng.normal(0, 0.05, gt.shape), 0, 1)
        yy, xx = np.mgrid[:256, :256]
        cy, cx = rng.uniform(110, 146, 2)
        ry, rx = rng.uniform(70, 100), rng.uniform(55, 80)
        mask = ((yy - cy) ** 2 / ry**2 + (xx - cx) ** 2 / rx**2 <= 1.0)
        imageio.imwrite(
            os.path.join(out_dir, f"img{i:04d}_rendered_image.png"),
            (pred * 255).astype(np.uint8),
        )
        imageio.imwrite(
            os.path.join(gt_dir, f"img{i:04d}_gt.png"),
            (gt * 255).astype(np.uint8),
        )
        imageio.imwrite(
            os.path.join(mask_dir, f"img{i:04d}_mask.png"),
            (mask * 255).astype(np.uint8),
        )
    return out_dir, gt_dir, mask_dir


def run(images: int = 48, net: str = "alex",
        out: str = os.path.join("docs", "LPIPS_delta.json"),
        trunk: str = None) -> dict:
    """Run the delta protocol; with trunk= a real torchvision state_dict
    (.pth/.npz), the committed number IS the BASELINE north star."""
    import numpy as np

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    import imageio.v2 as imageio

    from geomconsistentfr_tpu.metrics.eval_multipie import evaluate_output_dir
    from geomconsistentfr_tpu.models.lpips import LPIPSMetric, load_trunk_state
    from tests.oracles.lpips_torch_oracle import lpips_spatial_torch

    trunk_state = load_trunk_state(trunk, net=net) if trunk else None
    rng = np.random.default_rng(7)
    with tempfile.TemporaryDirectory(prefix="gcfr_lpips_delta_") as root:
        out_dir, gt_dir, mask_dir = build_protocol_dump(root, images, rng)

        # JAX side: the SHIPPING eval path, end to end.
        metric = LPIPSMetric(
            net=net, trunk_state=trunk_state,
            allow_random_trunk=trunk_state is None,
        )
        jax_result = evaluate_output_dir(
            out_dir, gt_dir, mask_dir, lpips_fn=metric
        )

        # Torch side: the reference transcription with the SAME trunk/lin
        # tensors, and test_network.py:46-48's masked >0-denominator mean.
        params = metric._variables["params"]
        trunk = jax.tree.map(np.asarray, dict(params["trunk"]))
        lins = {
            k: jax.tree.map(np.asarray, dict(v))
            for k, v in params.items()
            if k.startswith("lin")
        }
        deltas, torch_means, jax_means = [], [], []
        names = sorted(
            f for f in os.listdir(out_dir) if "_rendered_image" in f
        )
        gts = sorted(os.listdir(gt_dir))
        masks = sorted(os.listdir(mask_dir))
        for pred_name, gt_name, mask_name in zip(names, gts, masks):
            pred = np.asarray(
                imageio.imread(os.path.join(out_dir, pred_name)), np.float64
            ) / 255.0
            gt = np.asarray(
                imageio.imread(os.path.join(gt_dir, gt_name)), np.float64
            ) / 255.0
            mask = np.asarray(
                imageio.imread(os.path.join(mask_dir, mask_name)), np.float64
            ) / 255.0
            dist_t = lpips_spatial_torch(
                gt.astype(np.float32), pred.astype(np.float32), trunk, lins,
                net=net,
            )
            num = float(np.sum(mask * dist_t))
            den = float(np.sum((mask * dist_t) > 0))
            torch_means.append(num / max(den, 1.0))

            dist_j = metric(gt, pred)
            numj = float(np.sum(mask * dist_j))
            denj = float(np.sum((mask * dist_j) > 0))
            jax_means.append(numj / max(denj, 1.0))
            deltas.append(abs(torch_means[-1] - jax_means[-1]))

    worst = max(deltas)
    report = {
        "_meta": {
            "protocol": "synthetic Multi-PIE-layout dump -> evaluate_output_dir "
            "(masked spatial LPIPS, >0 denominator, test_network.py:46-48) vs "
            "the torch transcription of lpips/lpips.py:22-241 with SHARED "
            "fixed-seed trunk weights and the reference v0.1 lin heads.",
            "trunk": (
                f"REAL torchvision {net} trunk ({trunk}) — this number IS "
                "the BASELINE LPIPS-delta north star."
                if trunk
                else f"fixed-seed random {net} trunk (torchvision zoo "
                "unavailable offline); real weights drop in via --trunk / "
                "eval-multipie --lpips-trunk with zero code change, making "
                "this same number the BASELINE north star."
            ),
            "net": net,
            "images": images,
        },
        "per_image_abs_delta": [round(d, 9) for d in deltas],
        "jax_masked_lpips_mean": float(np.mean(jax_means)),
        "torch_masked_lpips_mean": float(np.mean(torch_means)),
        "worst_abs_delta": worst,
        "north_star_1e-3": bool(worst < 1e-3),
        "eval_harness_lpips_mean": jax_result.get("masked_lpips_mean"),
    }
    assert report["north_star_1e-3"], f"LPIPS delta too large: {worst}"
    # The harness path and the direct loop must agree (same masked formula).
    assert abs(
        report["eval_harness_lpips_mean"] - report["jax_masked_lpips_mean"]
    ) < 1e-9
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({
        "worst_abs_delta": worst,
        "north_star_1e-3": report["north_star_1e-3"],
        "out": out,
    }))
    return report


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=48)
    ap.add_argument("--net", default="alex", choices=("alex", "vgg", "squeeze"))
    ap.add_argument("--out", default=os.path.join("docs", "LPIPS_delta.json"))
    ap.add_argument(
        "--trunk", default=None,
        help="real torchvision trunk state_dict (.pth/.npz); makes the "
        "committed delta THE BASELINE north star",
    )
    args = ap.parse_args()
    run(images=args.images, net=args.net, out=args.out, trunk=args.trunk)


if __name__ == "__main__":
    main()
