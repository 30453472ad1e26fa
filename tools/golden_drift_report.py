"""Golden-drift report: render the 10 bundled FFHQ triples and record their
distance to the reference's bundled golden outputs.

The reference ships 10 relit golden PNGs (FFHQ_relighting_results/, presets
recorded as comments at test_relight_single_image.py:519-562), but the
checkpoint that generated them (model/model_epoch99.pth) is a missing blob
upstream — true parity is impossible. This tool renders the same triples
with the embedded transfer->target weights (model_epoch106.pth) through the
single_image preset, composites into the original per the reference
(:614-620), and records per-image PSNR + masked DSSIM into
docs/golden_drift.json. It is a TRACKED DISTANCE, not a parity gate:
regressions in the target-lighting path show up as drift from the committed
numbers.

Usage: python tools/golden_drift_report.py  (CPU, deterministic; ~2 min)
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference"
CKPT = f"{REF}/model_lighting_transfer/model_epoch106.pth"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "docs",
    "golden_drift.json",
)


def main() -> None:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import imageio.v2 as imageio
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from geomconsistentfr_tpu.config import preset_single_image
    from geomconsistentfr_tpu.infer import load_relighter
    from geomconsistentfr_tpu.lighting_presets import (
        DEFAULT_AMBIENT,
        GOLDEN_FFHQ_PRESETS,
        LIGHT_PRESETS,
    )
    from geomconsistentfr_tpu.metrics.image_metrics import masked_dssim_matlab, psnr
    from geomconsistentfr_tpu.utils.io import (
        composite_into_original,
        read_image,
        read_mask,
    )

    rl = load_relighter(CKPT, cfg=preset_single_image())

    stems = sorted(GOLDEN_FFHQ_PRESETS)
    images = np.stack([read_image(f"{REF}/sample_test_images_FFHQ/{s}.png") for s in stems])
    masks = np.stack([read_mask(f"{REF}/FFHQ_skin_masks/{s}.png") for s in stems])
    lights = np.asarray(
        [LIGHT_PRESETS[GOLDEN_FFHQ_PRESETS[s]] for s in stems], np.float32
    )
    ambients = np.full((len(stems),), DEFAULT_AMBIENT, np.float32)

    out = rl.forward(images, masks, target_light=lights, target_ambient=ambients)
    rendered = np.asarray(out.rendered)

    report = {
        "_meta": {
            "weights": "model_epoch106.pth embedded transfer->target "
            "(reference golden generator model_epoch99.pth is a missing blob "
            "upstream; this is a tracked distance, NOT a parity gate)",
            "preset": "single_image",
            "metric": "full-image PSNR of the composited output vs "
            "FFHQ_relighting_results/<stem>_rendered_image.png; "
            "skin-masked MATLAB-parity DSSIM",
        }
    }
    for i, stem in enumerate(stems):
        composited = composite_into_original(images[i], rendered[i], masks[i])
        golden = (
            np.asarray(
                imageio.imread(f"{REF}/FFHQ_relighting_results/{stem}_rendered_image.png"),
                np.float64,
            )
            / 255.0
        )
        report[stem] = {
            "preset": GOLDEN_FFHQ_PRESETS[stem],
            "psnr_db": round(float(psnr(composited.astype(np.float64), golden)), 3),
            "masked_dssim": round(
                float(masked_dssim_matlab(composited, golden, masks[i])), 5
            ),
        }

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(json.dumps(report, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
