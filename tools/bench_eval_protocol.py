"""Time the full Multi-PIE eval protocol at reference scale (862 images).

Generates a synthetic 862-image eval layout (one input/GT/mask triple per
image, 18-lighting .mat), then runs `run_inference` end to end — batched
device forwards pipelined against host PNG encode of the six outputs per
image (5,172 files) — and reports wall-clock. This is the workload the
reference runs one image at a time on a GPU
(test_raytracing_relighting_CelebAHQ_DSSIM_8x.py:542-608).

Usage:
    python tools/bench_eval_protocol.py [--images 862] [--batch 16] [--fast]
Strict f32 by default (repo convention); --fast opts into bf16 fast mode.
Prints one JSON line. TPU-exclusive: never run concurrently with other
device work.
"""

import argparse
import dataclasses
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--images", type=int, default=862)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--fast", action="store_true",
                        help="bf16 CNN + fast shadow matmuls; default strict f32")
    parser.add_argument("--strict", dest="fast", action="store_false",
                        help="(default)")
    parser.add_argument("--precision", default=None,
                        help="serving tier (strict/high/fast/draft); "
                        "overrides --fast/--strict when given")
    parser.add_argument("--keep", default=None, help="keep outputs here")
    args = parser.parse_args()

    import numpy as np
    import imageio.v2 as imageio
    import scipy.io

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from geomconsistentfr_tpu.config import preset_multipie_eval
    from geomconsistentfr_tpu.infer import load_relighter
    from geomconsistentfr_tpu.metrics.eval_multipie import run_inference

    root = args.keep or tempfile.mkdtemp(prefix="gcfr_evalbench_")
    dirs = {
        "input": os.path.join(root, "input_images_MP_18_lightings"),
        "gt": os.path.join(root, "groundtruth_images_MP_18_lightings"),
        "mask": os.path.join(root, "MP_depth_masks_fill_nose"),
    }
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)

    rng = np.random.default_rng(0)
    directions = rng.normal(size=(18, 3))
    directions[:, 2] = np.abs(directions[:, 2]) + 0.3
    directions /= np.linalg.norm(directions, axis=1, keepdims=True)
    mat = os.path.join(root, "MP_lighting_directions.mat")
    scipy.io.savemat(mat, {"lighting_directions": directions})

    gen0 = time.perf_counter()
    mask = np.zeros((256, 256), np.uint8)
    mask[32:224, 32:224] = 255
    for i in range(args.images):
        img = rng.integers(0, 256, (256, 256, 3)).astype(np.uint8)
        imageio.imwrite(os.path.join(dirs["input"], f"img{i:04d}.png"), img)
        imageio.imwrite(
            os.path.join(dirs["gt"], f"img{i:04d}_{i % 18 + 1:02d}.png"), img
        )
        imageio.imwrite(os.path.join(dirs["mask"], f"img{i:04d}.png"), mask)
    gen_s = time.perf_counter() - gen0

    cfg = preset_multipie_eval()
    if args.precision:
        from geomconsistentfr_tpu.config import apply_precision_tier

        cfg = apply_precision_tier(cfg, args.precision)
    elif args.fast:
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(cfg.model, compute_dtype="bfloat16"),
            render=dataclasses.replace(
                cfg.render, shadow_matmul_precision="default"
            ),
        )
    rl = load_relighter(
        "/root/reference/model_lighting_transfer/model_epoch106.pth", cfg=cfg
    )

    out_dir = os.path.join(root, "dump")
    # Warm the compile (one padded batch) so the timing is steady-state.
    run_inference(rl, dirs["input"], dirs["gt"], mat, dirs["mask"],
                  output_dir=os.path.join(root, "warm"),
                  limit=args.batch, batch_size=args.batch)

    t0 = time.perf_counter()
    n = run_inference(rl, dirs["input"], dirs["gt"], mat, dirs["mask"],
                      output_dir=out_dir, batch_size=args.batch)
    elapsed = time.perf_counter() - t0
    files = len(os.listdir(out_dir))

    print(json.dumps({
        "exp": "eval_protocol",
        "images": n,
        "output_files": files,
        "mode": args.precision or ("fast" if args.fast else "strict"),
        "batch": args.batch,
        "wall_seconds": round(elapsed, 1),
        "images_per_sec_end_to_end": round(n / elapsed, 2),
        "dataset_gen_seconds": round(gen_s, 1),
    }))
    if not args.keep:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
