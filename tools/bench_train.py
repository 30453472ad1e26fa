"""Training-step throughput on the current devices (run manually; TPU is
exclusive — don't run concurrently with bench.py).

Usage: python tools/bench_train.py [batch_size]
Prints one JSON line with steps/sec and images/sec for the full GAN train step
(forward incl. fused shadow march, both backward passes, optimizer updates).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import numpy as np

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from geomconsistentfr_tpu import train as train_mod
    from geomconsistentfr_tpu.config import preset_target_lighting_train

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    cfg = preset_target_lighting_train()
    import dataclasses

    if os.environ.get("GCFR_FAST") == "1":
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(cfg.model, compute_dtype="bfloat16"),
            render=dataclasses.replace(
                cfg.render, shadow_matmul_precision="default"
            ),
        )
    if os.environ.get("GCFR_TIER"):
        # Full serving-tier config (what `cli train --precision` applies):
        # strict / high / fast. Includes shadow_mask_cull, which is exact
        # for training (off-face loss cotangents are zero).
        from geomconsistentfr_tpu.config import apply_precision_tier

        cfg = apply_precision_tier(cfg, os.environ["GCFR_TIER"])
    if os.environ.get("GCFR_PRECISION"):
        # 'highest' | 'high' | 'default' shadow matmul precision A/B knob.
        cfg = dataclasses.replace(
            cfg,
            render=dataclasses.replace(
                cfg.render,
                shadow_matmul_precision=os.environ["GCFR_PRECISION"],
            ),
        )
    if os.environ.get("GCFR_COL_CHUNK"):
        # Column-cull chunk-width A/B knob (the tiers set 32/64; 0 = row
        # cull only).
        cfg = dataclasses.replace(
            cfg,
            render=dataclasses.replace(
                cfg.render,
                shadow_col_chunk=int(os.environ["GCFR_COL_CHUNK"]),
            ),
        )
    if os.environ.get("GCFR_SHADOW_SLAB"):
        # Slab-size A/B knob (0 = auto).
        cfg = dataclasses.replace(
            cfg,
            render=dataclasses.replace(
                cfg.render,
                shadow_slab_rows=int(os.environ["GCFR_SHADOW_SLAB"]),
            ),
        )

    state = train_mod.init_state(cfg, jax.random.PRNGKey(0), batch_size=batch)
    step = train_mod.make_single_device_step(cfg)

    rng = np.random.default_rng(0)
    s = cfg.render.img_height
    if os.environ.get("GCFR_MASK") == "face":
        # Real FFHQ skin mask (what CelebA-HQ training batches look like);
        # whole off-face 8-row bands let the march cull fire.
        face_mask = np.broadcast_to(
            np.load(
                os.path.join(
                    os.path.dirname(os.path.dirname(
                        os.path.abspath(__file__))),
                    "tests/golden/ref_transfer_00104.npz",
                )
            )["mask"],
            (batch, s, s),
        ).astype(np.float32)
    else:
        face_mask = (rng.uniform(size=(batch, s, s)) > 0.1).astype(np.float32)
    batch_np = {
        "image": rng.uniform(0, 1, (batch, s, s, 3)).astype(np.float32),
        "face_mask": face_mask,
        "depth_gt": rng.normal(size=(batch, s, s)).astype(np.float32),
        "depth_mask": np.ones((batch, s, s), np.float32),
        "albedo_gt": rng.uniform(0, 1, (batch, s, s)).astype(np.float32),
        "light_gt": np.tile(np.asarray([[0.0, 0.7071, 0.7071]], np.float32), (batch, 1)),
    }

    # Device-resident batch: measures the step itself. In real training the
    # Trainer's async prefetch hides the host->device transfer (which costs
    # ~0.25 s/step over the axon tunnel if paid synchronously).
    import jax.numpy as jnp

    batch_np = {k: jnp.asarray(v) for k, v in batch_np.items()}

    use_skips = (True, True, True, True)
    t0 = time.perf_counter()
    state, metrics = step(state, batch_np, use_skips)
    _ = float(metrics["total"])  # force execution (axon block is async)
    compile_s = time.perf_counter() - t0

    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, batch_np, use_skips)
        _ = float(metrics["total"])
    dt = (time.perf_counter() - t0) / iters

    print(
        json.dumps(
            {
                "metric": "train_step_throughput",
                "value": round(batch / dt, 3),
                "unit": f"images/sec (batch {batch}, full GAN step)",
                "step_seconds": round(dt, 3),
                "compile_seconds": round(compile_s, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
