"""Sweep Pallas shadow-kernel tilings/precisions + train step on the chip.

Run manually (TPU is exclusive; never concurrently with bench.py/tests):
    python tools/bench_shadow_sweep.py march 8,4,default 8,8,default ...
    python tools/bench_shadow_sweep.py train strict fast
Appends one JSON line per experiment to /tmp/shadow_sweep.jsonl (and stdout),
so partial progress survives a crash. Each distinct config is a fresh remote
compile (minutes); keep lists short.
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = "/tmp/shadow_sweep.jsonl"


def emit(rec):
    line = json.dumps(rec)
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def bench_march(specs):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from geomconsistentfr_tpu.config import preset_single_image
    from geomconsistentfr_tpu.ops.shadows_pallas import ray_march_min_distance_pallas

    base = preset_single_image().render
    batch = int(os.environ.get("SWEEP_BATCH", "16"))
    rng = np.random.default_rng(0)
    depth = jnp.asarray(rng.normal(size=(batch, 256, 256)).astype(np.float32) * 30)
    mask = jnp.asarray((rng.uniform(size=(batch, 256, 256)) > 0.2).astype(np.float32))
    lights = jnp.tile(
        jnp.asarray([[0.3, 0.4, 0.8660254]], np.float32) * base.light_distance,
        (batch, 1),
    )

    for spec in specs:
        parts = spec.split(",")
        tile_s, slab_s, prec = parts[:3]
        unroll = int(parts[3]) if len(parts) > 3 else 1
        interleave = "il" in parts[4:]
        mask_mode = next(
            (p for p in parts[4:] if p in ("onehot", "hat", "hat_y", "bilinear")),
            "auto",
        )
        cfg = dataclasses.replace(
            base,
            shadow_tile_rows=int(tile_s),
            shadow_slab_rows=int(slab_s),
            shadow_matmul_precision=prec,
            shadow_unroll=unroll,
            shadow_slab_interleave=interleave,
            shadow_mask_gather=mask_mode,
        )

        @jax.jit
        def run(d, m, l, salt):
            out = ray_march_min_distance_pallas(d + salt * 1e-7, m, l, cfg)
            return out.sum()

        try:
            t0 = time.perf_counter()
            float(run(depth, mask, lights, jnp.float32(0)))
            compile_s = time.perf_counter() - t0
            iters = 3
            t0 = time.perf_counter()
            for i in range(iters):
                float(run(depth, mask, lights, jnp.float32(i + 1)))
            dt = (time.perf_counter() - t0) / iters
            emit(
                {
                    "exp": "march",
                    "tile": int(tile_s),
                    "slab": int(slab_s),
                    "precision": prec,
                    "unroll": unroll,
                    "interleave": interleave,
                    "mask": mask_mode,
                    "batch": batch,
                    "sec_per_batch": round(dt, 4),
                    "ms_per_image": round(1000 * dt / batch, 2),
                    "compile_s": round(compile_s, 1),
                }
            )
        except Exception as e:  # noqa: BLE001 - sweep must survive bad configs
            emit({"exp": "march", "spec": spec, "error": repr(e)[:500]})


def bench_march_grad(specs):
    """Time forward+backward through the march alone (value_and_grad)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from geomconsistentfr_tpu.config import preset_single_image
    from geomconsistentfr_tpu.ops.shadows_pallas import (
        ray_march_min_distance_pallas_vjp,
    )

    base = preset_single_image().render
    batch = int(os.environ.get("SWEEP_TRAIN_BATCH", "3"))
    rng = np.random.default_rng(0)
    depth = jnp.asarray(rng.normal(size=(batch, 256, 256)).astype(np.float32) * 30)
    mask = jnp.asarray((rng.uniform(size=(batch, 256, 256)) > 0.2).astype(np.float32))
    lights = jnp.tile(
        jnp.asarray([[0.3, 0.4, 0.8660254]], np.float32) * base.light_distance,
        (batch, 1),
    )

    for prec in specs:
        cfg = dataclasses.replace(base, shadow_matmul_precision=prec)

        @jax.jit
        def run(d, m, l, salt):
            def loss(dd):
                out = ray_march_min_distance_pallas_vjp(dd, m, l, cfg)
                return jnp.sum(jnp.tanh(out))

            v, g = jax.value_and_grad(loss)(d + salt * 1e-7)
            return v + g.sum()

        try:
            t0 = time.perf_counter()
            float(run(depth, mask, lights, jnp.float32(0)))
            compile_s = time.perf_counter() - t0
            iters = 3
            t0 = time.perf_counter()
            for i in range(iters):
                float(run(depth, mask, lights, jnp.float32(i + 1)))
            dt = (time.perf_counter() - t0) / iters
            emit(
                {
                    "exp": "march_grad",
                    "precision": prec,
                    "bwd": os.environ.get("GCFR_SHADOW_BWD", "matmul"),
                    "batch": batch,
                    "sec_per_batch": round(dt, 4),
                    "compile_s": round(compile_s, 1),
                }
            )
        except Exception as e:  # noqa: BLE001
            emit({"exp": "march_grad", "precision": prec, "error": repr(e)[:500]})


def bench_train(modes):
    import numpy as np
    import jax

    from geomconsistentfr_tpu import train as train_mod
    from geomconsistentfr_tpu.config import preset_target_lighting_train

    batch = int(os.environ.get("SWEEP_TRAIN_BATCH", "3"))
    for mode in modes:
        cfg = preset_target_lighting_train()
        if mode != "strict":
            cfg = dataclasses.replace(
                cfg,
                render=dataclasses.replace(
                    cfg.render, shadow_matmul_precision="default"
                ),
            )
        tile = os.environ.get("SWEEP_TRAIN_TILE")
        if tile:
            t, s = tile.split(",")
            cfg = dataclasses.replace(
                cfg,
                render=dataclasses.replace(
                    cfg.render, shadow_tile_rows=int(t), shadow_slab_rows=int(s)
                ),
            )
        state = train_mod.init_state(cfg, jax.random.PRNGKey(0), batch_size=batch)
        step = train_mod.make_single_device_step(cfg)
        rng = np.random.default_rng(0)
        s = cfg.render.img_height
        batch_np = {
            "image": rng.uniform(0, 1, (batch, s, s, 3)).astype(np.float32),
            "face_mask": (rng.uniform(size=(batch, s, s)) > 0.1).astype(np.float32),
            "depth_gt": rng.normal(size=(batch, s, s)).astype(np.float32),
            "depth_mask": np.ones((batch, s, s), np.float32),
            "albedo_gt": rng.uniform(0, 1, (batch, s, s)).astype(np.float32),
            "light_gt": np.tile(
                np.asarray([[0.0, 0.7071, 0.7071]], np.float32), (batch, 1)
            ),
        }
        if os.environ.get("SWEEP_DEVICE_PUT") == "1":
            import jax.numpy as jnp

            batch_np = {k: jnp.asarray(v) for k, v in batch_np.items()}
        use_skips = (True, True, True, True)
        try:
            t0 = time.perf_counter()
            state, metrics = step(state, batch_np, use_skips)
            _ = float(metrics["total"])
            compile_s = time.perf_counter() - t0
            iters = 3
            t0 = time.perf_counter()
            for _ in range(iters):
                state, metrics = step(state, batch_np, use_skips)
                _ = float(metrics["total"])
            dt = (time.perf_counter() - t0) / iters
            emit(
                {
                    "exp": "train",
                    "mode": mode,
                    "tile": os.environ.get("SWEEP_TRAIN_TILE", "default"),
                    "batch": batch,
                    "step_seconds": round(dt, 4),
                    "compile_s": round(compile_s, 1),
                }
            )
        except Exception as e:  # noqa: BLE001
            emit({"exp": "train", "mode": mode, "error": repr(e)[:500]})


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    emit({"start": time.strftime("%H:%M:%S"), "argv": sys.argv[1:],
          "platform": jax.devices()[0].platform})
    what = sys.argv[1]
    if what == "march":
        bench_march(sys.argv[2:])
    elif what == "march_grad":
        bench_march_grad(sys.argv[2:])
    elif what == "train":
        bench_train(sys.argv[2:])
    else:
        raise SystemExit(f"unknown experiment {what}")


if __name__ == "__main__":
    main()
