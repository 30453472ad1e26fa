"""End-to-end STREAMING train-epoch throughput (host batches -> device).

Unlike tools/bench_train.py (device-resident batch: measures the step kernel
alone), this drives Trainer.run_epoch on a cache-backed provider, so it pays
the real per-step costs: host batch assembly, host->device upload, metric
collection. This is the number a real training run sees.

Usage: python tools/bench_train_stream.py [batch] [steps]
Env:  GCFR_FAST=1 for the fast tier, GCFR_F32_UPLOAD=1 to A/B the legacy
      f32 per-field upload (metric collection stays async in both arms).
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_cache(cache_dir: str, n: int = 64) -> None:
    import numpy as np

    if os.path.exists(os.path.join(cache_dir, "meta.json")):
        return
    os.makedirs(cache_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    fields = {
        "image": (np.uint8, (256, 256, 3)),
        "depth_gt": (np.float32, (256, 256)),
        "depth_mask": (np.uint8, (256, 256)),
        "albedo_gt": (np.uint8, (256, 256)),
        "face_mask": (np.uint8, (256, 256)),
        "light_gt": (np.float32, (3,)),
    }
    for name, (dt, shape) in fields.items():
        if dt == np.uint8:
            arr = rng.integers(0, 256, size=(n, *shape)).astype(np.uint8)
        else:
            arr = rng.normal(size=(n, *shape)).astype(np.float32)
        np.save(os.path.join(cache_dir, f"{name}.npy"), arr)
    with open(os.path.join(cache_dir, "meta.json"), "w") as f:
        json.dump({"num_samples": n}, f)


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from geomconsistentfr_tpu import train as train_mod
    from geomconsistentfr_tpu.config import preset_target_lighting_train
    from geomconsistentfr_tpu.data import CelebAHQRelightingData
    from geomconsistentfr_tpu.parallel.mesh import make_mesh

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    cache_dir = "/tmp/gcfr_stream_cache"
    make_cache(cache_dir)
    data = CelebAHQRelightingData(cache_dir)
    if os.environ.get("GCFR_F32_UPLOAD") == "1":
        # Legacy-path A/B: hide the raw accessors so run_epoch falls back to
        # f32 per-field batches (the decode becomes a pass-through).
        class F32Only:
            def __init__(self, inner):
                self._inner = inner
                self.num_samples = inner.num_samples

            def get_batch(self, idx):
                return self._inner.get_batch(idx)

            def sample_batch(self, rng, b):
                return self._inner.sample_batch(rng, b)

            def epoch_batch_indices(self, rng, b, n):
                return self._inner.epoch_batch_indices(rng, b, n)

        data = F32Only(data)

    cfg = preset_target_lighting_train()
    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(
            cfg.train,
            batch_size=batch,
            batches_per_epoch=steps,
            log_every_steps=1,
            checkpoint_every_steps=0,
        ),
    )
    if os.environ.get("GCFR_FAST") == "1":
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(cfg.model, compute_dtype="bfloat16"),
            render=dataclasses.replace(
                cfg.render, shadow_matmul_precision="default"
            ),
        )

    mesh = make_mesh(jax.devices()[:1])
    trainer = train_mod.Trainer(
        cfg, data=data, workdir="/tmp/gcfr_stream_run", mesh=mesh
    )
    state = train_mod.init_state(cfg, jax.random.PRNGKey(0), batch_size=batch)

    # Epoch 0 pays compiles; epoch 1 is the measurement.
    state, m0 = trainer.run_epoch(state, 0)
    t0 = time.perf_counter()
    state, m1 = trainer.run_epoch(state, 1)
    wall = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "metric": "streaming_train_epoch",
                "batch": batch,
                "steps": steps,
                "step_seconds": round(wall / steps, 3),
                "images_per_s": round(batch * steps / wall, 2),
                "epoch_seconds": round(wall, 2),
                "mode": (
                    "f32_upload" if os.environ.get("GCFR_F32_UPLOAD") == "1"
                    else "raw_u8_upload"
                ),
                "tier": "fast" if os.environ.get("GCFR_FAST") == "1" else "strict",
            }
        )
    )


if __name__ == "__main__":
    main()
