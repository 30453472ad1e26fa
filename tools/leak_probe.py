"""On-chip RSS-leak probe for the training loop (diagnostic, round 5).

The protocol-shape soak (docs/TRAIN_soak.json) showed host RSS flat at
~0.5 GB for ~6 epochs, then growing linearly at ~28 MB/s (~5.3 MB/step,
about one uploaded f32 batch per step) until the run ended at 79 GB.
This probe replays the same Trainer.run_epoch loop with RSS sampled every
50 steps and explicit markers around checkpoint saves, so the onset step
and its correlation with saves/uploads is directly visible.

Probe matrix result (2026-08-20, 400 steps each, batch 3, fast tier):
  streaming f32   5.25 MB/step leaked
  streaming raw-u8 1.96 MB/step (scales with transferred bytes)
  block_until_ready after the put: no change (async under axon)
  device-resident (no per-step upload): 0.0 — flat
=> every device_put leaks its host staging buffer inside the axon PJRT
plugin. Fix: TrainConfig.data_residency (train.DeviceResidentBatches).

Usage (on chip):
  python tools/leak_probe.py --epochs 10 [--no-save] [--resident]
  python tools/leak_probe.py --trainer --residency auto --epochs 2
"""

import argparse
import dataclasses
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import numpy as np

from geomconsistentfr_tpu.config import PRESETS, apply_precision_tier
from geomconsistentfr_tpu.data import SyntheticFaceData
from geomconsistentfr_tpu import train as train_mod


def rss_kb() -> int:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1])
    return 0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--batches", type=int, default=700)
    ap.add_argument("--no-save", action="store_true",
                    help="skip the per-epoch checkpoint save")
    ap.add_argument("--resident", action="store_true",
                    help="reuse ONE device-resident batch (no per-step "
                    "device_put)")
    ap.add_argument("--trainer", action="store_true",
                    help="drive the REAL Trainer.run_epoch instead of the "
                    "instrumented loop (RSS logged per epoch)")
    ap.add_argument("--residency", default="auto",
                    choices=["auto", "device", "stream"])
    ap.add_argument("--out", default="/tmp/gcfr_leak_probe")
    args = ap.parse_args()

    cfg = apply_precision_tier(PRESETS["target_lighting_train"](), "fast")
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(
            cfg.train, batches_per_epoch=args.batches, keep_checkpoints=3,
            data_residency=args.residency,
        )
    )
    data = SyntheticFaceData(num_samples=64, size=cfg.render.img_height)
    trainer = train_mod.Trainer(cfg, data, workdir=args.out)
    state = trainer.init_or_resume()
    t0 = time.time()

    if args.trainer:
        for epoch in range(args.epochs):
            state, m = trainer.run_epoch(state, epoch)
            print(json.dumps({
                "t": round(time.time() - t0, 1), "epoch": epoch,
                "rss_kb": rss_kb(), "seconds": round(m["seconds"], 2),
                "total": round(m["total"], 5),
                "resident": trainer._resident() is not None,
            }), flush=True)
            if not args.no_save:
                trainer.save(state)
        return

    def log(tag, step):
        print(json.dumps({
            "t": round(time.time() - t0, 1), "step": step,
            "rss_kb": rss_kb(), "tag": tag,
        }), flush=True)

    # Instrumented copy of the run_epoch hot loop (same upload, sync and
    # metrics cadence; losses are not exported).
    from geomconsistentfr_tpu.utils.transfer import pack_device_put

    use_skips = cfg.model.skip_gates(0)
    step = 0
    resident = None
    if args.resident:
        rng = np.random.default_rng(0)
        resident = train_mod._decode_device_batch(
            pack_device_put(data.sample_batch(rng, cfg.train.batch_size))
        )
        jax.block_until_ready(resident)
    for epoch in range(args.epochs):
        rng = np.random.default_rng([cfg.train.seed, epoch])
        pending = []
        for j in range(args.batches):
            if resident is not None:
                batch = resident
            else:
                batch = train_mod._decode_device_batch(
                    pack_device_put(data.sample_batch(rng, cfg.train.batch_size))
                )
            state, metrics = trainer.step_fn(state, batch, use_skips)
            step += 1
            for leaf in jax.tree.leaves(metrics):
                if hasattr(leaf, "copy_to_host_async"):
                    leaf.copy_to_host_async()
            pending.append(metrics)
            if step % 8 == 0:
                float(metrics["total"])
            if step % 50 == 0:
                log("step", step)
        jax.device_get(pending)
        pending.clear()
        log("epoch_end", step)
        if not args.no_save:
            log("save_start", step)
            trainer.save(state)
            log("save_end", step)
    log("done", step)


if __name__ == "__main__":
    main()
