"""Training soak at the reference protocol shape, with host-health sampling.

The reference trains 700 batches/epoch at batch 3 for ~100 epochs
(train_raytracing_relighting_CelebAHQ_DSSIM_8x.py:579-580); the round-4 gate
proof (docs/TRAIN_gates.json) used a shortened 50-batch epoch. This tool runs
the real epoch shape long enough to cross all four skip gates (epochs
9/11/13/15) and proves the things a short run cannot:

  * step-time stability: s/epoch flat (+-5%) after the compile epoch,
  * host health: the trainer subprocess RSS does not creep,
  * checkpoint retention: keep_checkpoints bounds the run directory on disk,
  * losses trend down through every gate transition.

It launches the normal CLI as a subprocess (so the measured process is
exactly what a user runs), samples /proc/<pid>/status VmRSS and the run
directory's disk usage on a fixed cadence, then post-processes
<out>/losses/metrics.csv into docs/TRAIN_soak.json + a loss PNG.

Usage:
  python tools/train_soak.py --epochs 20 --precision fast \
      --out /tmp/gcfr_soak --json docs/TRAIN_soak.json
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _rss_kb(pid: int) -> int:
    try:
        with open(f"/proc/{pid}/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1])
    except OSError:
        pass
    return 0


def _du_kb(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for name in files:
            try:
                total += os.path.getsize(os.path.join(root, name))
            except OSError:
                pass
    return total // 1024


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--precision", default="fast",
                    choices=["strict", "high", "fast"])
    ap.add_argument("--out", default="/tmp/gcfr_soak")
    ap.add_argument("--json", default="docs/TRAIN_soak.json")
    ap.add_argument("--sample-every", type=float, default=15.0,
                    help="host-health sampling cadence (seconds)")
    ap.add_argument("--config", default=None,
                    help="extra JSON PipelineConfig overrides")
    args = ap.parse_args()

    cmd = [
        sys.executable, "-m", "geomconsistentfr_tpu.cli", "train",
        "--data", "synthetic", "--epochs", str(args.epochs),
        "--precision", args.precision, "--out", args.out,
        "--visualize-every", "0",
    ]
    if args.config:
        cmd += ["--config", args.config]

    t0 = time.time()
    proc = subprocess.Popen(cmd, cwd=REPO)
    samples = []
    try:
        while proc.poll() is None:
            samples.append({
                "t": round(time.time() - t0, 1),
                "rss_kb": _rss_kb(proc.pid),
                "disk_kb": _du_kb(args.out) if os.path.isdir(args.out) else 0,
            })
            time.sleep(args.sample_every)
    except KeyboardInterrupt:
        proc.terminate()
        raise
    wall = time.time() - t0
    if proc.returncode != 0:
        raise SystemExit(f"train subprocess failed: rc={proc.returncode}")

    import csv

    csv_path = os.path.join(args.out, "losses", "metrics.csv")
    with open(csv_path) as f:
        rows = list(csv.DictReader(f))
    epochs = [
        {"epoch": int(float(r["epoch"])),
         "seconds": round(float(r["seconds"]), 2),
         "total": round(float(r["total"]), 5)}
        for r in rows
    ]
    # Step-time stability over the post-compile epochs. Gate epochs recompile
    # (the skip topology changes), so exclude the first epoch after each gate
    # opening as well as epoch 0.
    gate_epochs = (9, 11, 13, 15)
    steady = [e for e in epochs
              if e["epoch"] >= 1 and e["epoch"] not in gate_epochs]
    secs = [e["seconds"] for e in steady]
    mean_s = sum(secs) / len(secs)
    drift_pct = 100.0 * (max(secs) - min(secs)) / mean_s

    # Losses trend through gates: mean total of the last 2 pre-gate epochs vs
    # the 2 epochs after the gate settles (gate epoch itself excluded — the
    # fresh skip paths spike the loss by design, see TRAIN_gates.json).
    by_epoch = {e["epoch"]: e["total"] for e in epochs}
    transitions = []
    for g in gate_epochs:
        before = [by_epoch[i] for i in (g - 2, g - 1) if i in by_epoch]
        after = [by_epoch[i] for i in (g + 1, g + 2) if i in by_epoch]
        if before and after:
            transitions.append({
                "gate_epoch": g,
                "total_before": round(sum(before) / len(before), 5),
                "total_at_gate": by_epoch.get(g),
                "total_after": round(sum(after) / len(after), 5),
                "recovered": sum(after) / len(after)
                             < 1.25 * sum(before) / len(before),
            })

    rss = [s["rss_kb"] for s in samples if s["rss_kb"]]
    disk = [s["disk_kb"] for s in samples]
    # RSS creep: compare the mean of the last quarter of samples against the
    # mean of the second quarter (the first quarter is still compiling).
    q = max(len(rss) // 4, 1)
    rss_early = sum(rss[q:2 * q]) / q if len(rss) >= 2 * q else rss[0]
    rss_late = sum(rss[-q:]) / q
    report = {
        "_meta": {
            "date": time.strftime("%Y-%m-%d"),
            "protocol": (
                f"cli train --data synthetic --epochs {args.epochs} "
                f"--precision {args.precision}, batches_per_epoch=700 "
                "(reference train_raytracing_...py:579-580), batch 3, "
                "gates at 9/11/13/15, keep_checkpoints=3, on-chip."
            ),
            "wall_seconds": round(wall, 1),
        },
        "epochs": epochs,
        "steady_state": {
            "mean_seconds_per_epoch": round(mean_s, 2),
            "min_seconds": min(secs),
            "max_seconds": max(secs),
            "drift_pct": round(drift_pct, 2),
            "flat_within_5pct": drift_pct <= 5.0,
            "excluded_epochs": [0] + list(gate_epochs),
        },
        "gate_transitions": transitions,
        "host": {
            "rss_kb_first": rss[0],
            "rss_kb_early_mean": round(rss_early),
            "rss_kb_late_mean": round(rss_late),
            "rss_kb_peak": max(rss),
            "rss_creep_pct": round(100.0 * (rss_late - rss_early)
                                   / rss_early, 2),
            "disk_kb_peak": max(disk),
            "disk_kb_final": disk[-1],
            "disk_bounded": disk[-1] <= max(disk),
            "samples": samples[:: max(len(samples) // 60, 1)],
        },
    }
    json_path = os.path.join(REPO, args.json)
    with open(json_path, "w") as f:
        json.dump(report, f, indent=1)
    png = json_path.replace(".json", "_losses.png")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "plot_losses.py"),
         csv_path, png],
        check=True, cwd=REPO,
    )
    print(json.dumps({
        "epochs": len(epochs),
        "mean_s_per_epoch": report["steady_state"]["mean_seconds_per_epoch"],
        "drift_pct": report["steady_state"]["drift_pct"],
        "rss_creep_pct": report["host"]["rss_creep_pct"],
        "disk_kb_final": disk[-1],
        "json": args.json,
        "png": os.path.relpath(png, REPO),
    }))


if __name__ == "__main__":
    main()
