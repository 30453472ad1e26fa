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
    report = analyze(epochs, samples, wall, meta={
        "date": time.strftime("%Y-%m-%d"),
        "protocol": (
            f"cli train --data synthetic --epochs {args.epochs} "
            f"--precision {args.precision}, batches_per_epoch=700 "
            "(reference train_raytracing_...py:579-580), batch 3, "
            "gates at 9/11/13/15, keep_checkpoints=3, on-chip."
        ),
        "wall_seconds": round(wall, 1),
    })
    json_path = os.path.join(REPO, args.json)
    with open(json_path, "w") as f:
        json.dump(report, f, indent=1)
    png = json_path.replace(".json", "_losses.png")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "plot_losses.py"),
         csv_path, png],
        check=True, cwd=REPO,
    )
    print(json.dumps(_summary(report, args.json, png)))


GATE_EPOCHS = (9, 11, 13, 15)


def _segments(n_epochs, gate_epochs=GATE_EPOCHS):
    """Constant-graph epoch ranges: the skip topology (and hence the compiled
    step) changes at each gate epoch, so stability is only meaningful WITHIN
    a segment. Epoch 0 (compile) and the gate epochs themselves (recompile)
    are boundaries, not members."""
    segs, cur = [], []
    for e in range(1, n_epochs):
        if e in gate_epochs:
            if cur:
                segs.append(cur)
            cur = []
        else:
            cur.append(e)
    if cur:
        segs.append(cur)
    return segs


def _host_ram_kb() -> int:
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemTotal:"):
                    return int(line.split()[1])
    except OSError:
        pass
    return 128 * 1024 * 1024


def _slope_kb_per_min(pts):
    """Least-squares slope of (t_seconds, rss_kb) points, in kB/minute."""
    if len(pts) < 2:
        return 0.0
    n = len(pts)
    mt = sum(p[0] for p in pts) / n
    mr = sum(p[1] for p in pts) / n
    denom = sum((p[0] - mt) ** 2 for p in pts)
    if denom == 0:
        return 0.0
    return 60.0 * sum((p[0] - mt) * (p[1] - mr) for p in pts) / denom


def analyze(epochs, samples, wall, meta, gate_epochs=GATE_EPOCHS):
    """Build the soak report from per-epoch metrics + host samples.

    The gated architecture makes naive whole-run metrics misleading: each
    gate OPENS skip connections, so post-gate epochs genuinely compute more
    (step time steps UP at the gate and is flat after), and each gate
    recompile retains host memory once (compile arenas/executables), so RSS
    steps at the 4 recompiles and is flat between them. Stability is
    therefore measured per constant-graph segment; the gate steps are
    reported separately as bounded, structural costs (the full 100-epoch
    reference protocol crosses each gate exactly once).
    """
    by_epoch = {e["epoch"]: e for e in epochs}
    segs = [
        [by_epoch[i] for i in seg if i in by_epoch]
        for seg in _segments(max(e["epoch"] for e in epochs) + 1, gate_epochs)
    ]
    segs = [s for s in segs if s]
    seg_stats = []
    for s in segs:
        secs = [e["seconds"] for e in s]
        mean_s = sum(secs) / len(secs)
        seg_stats.append({
            "epochs": [s[0]["epoch"], s[-1]["epoch"]],
            "mean_seconds": round(mean_s, 2),
            "drift_pct": round(100.0 * (max(secs) - min(secs)) / mean_s, 2),
        })
    worst_drift = max(st["drift_pct"] for st in seg_stats)
    all_steady = [e["seconds"] for s in segs for e in s]

    # Losses trend through gates: mean total of the last 2 pre-gate epochs vs
    # the 2 epochs after the gate settles (gate epoch itself excluded — the
    # fresh skip paths spike the loss by design, see TRAIN_gates.json).
    totals = {e["epoch"]: e["total"] for e in epochs}
    transitions = []
    for g in gate_epochs:
        before = [totals[i] for i in (g - 2, g - 1) if i in totals]
        after = [totals[i] for i in (g + 1, g + 2) if i in totals]
        if before and after:
            transitions.append({
                "gate_epoch": g,
                "total_before": round(sum(before) / len(before), 5),
                "total_at_gate": totals.get(g),
                "total_after": round(sum(after) / len(after), 5),
                "recovered": sum(after) / len(after)
                             < 1.25 * sum(before) / len(before),
            })

    rss = [s["rss_kb"] for s in samples if s["rss_kb"]]
    disk = [s["disk_kb"] for s in samples]
    # Host-RSS behaviour, gate-aware. Map sample times onto epochs: the
    # pre-epoch-1 offset absorbs startup + compile.
    offset = wall - sum(e["seconds"] for e in epochs)
    end_t = {}
    acc = offset
    for e in sorted(epochs, key=lambda x: x["epoch"]):
        acc += e["seconds"]
        end_t[e["epoch"]] = acc
    last_gate = max((g for g in gate_epochs if g in end_t), default=None)
    # Final constant-graph window: after the last gate's recompile epoch
    # finishes (plus one settling epoch), through the end of the run.
    tail_start = end_t[last_gate + 1] if last_gate is not None \
        and (last_gate + 1) in end_t else (samples[-1]["t"] * 0.75)
    tail = [(s["t"], s["rss_kb"]) for s in samples
            if s["rss_kb"] and s["t"] >= tail_start]
    tail_slope = _slope_kb_per_min(tail)

    # The raw tail fit is sawtooth-noisy: malloc_trim at each save returns
    # the epoch's transient working set, which refills next epoch. The
    # durable signal is the per-epoch FLOOR (min RSS within each epoch's
    # window), fitted over every epoch the tail window covers.
    def _floor(e):
        lo = end_t[e] - by_epoch[e]["seconds"]
        seg = [s["rss_kb"] for s in samples
               if s["rss_kb"] and lo <= s["t"] <= end_t[e]]
        return float(min(seg)) if seg else None

    floors = [(float(e), _floor(e)) for e in sorted(by_epoch)
              if e in end_t and end_t[e] >= tail_start]
    floors = [(e, r) for e, r in floors if r is not None]
    floor_slope_kb_per_epoch = 0.0
    if len(floors) >= 2:
        floor_slope_kb_per_epoch = _slope_kb_per_min(
            [(e * 60.0, r) for e, r in floors]  # 1 "minute" per epoch
        )
    # Steady-state RSS before the first gate (graph constant, post-compile).
    first_gate = min((g for g in gate_epochs if g in end_t), default=None)
    pre_end = end_t[first_gate - 1] if first_gate is not None \
        and (first_gate - 1) in end_t else samples[-1]["t"]
    pre = [s["rss_kb"] for s in samples
           if s["rss_kb"] and offset + 60 <= s["t"] <= pre_end]
    rss_pre_gate = (sum(pre) / len(pre)) if pre else rss[0]
    n_gates = len([g for g in gate_epochs if g in end_t])
    step_per_gate = ((max(rss) - rss_pre_gate) / n_gates) if n_gates else 0.0

    # Disk is bounded when checkpoint retention holds the run dir flat over
    # the back half of the run (not the old tautological final<=peak check).
    half = disk[len(disk) // 2:]
    disk_bounded = bool(half) and disk[-1] <= 1.10 * (
        sorted(half)[len(half) // 2] or 1
    )

    return {
        "_meta": meta,
        "epochs": epochs,
        "steady_state": {
            "segments": seg_stats,
            "worst_segment_drift_pct": worst_drift,
            "flat_within_5pct": worst_drift <= 5.0,
            "mean_seconds_per_epoch": round(
                sum(all_steady) / len(all_steady), 2),
            "gate_compute_steps": (
                "per-segment mean seconds rise at gate epochs because each "
                "gate OPENS skip connections (more decoder/backward work); "
                "see segments[].mean_seconds"
            ),
            "excluded_epochs": [0] + list(gate_epochs),
        },
        "gate_transitions": transitions,
        "host": {
            "rss_kb_first": rss[0],
            "rss_kb_pre_gate_steady": round(rss_pre_gate),
            "rss_kb_peak": max(rss),
            "rss_step_per_gate_recompile_kb": round(step_per_gate),
            "rss_tail_slope_kb_per_min": round(tail_slope, 1),
            "rss_floor_slope_kb_per_epoch": round(
                floor_slope_kb_per_epoch, 1),
            "rss_projected_100epoch_peak_kb": round(
                rss_pre_gate + 4 * step_per_gate
                + 100 * max(floor_slope_kb_per_epoch, 0.0)),
            "host_ram_kb": _host_ram_kb(),
            "rss_bounded_for_protocol": (
                rss_pre_gate + 4 * step_per_gate
                + 100 * max(floor_slope_kb_per_epoch, 0.0)
            ) < 0.25 * _host_ram_kb(),
            "rss_note": (
                "RSS steps once per gate recompile (retained XLA compile "
                "arenas/executables; the 100-epoch protocol crosses each "
                "gate exactly once — bounded). Between saves the per-epoch "
                "working set refills after malloc_trim, so the durable "
                "signal is the per-epoch floor slope: residual glibc "
                "small-allocation fragmentation, ~37 MB/epoch in the CLI "
                "context. rss_projected_100epoch_peak_kb extrapolates the "
                "full reference protocol (base + 4 gate steps + 100x floor "
                "slope); rss_bounded_for_protocol gates it at 25% of host "
                "RAM. The per-step device_put leak (5.25 MB/step, would "
                "OOM ~epoch 30) and the per-save orbax retention are gone "
                "(TrainConfig.data_residency + the checkpointer singleton, "
                "docs/HOST_LEAK_probe.md)"
            ),
            "disk_kb_peak": max(disk),
            "disk_kb_final": disk[-1],
            "disk_bounded": disk_bounded,
            "samples": samples[:: max(len(samples) // 60, 1)],
        },
    }


def _summary(report, json_rel, png):
    return {
        "epochs": len(report["epochs"]),
        "mean_s_per_epoch":
            report["steady_state"]["mean_seconds_per_epoch"],
        "worst_segment_drift_pct":
            report["steady_state"]["worst_segment_drift_pct"],
        "flat_within_5pct": report["steady_state"]["flat_within_5pct"],
        "rss_tail_slope_kb_per_min":
            report["host"]["rss_tail_slope_kb_per_min"],
        "rss_floor_slope_kb_per_epoch":
            report["host"]["rss_floor_slope_kb_per_epoch"],
        "rss_projected_100epoch_peak_kb":
            report["host"]["rss_projected_100epoch_peak_kb"],
        "rss_bounded_for_protocol":
            report["host"]["rss_bounded_for_protocol"],
        "rss_kb_peak": report["host"]["rss_kb_peak"],
        "disk_kb_final": report["host"]["disk_kb_final"],
        "json": json_rel,
        "png": os.path.relpath(png, REPO) if png else None,
    }


def reprocess(json_rel):
    """Rebuild the summary sections of an existing TRAIN_soak.json in place
    (epochs + host samples are preserved verbatim; no chip time needed)."""
    json_path = os.path.join(REPO, json_rel)
    with open(json_path) as f:
        old = json.load(f)
    report = analyze(
        old["epochs"], old["host"]["samples"],
        old["_meta"]["wall_seconds"], old["_meta"],
    )
    with open(json_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(_summary(report, json_rel, None)))


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--reprocess":
        reprocess(sys.argv[2])
    else:
        main()
