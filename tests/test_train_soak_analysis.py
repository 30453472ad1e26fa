"""tools/train_soak.analyze: gate-segment-aware soak metrics.

The soak postprocessing must not mistake the gated architecture's
structural costs for degradation: step time legitimately steps UP at each
gate (opened skips add compute) and host RSS steps once per gate recompile
(retained compile arenas). Stability is measured per constant-graph
segment; these tests drive analyze() on synthetic runs with known shapes.
"""

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_spec = importlib.util.spec_from_file_location(
    "train_soak", os.path.join(REPO, "tools", "train_soak.py")
)
train_soak = importlib.util.module_from_spec(_spec)
sys.modules["train_soak"] = train_soak
_spec.loader.exec_module(train_soak)


def _run(epoch_secs, rss_fn, wall_extra=500.0, totals=None):
    epochs = [
        {"epoch": i, "seconds": s, "total": (totals or {}).get(i, 3.0 - 0.05 * i)}
        for i, s in enumerate(epoch_secs)
    ]
    wall = wall_extra + sum(epoch_secs)
    samples = [
        {"t": t, "rss_kb": rss_fn(t), "disk_kb": 100_000 if t > wall / 4 else 0}
        for t in range(0, int(wall), 30)
    ]
    meta = {"wall_seconds": wall}
    return train_soak.analyze(epochs, samples, wall, meta)


def test_segments_split_at_gates():
    assert train_soak._segments(20) == [
        list(range(1, 9)), [10], [12], [14], list(range(16, 20))
    ]


def test_gate_step_up_is_not_drift():
    """Flat-within-segment epochs whose mean rises at each gate must report
    near-zero drift (the old whole-run metric called this 7% drift)."""
    secs = [160.0] + [82.0] * 8 + [130.0, 83.0, 130.0, 84.0, 130.0, 85.0,
                                   130.0] + [87.0] * 4
    rep = _run(secs, lambda t: 1_500_000)
    assert rep["steady_state"]["worst_segment_drift_pct"] == 0.0
    assert rep["steady_state"]["flat_within_5pct"] is True
    means = [s["mean_seconds"] for s in rep["steady_state"]["segments"]]
    assert means == [82.0, 83.0, 84.0, 85.0, 87.0]


def test_real_within_segment_drift_is_flagged():
    secs = [160.0] + [80.0 + 1.5 * i for i in range(8)] + [130.0] + [90.0] * 10
    rep = _run(secs, lambda t: 1_500_000)
    assert rep["steady_state"]["worst_segment_drift_pct"] > 5.0
    assert rep["steady_state"]["flat_within_5pct"] is False


def test_rss_gate_steps_vs_tail_slope():
    """RSS that steps 800 MB at each gate boundary but is flat in the final
    window reports flat-between-recompiles with a per-gate step estimate."""
    secs = [160.0] + [82.0] * 19
    wall = 500.0 + sum(secs)

    def rss(t):
        # +800 MB at each gate-recompile time (epochs 9/11/13/15 start at
        # t ~= 1316/1480/1644/1808 for 82 s epochs + 660 s startup+epoch0),
        # flat otherwise
        return 1_500_000 + 800_000 * sum(
            t >= g for g in (1316, 1480, 1644, 1808)
        )

    rep = _run(secs, rss, wall_extra=500.0)
    host = rep["host"]
    assert host["rss_bounded_for_protocol"] is True
    assert host["rss_step_per_gate_recompile_kb"] > 400_000
    assert abs(host["rss_tail_slope_kb_per_min"]) < 2048
    assert abs(host["rss_floor_slope_kb_per_epoch"]) < 2048


def test_rss_unbounded_tail_is_flagged():
    secs = [160.0] + [82.0] * 19
    # ~330 MB/epoch forever: projected 100-epoch peak blows 25% of host RAM
    rep = _run(secs, lambda t: 1_500_000 + int(4000 * t))
    assert rep["host"]["rss_bounded_for_protocol"] is False
    assert rep["host"]["rss_floor_slope_kb_per_epoch"] > 100_000


def test_loss_gate_recovery():
    totals = {i: 3.0 - 0.02 * i for i in range(20)}
    totals[9] = 3.4  # spike at the gate, recovered after
    rep = _run([160.0] + [82.0] * 19, lambda t: 1_500_000, totals=totals)
    g9 = [t for t in rep["gate_transitions"] if t["gate_epoch"] == 9][0]
    assert g9["recovered"] is True
