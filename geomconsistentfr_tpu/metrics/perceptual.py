"""Perceptual-metric extras matching the vendored LPIPS library's surface.

The reference vendors the full PerceptualSimilarity package, whose public
metric classes beyond LPIPS are `L2` and `DSSIM` (lpips/__init__.py:13-125)
plus a 2AFC/JND scoring harness (lpips/trainer.py). Equivalents:

  * l2_distance          mean squared distance in [0,1] or [-1,1] space
  * dssim_distance       (1 - SSIM)/2 on [0,1] images
  * score_2afc           the 2AFC aggregation: mean over triplets of
                         p0-beats-p1 agreement with human judgements
                         (d0 < d1 matches judge > 0.5)
  * score_jnd            JND mAP-style score on same/different pairs
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np

from geomconsistentfr_tpu.metrics.image_metrics import matlab_ssim_map


def l2_distance(x: np.ndarray, y: np.ndarray) -> float:
    """Mean squared distance (lpips.L2 with colorspace='RGB')."""
    return float(np.mean((np.asarray(x, np.float64) - np.asarray(y, np.float64)) ** 2))


def dssim_distance(x: np.ndarray, y: np.ndarray) -> float:
    """(1 - SSIM)/2 distance (lpips.DSSIM)."""
    return float((1.0 - matlab_ssim_map(x, y).mean()) / 2.0)


DistanceFn = Callable[[np.ndarray, np.ndarray], float]


def score_2afc(
    refs: Sequence[np.ndarray],
    p0s: Sequence[np.ndarray],
    p1s: Sequence[np.ndarray],
    judges: Sequence[float],
    distance: DistanceFn,
) -> float:
    """Two-alternative forced choice score (lpips/trainer.py score_2afc_dataset).

    `judge` in [0, 1] is the fraction of humans who preferred p1. A triplet
    scores (1 - judge) when the metric prefers p0 (d0 < d1), `judge` when it
    prefers p1 (d1 < d0), and 0.5 on a tie; the dataset score is the mean —
    i.e. the fraction of human judgements the metric agrees with.
    """
    scores = []
    for ref, p0, p1, judge in zip(refs, p0s, p1s, judges):
        d0 = distance(ref, p0)
        d1 = distance(ref, p1)
        scores.append(
            (d0 < d1) * (1.0 - judge) + (d1 < d0) * judge + (d0 == d1) * 0.5
        )
    return float(np.mean(scores))


def score_jnd(
    p0s: Sequence[np.ndarray],
    p1s: Sequence[np.ndarray],
    same: Sequence[float],
    distance: DistanceFn,
) -> float:
    """JND mAP score (lpips/trainer.py score_jnd_dataset): average precision
    of `same` sorted by ascending distance."""
    ds = np.asarray([distance(a, b) for a, b in zip(p0s, p1s)])
    sames = np.asarray(same, np.float64)
    order = np.argsort(ds)
    sorted_same = sames[order]
    tps = np.cumsum(sorted_same)
    fps = np.cumsum(1.0 - sorted_same)
    fns = sames.sum() - tps
    precision = tps / np.maximum(tps + fps, 1e-12)
    recall = tps / np.maximum(tps + fns, 1e-12)
    # Trapezoid-free VOC-style AP over the recall curve.
    ap = 0.0
    prev_r = 0.0
    for p, r in zip(precision, recall):
        ap += p * max(0.0, r - prev_r)
        prev_r = r
    return float(ap)


def write_html_gallery(out_path: str, rows: Sequence[dict], title: str = "results") -> None:
    """Minimal results viewer (counterpart of lpips util/html.py): each row is
    {label: image_path} rendered as an HTML table."""
    import html
    import os

    cols = sorted({k for row in rows for k in row})
    parts = [f"<html><head><title>{html.escape(title)}</title></head><body>"]
    parts.append(f"<h2>{html.escape(title)}</h2><table border=1>")
    parts.append(
        "<tr>" + "".join(f"<th>{html.escape(c)}</th>" for c in cols) + "</tr>"
    )
    for row in rows:
        cells = []
        for c in cols:
            v = row.get(c, "")
            if isinstance(v, str) and v.lower().endswith((".png", ".jpg", ".jpeg")):
                rel = os.path.relpath(v, os.path.dirname(os.path.abspath(out_path)))
                cells.append(f'<td><img src="{html.escape(rel)}" width=192></td>')
            else:
                cells.append(f"<td>{html.escape(str(v))}</td>")
        parts.append("<tr>" + "".join(cells) + "</tr>")
    parts.append("</table></body></html>")
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "w") as f:
        f.write("\n".join(parts))
