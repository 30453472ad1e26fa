"""Recover light directions from the reference's bundled sphere renderings.

The reference ships Lambertian-sphere visualizations for all 18 Multi-PIE
flashes (`lighting_visualizations/Multi-PIE_lighting_{01..18}.png`) but its
scripts only name 8 of the direction vectors (comments at
test_relight_single_image.py:519-562). `lighting_presets.lighting_sphere`
is already least-squares calibrated to these assets (shading =
ambient + directional * (n . incident), point light at 4013*l, no clamp);
this tool inverts that model per PNG:

  1. linear least squares for (ambient, m = directional * l) under the
     directional-light approximation (incident == l),
  2. a few fixed-point refinements recomputing the per-pixel incident
     direction from the current l estimate (the point light at 4013*l makes
     incident deviate from l by up to ~radius/4013 ~ 3%).

Saturated pixels (clipped to 0 or 1 in the PNG) and the anti-aliased rim are
excluded from the fit. Validated by tests/test_lighting_presets.py: the 8
script-named directions are recovered to ~1e-2 per component.

Run:  python tools/fit_lighting_presets.py [--dir /root/reference/lighting_visualizations]
Prints one JSON line per PNG with the fitted direction/ambient/rms.
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np

RADIUS_FRACTION_FIT = 0.92  # exclude the anti-aliased rim from the fit


def sphere_geometry(size: int):
    """Normals and surface points of the rendered sphere (lighting_sphere's)."""
    radius = size / 2.0 - 1.0
    c = (size - 1) / 2.0
    ys, xs = np.mgrid[0:size, 0:size]
    nx = (xs - c) / radius
    ny = -(ys - c) / radius
    rr2 = nx * nx + ny * ny
    nz = np.sqrt(np.maximum(1.0 - rr2, 0.0))
    normals = np.stack([nx, ny, nz], axis=-1)
    points = normals * radius
    return normals, points, rr2


def fit_sphere_image(
    image: np.ndarray,
    light_distance: float = 4013.0,
    iters: int = 8,
) -> dict:
    """Fit (direction, ambient, directional) of one bundled sphere PNG.

    image: (H, W) or (H, W, 3) float in [0, 1] or uint8.
    """
    img = np.asarray(image, np.float64)
    if img.max() > 1.5:
        img /= 255.0
    if img.ndim == 3:
        img = img.mean(axis=-1)
    size = img.shape[0]
    normals, points, rr2 = sphere_geometry(size)

    interior = rr2 < RADIUS_FRACTION_FIT**2
    unsaturated = (img > 1.5 / 255.0) & (img < 1.0 - 1.5 / 255.0)
    sel = interior & unsaturated
    v = img[sel]
    n = normals[sel]
    p = points[sel]

    # Pass 1: directional approximation — v = a + n . m, linear in (a, m).
    A = np.concatenate([np.ones((v.size, 1)), n], axis=1)
    coef, *_ = np.linalg.lstsq(A, v, rcond=None)
    ambient, m = coef[0], coef[1:]
    direction = m / np.linalg.norm(m)
    directional = float(np.linalg.norm(m))

    # Refine: exact point-light incident directions for the current l.
    for _ in range(iters):
        incident = light_distance * direction - p
        incident /= np.linalg.norm(incident, axis=-1, keepdims=True)
        ndotl = (n * incident).sum(-1)
        # v = a + d * ndotl with l fixed: linear in (a, d)
        A2 = np.stack([np.ones_like(ndotl), ndotl], axis=1)
        (ambient, directional), *_ = np.linalg.lstsq(A2, v, rcond=None)
        # re-solve the direction with (a, d) fixed: v - a = d * (n . incident)
        # ~= d * n . (l - p/4013) => n . l = (v - a)/d + n . p / 4013
        rhs = (v - ambient) / directional + (n * p).sum(-1) / light_distance
        m, *_ = np.linalg.lstsq(n, rhs, rcond=None)
        direction = m / np.linalg.norm(m)

    incident = light_distance * direction - p
    incident /= np.linalg.norm(incident, axis=-1, keepdims=True)
    resid = v - (ambient + directional * (n * incident).sum(-1))
    return {
        "direction": [round(float(x), 4) for x in direction],
        "ambient": round(float(ambient), 4),
        "directional": round(float(directional), 4),
        "rms": float(np.sqrt((resid**2).mean())),
        "pixels": int(v.size),
    }


# The 8 flash directions named in the reference script comments
# (test_relight_single_image.py:519-562) — the calibration anchors.
SCRIPT_DIRECTIONS = {
    "04": (0.7518, 0.0, 0.6594),
    "05": (0.5145, 0.0, 0.8575),
    "09": (-0.5843, 0.0, 0.8115),
    "10": (-0.7574, 0.0, 0.6529),
    "14": (0.6893, 0.3991, 0.6047),
    "15": (0.4478, 0.4925, 0.7463),
    "17": (-0.5151, 0.4722, 0.7154),
    "18": (-0.7076, 0.3892, 0.5897),
}


def recover_flash_directions(
    asset_dir: str = "/root/reference/lighting_visualizations",
) -> dict:
    """All 18 Multi-PIE flash directions, in the script-comment convention.

    The bundled sphere renderings encode the directions in the asset
    generator's own coordinate convention, which differs from the script
    comments by a fixed linear distortion (a ~1.36x vertical stretch plus a
    small y/z shear — measured, not assumed). This function fits each PNG
    (fit_sphere_image), solves the 3x3 map from the 8 script-named flashes
    by least squares, and applies it to all 18. On the anchors the mapped
    directions agree with the script values to <= ~0.013 per component
    (tests/test_lighting_presets.py); the 10 unnamed flashes land on the
    expected Multi-PIE geometry (01-13 a horizontal arc, 14-18 elevated).

    Returns {"01": (lx, ly, lz), ...} with unit-normalized tuples.
    """
    import imageio.v2 as imageio

    fitted = {}
    for idx in [f"{i:02d}" for i in range(1, 19)]:
        path = os.path.join(asset_dir, f"Multi-PIE_lighting_{idx}.png")
        fitted[idx] = np.asarray(
            fit_sphere_image(imageio.imread(path))["direction"], np.float64
        )
        fitted[idx] /= np.linalg.norm(fitted[idx])

    anchors_fit = np.array([fitted[k] for k in SCRIPT_DIRECTIONS])
    anchors_script = np.array(
        [SCRIPT_DIRECTIONS[k] for k in SCRIPT_DIRECTIONS], np.float64
    )
    anchors_script /= np.linalg.norm(anchors_script, axis=1, keepdims=True)
    # M @ fitted ~= script: 24 equations, 9 unknowns.
    M = np.linalg.lstsq(anchors_fit, anchors_script, rcond=None)[0].T

    out = {}
    for idx, f in fitted.items():
        d = M @ f
        out[idx] = tuple(float(x) for x in d / np.linalg.norm(d))
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--dir", default="/root/reference/lighting_visualizations"
    )
    args = ap.parse_args()
    import imageio.v2 as imageio

    for path in sorted(glob.glob(os.path.join(args.dir, "*.png"))):
        fit = fit_sphere_image(imageio.imread(path))
        fit["name"] = os.path.splitext(os.path.basename(path))[0]
        print(json.dumps(fit))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
