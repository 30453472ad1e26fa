"""Named target-lighting presets.

The reference hard-codes these direction vectors as commented-out blocks in
test_relight_single_image.py:519-562 (Multi-PIE flash directions plus
azimuth/elevation presets). Ambient defaults to 0.5 (:517).
"""

from __future__ import annotations

import numpy as np

# name -> (lx, ly, lz) unit-ish direction, +x right, +y up, +z toward camera.
LIGHT_PRESETS: dict[str, tuple[float, float, float]] = {
    "multipie_04": (0.7518, 0.0, 0.6594),
    "multipie_05": (0.5145, 0.0, 0.8575),
    "multipie_09": (-0.5843, 0.0, 0.8115),
    "multipie_10": (-0.7574, 0.0, 0.6529),
    "multipie_14": (0.6893, 0.3991, 0.6047),
    "multipie_15": (0.4478, 0.4925, 0.7463),
    "multipie_17": (-0.5151, 0.4722, 0.7154),
    "multipie_18": (-0.7076, 0.3892, 0.5897),
    "A00E45": (0.0, 0.7071, 0.7071),      # top
    "A60E-20": (-0.8138, -0.3420, 0.4698),  # bottom left
    "A-60E-20": (0.8138, -0.3420, 0.4698),  # bottom right
}

DEFAULT_AMBIENT = 0.5

# The golden FFHQ outputs bundled with the reference were generated with these
# presets (comments at test_relight_single_image.py:519-562).
GOLDEN_FFHQ_PRESETS: dict[str, str] = {
    "00104": "multipie_14",
    "00110": "multipie_04",
    "00290": "multipie_09",
    "00295": "A00E45",
    "00300": "multipie_04",
    "00322": "multipie_10",
    "00508": "A-60E-20",
    "00525": "multipie_04",
    "00572": "multipie_10",
    "00695": "multipie_17",
}


def lighting_sphere(
    direction,
    size: int = 256,
    ambient: float = 0.458,
    directional: float = 0.572,
    clamp: bool = False,
    light_distance: float = 4013.0,
) -> np.ndarray:
    """Render a Lambertian sphere lit from ``direction`` (an (lx, ly, lz)).

    Counterpart of the reference's bundled ``lighting_visualizations/*.png``
    (one shaded sphere per Multi-PIE flash / azimuth-elevation preset; the
    generator script itself is not in the reference repo). The bundled assets
    fit ``ambient + directional * (n . l)`` WITHOUT the clamp (least-squares
    over Multi-PIE_lighting_14.png: a=0.458, d=0.572 on both hemispheres,
    rms 0.019) — the defaults reproduce that. ``clamp=True, ambient=0.5,
    directional=0.5`` instead gives the framework's face-shading model
    (point light at ``light_distance * direction``,
    ``ambient + directional * max(0, n . l)``,
    test_relight_single_image.py:334-346).

    Returns (size, size) float32 in [0, 1]; background is 0.
    """
    d = np.asarray(direction, np.float64)
    d = d / max(np.linalg.norm(d), 1e-12)
    radius = size / 2.0 - 1.0
    c = (size - 1) / 2.0
    ys, xs = np.mgrid[0:size, 0:size]
    nx = (xs - c) / radius
    ny = -(ys - c) / radius  # +y is up; image rows grow downward
    rr2 = nx * nx + ny * ny
    nz = np.sqrt(np.maximum(1.0 - rr2, 0.0))
    # Point light at light_distance * d; per-pixel incident direction from the
    # sphere surface point (radius-scaled normal) toward it.
    p = np.stack([nx, ny, nz], -1) * radius
    incident = light_distance * d - p
    incident /= np.maximum(np.linalg.norm(incident, axis=-1, keepdims=True), 1e-12)
    ndotl = (
        nx * incident[..., 0] + ny * incident[..., 1] + nz * incident[..., 2]
    )
    if clamp:
        ndotl = np.maximum(ndotl, 0.0)
    shading = ambient + directional * ndotl
    coverage = np.clip(radius + 0.5 - np.sqrt(rr2) * radius, 0.0, 1.0)
    return (np.clip(shading, 0.0, 1.0) * coverage).astype(np.float32)


def azimuth_elevation(azimuth_deg: float, elevation_deg: float) -> tuple[float, float, float]:
    """Unit light direction from azimuth (around +y, 0 = frontal) and elevation."""
    az = np.deg2rad(azimuth_deg)
    el = np.deg2rad(elevation_deg)
    return (
        float(-np.sin(az) * np.cos(el)),
        float(np.sin(el)),
        float(np.cos(az) * np.cos(el)),
    )
