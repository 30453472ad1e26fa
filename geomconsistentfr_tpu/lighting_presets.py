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


def azimuth_elevation(azimuth_deg: float, elevation_deg: float) -> tuple[float, float, float]:
    """Unit light direction from azimuth (around +y, 0 = frontal) and elevation."""
    az = np.deg2rad(azimuth_deg)
    el = np.deg2rad(elevation_deg)
    return (
        float(-np.sin(az) * np.cos(el)),
        float(np.sin(el)),
        float(np.cos(az) * np.cos(el)),
    )
