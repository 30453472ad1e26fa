"""Recovery test for the 18 Multi-PIE flash presets.

The reference names only 8 flash directions in script comments
(test_relight_single_image.py:519-562) but bundles sphere renderings for all
18 (lighting_visualizations/Multi-PIE_lighting_{01..18}.png). The committed
LIGHT_PRESETS recover the other 10 by inverting the sphere shading model and
mapping into the script convention (tools/fit_lighting_presets.py). This test
re-runs the whole recovery from the PNGs and checks both the anchors and the
committed values.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from geomconsistentfr_tpu.lighting_presets import (  # noqa: E402
    LIGHT_PRESETS,
    MULTIPIE_FLASH_ORDER,
)

ASSET_DIR = "/root/reference/lighting_visualizations"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(ASSET_DIR), reason="reference sphere assets unavailable"
)


@pytest.fixture(scope="module")
def recovered():
    from fit_lighting_presets import recover_flash_directions

    return recover_flash_directions(ASSET_DIR)


def test_all_18_flash_presets_exist_and_unit_norm():
    assert len(MULTIPIE_FLASH_ORDER) == 18
    for name in MULTIPIE_FLASH_ORDER:
        d = np.asarray(LIGHT_PRESETS[name])
        assert abs(np.linalg.norm(d) - 1.0) < 2e-3, name


def test_script_anchors_recovered(recovered):
    """The 8 script-named directions round-trip through the PNG fit + map."""
    from fit_lighting_presets import SCRIPT_DIRECTIONS

    for idx, script in SCRIPT_DIRECTIONS.items():
        script = np.asarray(script) / np.linalg.norm(script)
        got = np.asarray(recovered[idx])
        assert np.abs(got - script).max() <= 0.013, (idx, got, script)


def test_committed_presets_match_fresh_recovery(recovered):
    """The 10 recovered LIGHT_PRESETS entries match a fresh PNG inversion."""
    from fit_lighting_presets import SCRIPT_DIRECTIONS

    for idx, got in recovered.items():
        name = f"multipie_{idx}"
        committed = np.asarray(LIGHT_PRESETS[name])
        if idx in SCRIPT_DIRECTIONS:
            continue  # anchors keep the exact script values
        assert np.abs(np.asarray(got) - committed).max() < 2e-3, name


def test_recovered_flash_geometry(recovered):
    """Sanity: 01-13 lie on the horizontal arc, 14-18 on the elevated arc."""
    for i in range(1, 14):
        if i == 7:
            continue  # frontal camera-mounted flash sits slightly low
        assert abs(recovered[f"{i:02d}"][1]) < 0.08, i
    for i in range(14, 19):
        assert 0.3 < recovered[f"{i:02d}"][1] < 0.6, i
    # x decreases monotonically around the arc (right to left).
    xs = [recovered[f"{i:02d}"][0] for i in range(1, 14)]
    assert all(a > b for a, b in zip(xs, xs[1:]))
