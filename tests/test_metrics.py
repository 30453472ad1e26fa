"""Metrics and postprocess tests vs independent oracles."""

import numpy as np

from geomconsistentfr_tpu.metrics.image_metrics import (
    masked_dssim_matlab,
    masked_mse,
    matlab_ssim_map,
    psnr,
)
from geomconsistentfr_tpu.postprocess import fix_border_artifacts


def test_masked_mse_protocol():
    rng = np.random.default_rng(0)
    pred = rng.uniform(size=(16, 16, 3))
    gt = rng.uniform(size=(16, 16, 3))
    mask = (rng.uniform(size=(16, 16)) > 0.4).astype(np.float64)
    got = masked_mse(pred, gt, mask)
    want = np.sum(
        np.abs(pred * mask[..., None] - gt * mask[..., None]) ** 2
    ) / (3 * mask.sum())
    assert abs(got - want) < 1e-12


def test_matlab_ssim_identity():
    rng = np.random.default_rng(1)
    x = rng.uniform(size=(32, 32, 3))
    np.testing.assert_allclose(matlab_ssim_map(x, x), 1.0, atol=1e-9)
    assert abs(masked_dssim_matlab(x, x, np.ones((32, 32)))) < 1e-9


def test_matlab_ssim_degrades_with_noise():
    rng = np.random.default_rng(2)
    x = rng.uniform(size=(32, 32, 3))
    y1 = np.clip(x + 0.01 * rng.normal(size=x.shape), 0, 1)
    y2 = np.clip(x + 0.2 * rng.normal(size=x.shape), 0, 1)
    m = np.ones((32, 32))
    d1 = masked_dssim_matlab(x, y1, m)
    d2 = masked_dssim_matlab(x, y2, m)
    assert 0 < d1 < d2 < 0.5


def test_psnr():
    x = np.zeros((8, 8, 3))
    y = np.full((8, 8, 3), 0.1)
    assert abs(psnr(x, y) - 20.0) < 1e-6


def test_fix_border_artifacts_median_semantics():
    from scipy import ndimage

    rng = np.random.default_rng(3)
    img = (rng.uniform(size=(32, 32, 3)) * 255).astype(np.uint8)
    mask = np.zeros((32, 32))
    mask[8:24, 8:24] = 1.0

    out = fix_border_artifacts(img, mask)

    # Replaced pixels equal the 3x3 zero-padded median (MATLAB medfilt2).
    med = np.stack(
        [
            ndimage.median_filter(
                img[..., c].astype(np.float64), size=3, mode="constant", cval=0
            )
            for c in range(3)
        ],
        axis=-1,
    )
    conv = ndimage.correlate(
        mask, np.ones((7, 7)), mode="constant", cval=0.0
    )
    border = (conv > 0) & (conv < 30)
    assert border.any()
    np.testing.assert_array_equal(out[border], med.astype(np.uint8)[border])
    np.testing.assert_array_equal(out[~border], img[~border])


def test_fix_border_fractional_mask_matches_matlab_rounding():
    """Anti-aliased masks must be binarized (MATLAB uint8 division rounds).

    fix_border_artifacts_CVPR2022.m:5 computes imread(mask)/255.0 on a uint8
    array: MATLAB integer division rounds to nearest, so fractional
    (anti-aliased) mask values become exact {0,1} BEFORE the 7x7 box sum.
    Summing the raw fractional mask instead selects a different border set.
    """
    from scipy import ndimage

    rng = np.random.default_rng(7)
    img = (rng.uniform(size=(32, 32, 3)) * 255).astype(np.uint8)
    # Anti-aliased ramp edge: values in (0, 1) along the mask boundary.
    mask = np.zeros((32, 32))
    mask[8:24, 8:24] = 1.0
    mask[7, 8:24] = 0.6   # rounds to 1 in MATLAB
    mask[24, 8:24] = 0.4  # rounds to 0 in MATLAB
    mask[6, 8:24] = 0.49  # rounds to 0
    mask[25, 8:24] = 0.5  # MATLAB round-half-away-from-zero -> 1

    out = fix_border_artifacts(img, mask)

    rounded = (mask >= 0.5).astype(np.float64)
    conv = ndimage.correlate(rounded, np.ones((7, 7)), mode="constant", cval=0.0)
    border = (conv > 0) & (conv < 30)
    # The fractional and rounded box sums must genuinely disagree somewhere,
    # otherwise this test wouldn't pin the semantics.
    conv_frac = ndimage.correlate(mask, np.ones((7, 7)), mode="constant", cval=0.0)
    border_frac = (conv_frac > 0) & (conv_frac < 30)
    assert (border != border_frac).any()

    med = np.stack(
        [
            ndimage.median_filter(
                img[..., c].astype(np.float64), size=3, mode="constant", cval=0
            )
            for c in range(3)
        ],
        axis=-1,
    )
    np.testing.assert_array_equal(out[border], med.astype(np.uint8)[border])
    np.testing.assert_array_equal(out[~border], img[~border])


def test_fix_border_no_mask_is_identity():
    rng = np.random.default_rng(4)
    img = (rng.uniform(size=(16, 16, 3)) * 255).astype(np.uint8)
    np.testing.assert_array_equal(
        fix_border_artifacts(img, np.zeros((16, 16))), img
    )


def test_golden_drift_report_structure():
    """The committed drift report tracks all 10 bundled FFHQ goldens.

    Regenerate with tools/golden_drift_report.py; it is a tracked distance
    (the goldens' generating checkpoint is a missing blob upstream), so the
    test validates structure and sane ranges, not exact values.
    """
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "docs", "golden_drift.json")
    with open(path) as f:
        report = json.load(f)
    from geomconsistentfr_tpu.lighting_presets import GOLDEN_FFHQ_PRESETS

    stems = set(report) - {"_meta"}
    assert stems == set(GOLDEN_FFHQ_PRESETS)
    for stem in stems:
        entry = report[stem]
        assert entry["preset"] == GOLDEN_FFHQ_PRESETS[stem]
        assert 20.0 < entry["psnr_db"] < 60.0, (stem, entry)
        assert 0.0 <= entry["masked_dssim"] < 0.1, (stem, entry)


def test_empty_mask_fails_loudly():
    """An all-zero mask must raise, not NaN the 862-image aggregate
    (VERDICT weak #5: silent 0/0 at image_metrics masked means)."""
    import numpy as np
    import pytest

    from geomconsistentfr_tpu.metrics import masked_dssim_matlab, masked_mse

    pred = np.random.default_rng(0).random((32, 32, 3))
    gt = np.random.default_rng(1).random((32, 32, 3))
    empty = np.zeros((32, 32))
    with pytest.raises(ValueError, match="empty"):
        masked_mse(pred, gt, empty)
    with pytest.raises(ValueError, match="empty"):
        masked_dssim_matlab(pred, gt, empty)


def test_eval_protocol_names_offending_empty_mask(tmp_path):
    """run_eval names the bad mask file in its error."""
    import imageio.v2 as imageio
    import numpy as np
    import pytest

    from geomconsistentfr_tpu.metrics.eval_multipie import evaluate_output_dir

    out_dir = tmp_path / "out"
    gt_dir = tmp_path / "gt"
    mask_dir = tmp_path / "masks"
    for d in (out_dir, gt_dir, mask_dir):
        d.mkdir()
    img = np.zeros((16, 16, 3), np.uint8)
    imageio.imwrite(out_dir / "00001_rendered_image.png", img)
    imageio.imwrite(gt_dir / "00001_gt.png", img)
    imageio.imwrite(mask_dir / "00001_mask.png", np.zeros((16, 16), np.uint8))
    with pytest.raises(ValueError, match="00001_mask.png"):
        evaluate_output_dir(str(out_dir), str(gt_dir), str(mask_dir))
