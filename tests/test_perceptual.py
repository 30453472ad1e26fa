"""Perceptual-metric extras and LPIPS architecture tests."""

import numpy as np
import pytest

from geomconsistentfr_tpu.metrics.perceptual import (
    dssim_distance,
    l2_distance,
    score_2afc,
    score_jnd,
    write_html_gallery,
)


def test_l2_and_dssim_distances():
    rng = np.random.default_rng(0)
    x = rng.uniform(size=(16, 16, 3))
    assert l2_distance(x, x) == 0.0
    assert dssim_distance(x, x) < 1e-9
    y = np.clip(x + 0.2 * rng.normal(size=x.shape), 0, 1)
    assert l2_distance(x, y) > 0
    assert dssim_distance(x, y) > 0


def test_score_2afc():
    rng = np.random.default_rng(1)
    ref = [rng.uniform(size=(8, 8, 3)) for _ in range(4)]
    p0 = [np.clip(r + 0.01 * rng.normal(size=r.shape), 0, 1) for r in ref]  # close
    p1 = [rng.uniform(size=(8, 8, 3)) for _ in ref]                          # far
    # all judges prefer p0 (judge=0 -> humans chose p0)
    score = score_2afc(ref, p0, p1, [0.0] * 4, l2_distance)
    assert score == 1.0
    # inverted judgements score 0
    assert score_2afc(ref, p0, p1, [1.0] * 4, l2_distance) == 0.0


def test_score_jnd_perfect_separation():
    rng = np.random.default_rng(2)
    base = [rng.uniform(size=(8, 8, 3)) for _ in range(6)]
    pairs0 = base
    pairs1 = [
        b if i < 3 else np.clip(b + 0.5 * rng.normal(size=b.shape), 0, 1)
        for i, b in enumerate(base)
    ]
    same = [1.0, 1.0, 1.0, 0.0, 0.0, 0.0]
    ap = score_jnd(pairs0, pairs1, same, l2_distance)
    assert ap == pytest.approx(1.0)


def test_html_gallery(tmp_path):
    import imageio.v2 as imageio

    img = (np.random.default_rng(3).uniform(size=(8, 8, 3)) * 255).astype(np.uint8)
    p = tmp_path / "img.png"
    imageio.imwrite(p, img)
    out = tmp_path / "index.html"
    write_html_gallery(str(out), [{"id": "a", "img": str(p)}], title="t")
    html = out.read_text()
    assert "<img" in html and "img.png" in html


def test_lpips_architecture_shapes():
    """Random-trunk smoke: spatial map shape and non-negativity structure."""
    from geomconsistentfr_tpu.models.lpips import LPIPSMetric

    metric = LPIPSMetric(
        lin_weights_path="/root/reference/PerceptualSimilarity/lpips/weights/v0.1/alex.pth",
        allow_random_trunk=True,
    )
    rng = np.random.default_rng(4)
    a = rng.uniform(size=(64, 64, 3)).astype(np.float32)
    b = rng.uniform(size=(64, 64, 3)).astype(np.float32)
    d = metric(a, b)
    assert d.shape == (64, 64)
    assert np.isfinite(d).all()
    d0 = metric(a, a)
    assert abs(d0).max() < 1e-5  # identical inputs -> zero distance


def test_lpips_requires_trunk_by_default():
    from geomconsistentfr_tpu.models.lpips import LPIPSMetric

    with pytest.raises(RuntimeError, match="trunk"):
        LPIPSMetric()


def test_crop_geometry():
    from geomconsistentfr_tpu.preprocess import crop_face

    img = np.zeros((600, 600, 3), np.uint8)
    img[300, 300] = 255  # marker at the box centre
    # 250x280 box centred at (300, 300+...)
    out = crop_face(img, (175.0, 160.0, 425.0, 440.0))
    assert out is not None and out.shape == (256, 256, 3)
    # Too-small faces are skipped (reference :38-39).
    assert crop_face(img, (0, 0, 100, 150)) is None
