"""CLI wiring and lightweight command tests (no model forward)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest


def _run(args, cwd="/root/repo"):
    return subprocess.run(
        [sys.executable, "-m", "geomconsistentfr_tpu.cli", *args],
        capture_output=True,
        text=True,
        cwd=cwd,
        env={**os.environ, "JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": ""},
    )


def test_help_lists_all_commands():
    r = _run(["--help"])
    assert r.returncode == 0
    for cmd in [
        "relight", "sweep", "transfer", "eval-multipie", "train",
        "convert", "fix-border", "build-cache", "bench",
    ]:
        assert cmd in r.stdout


def test_relight_requires_checkpoint():
    r = _run(["relight", "--image", "x.png", "--mask", "m.png"])
    assert r.returncode != 0
    assert "--checkpoint" in r.stderr


def test_fix_border_roundtrip(tmp_path):
    import imageio.v2 as imageio

    rng = np.random.default_rng(0)
    img = (rng.uniform(size=(64, 64, 3)) * 255).astype(np.uint8)
    mask = np.zeros((64, 64), np.uint8)
    mask[16:48, 16:48] = 255
    img_p = tmp_path / "img.png"
    mask_p = tmp_path / "mask.png"
    out_p = tmp_path / "fixed.png"
    imageio.imwrite(img_p, img)
    imageio.imwrite(mask_p, mask)

    r = _run([
        "fix-border", "--image", str(img_p), "--mask", str(mask_p),
        "--out-image", str(out_p),
    ])
    assert r.returncode == 0, r.stderr
    payload = json.loads(r.stdout.strip().splitlines()[-1])
    assert payload["out"] == str(out_p)
    fixed = imageio.imread(out_p)
    assert fixed.shape == (64, 64, 3)
    # Interior pixels (mask fully inside) untouched.
    np.testing.assert_array_equal(fixed[30:34, 30:34], img[30:34, 30:34])
    # Some border-band pixels replaced.
    assert (fixed != img).any()


def test_visualize_lighting_matches_reference_spheres(tmp_path):
    """The generated spheres reproduce the reference's bundled
    lighting_visualizations/*.png assets (both hemispheres, unclamped fit)."""
    import imageio.v2 as imageio

    r = _run(["visualize-lighting", "--out", str(tmp_path)])
    assert r.returncode == 0, r.stderr
    info = json.loads(r.stdout.strip().splitlines()[-1])
    assert info["count"] == 21  # 18 Multi-PIE flashes + 3 azimuth/elevation

    pairs = {
        "multipie_14": "Multi-PIE_lighting_14.png",
        "multipie_04": "Multi-PIE_lighting_04.png",
        "A00E45": "A00E45.png",
        "A-60E-20": "A-60E-20.png",
    }
    ref_dir = "/root/reference/lighting_visualizations"
    if not os.path.isdir(ref_dir):
        pytest.skip("reference assets unavailable")
    for ours, theirs in pairs.items():
        mine = imageio.imread(tmp_path / f"{ours}.png").astype(np.float32) / 255.0
        ref = imageio.imread(os.path.join(ref_dir, theirs)).astype(np.float32)
        ref = (ref.mean(-1) if ref.ndim == 3 else ref) / 255.0
        assert mine.shape == ref.shape
        diff = np.abs(mine - ref)
        # Interior (skip the antialiased rim, generator unknown there).
        c = (mine.shape[0] - 1) / 2.0
        ys, xs = np.mgrid[0 : mine.shape[0], 0 : mine.shape[1]]
        rr = np.hypot(ys - c, xs - c) / (mine.shape[0] / 2.0 - 1.0)
        interior = rr < 0.95
        # Per-asset shading coefficients drift a few percent (the bundled
        # assets were individually tuned); 4%/15% bounds the family.
        assert diff[interior].mean() < 0.04, (ours, diff[interior].mean())
        assert diff[interior].max() < 0.15, (ours, diff[interior].max())


def test_visualize_lighting_explicit_direction(tmp_path):
    r = _run([
        "visualize-lighting", "--out", str(tmp_path),
        "--light", "0.7,0,0.7", "--size", "64",
    ])
    assert r.returncode == 0, r.stderr
    import imageio.v2 as imageio

    img = imageio.imread(tmp_path / "custom.png").astype(np.float32)
    assert img.shape == (64, 64)
    # Brightest region on the +x (right) side, background black.
    assert img[:, 40:].max() > img[:, :24].max()
    assert img[0, 0] == 0


def test_config_dump_roundtrips(tmp_path):
    """`cli config` prints resolved JSON that load_config accepts back."""
    r = _run(["config", "--preset", "multipie_eval"])
    assert r.returncode == 0, r.stderr
    cfg = json.loads(r.stdout)
    assert cfg["render"]["num_sample_points"] == 160
    assert cfg["render"]["focal_length"] == 1570.0
    # Round-trip: feed the dump back as overrides.
    path = tmp_path / "cfg.json"
    path.write_text(json.dumps(
        {"render": {"num_sample_points": 80, "t_step": 0.01}}))
    r2 = _run(["config", "--preset", "multipie_eval", "--config", str(path)])
    cfg2 = json.loads(r2.stdout)
    assert cfg2["render"]["num_sample_points"] == 80
    assert cfg2["render"]["t_step"] == 0.01


def test_crop_from_mask(tmp_path):
    """`crop --mask` derives the face box from a skin mask (detector-free)."""
    import imageio.v2 as imageio

    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (400, 400, 3)).astype(np.uint8)
    mask = np.zeros((400, 400), np.uint8)
    mask[80:330, 90:340] = 255  # 250x250 face region (>= 200px minimum)
    ip, mp = tmp_path / "img.png", tmp_path / "mask.png"
    imageio.imwrite(ip, img)
    imageio.imwrite(mp, mask)
    out = tmp_path / "crop.png"
    r = _run(["crop", "--image", str(ip), "--mask", str(mp),
              "--out-image", str(out)])
    assert r.returncode == 0, r.stderr
    crop = imageio.imread(out)
    assert crop.shape == (256, 256, 3)

    # Empty mask -> clean error.
    imageio.imwrite(mp, np.zeros((400, 400), np.uint8))
    r = _run(["crop", "--image", str(ip), "--mask", str(mp),
              "--out-image", str(out)])
    assert r.returncode != 0


def test_sample_parallel_flag_wiring():
    """--sample-parallel is a common model flag (relight/sweep/transfer/
    eval-multipie) and conflicts with --data-parallel where both exist."""
    for cmd in ("relight", "sweep", "transfer", "eval-multipie"):
        r = _run([cmd, "--help"])
        assert r.returncode == 0
        assert "--sample-parallel" in r.stdout, cmd
    r = _run([
        "eval-multipie", "--checkpoint", "x", "--data-root", "y",
        "--data-parallel", "--sample-parallel",
    ])
    assert r.returncode != 0
    assert "conflicts" in (r.stderr + r.stdout)
