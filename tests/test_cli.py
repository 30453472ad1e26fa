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
