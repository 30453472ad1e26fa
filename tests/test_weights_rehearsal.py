"""The real-weight drop-in rehearsal (tools/fetch_or_convert_weights.py).

Real LPIPS trunk / S3FD binaries are absent from this machine (the reference
pulls them from the torchvision zoo / face_alignment release,
pretrained_networks.py:1-180 / recrop_CelebA-HQ_images.py:29). These tests
keep the whole drop-in path executable NOW:

  * fabricated checkpoints with the real key layout drive conversion, the
    delta protocol and the full FFHQ crop drive end to end;
  * the real-weight assertions run only when the binaries exist on disk
    (skip-if-absent), so the day they appear nothing new needs writing.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.fetch_or_convert_weights import (  # noqa: E402
    DEFAULT_SEARCH_DIRS,
    find_weights,
    rehearse_s3fd,
)


def _fabricated_alex_trunk(path):
    """Random tensors under the exact torchvision AlexNet `features.*` keys."""
    rng = np.random.default_rng(0)
    shapes = {
        "features.0": (64, 3, 11, 11),
        "features.3": (192, 64, 5, 5),
        "features.6": (384, 192, 3, 3),
        "features.8": (256, 384, 3, 3),
        "features.10": (256, 256, 3, 3),
    }
    state = {}
    for k, s in shapes.items():
        state[f"{k}.weight"] = (rng.normal(0, 0.05, s)).astype(np.float32)
        state[f"{k}.bias"] = np.zeros(s[0], np.float32)
    np.savez(path, **state)


def test_fabricated_lpips_trunk_runs_delta_protocol(tmp_path):
    """A real-layout .npz trunk converts and clears the delta protocol —
    the identical code path real torchvision weights will take."""
    trunk = os.path.join(tmp_path, "alexnet-owt-fabricated.npz")
    _fabricated_alex_trunk(trunk)
    out = os.path.join(tmp_path, "delta.json")

    from tools.lpips_delta import run

    report = run(images=2, net="alex", out=out, trunk=trunk)
    assert report["north_star_1e-3"], report["worst_abs_delta"]
    assert "REAL" in report["_meta"]["trunk"]
    assert os.path.exists(out)


def test_fabricated_s3fd_runs_crop_drive(tmp_path):
    """A real-layout s3fd.pth converts and the 10-image FFHQ crop drive runs
    (fabricated weights rarely detect; the report shape is the contract)."""
    torch = pytest.importorskip("torch")

    from tests.oracles.s3fd_torch import S3FDTorch

    net = S3FDTorch()
    path = os.path.join(tmp_path, "s3fd-fabricated.pth")
    torch.save(net.state_dict(), path)

    result = rehearse_s3fd(path, require_detection=False, limit=2)
    assert result["images"] == 2
    assert len(result["per_image"]) == 2
    for row in result["per_image"]:
        assert set(row) >= {"image", "detections"}


def test_tool_exits_zero_without_weights(tmp_path):
    """Unconditional-run contract: no weights anywhere -> report + exit 0."""
    out = os.path.join(tmp_path, "rehearsal.json")
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "tools", "fetch_or_convert_weights.py"),
            "--search-dir", str(tmp_path), "--out", out,
        ],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr
    report = json.load(open(out))
    assert "skipped" in report["lpips"] and "skipped" in report["s3fd"]


@pytest.mark.skipif(
    find_weights("alex", DEFAULT_SEARCH_DIRS) is None,
    reason="real torchvision AlexNet weights not on this machine",
)
def test_real_lpips_trunk_north_star(tmp_path):
    """With real torchvision weights on disk, the committed delta IS the
    BASELINE LPIPS north star."""
    from tools.lpips_delta import run

    trunk = find_weights("alex", DEFAULT_SEARCH_DIRS)
    report = run(images=8, net="alex",
                 out=os.path.join(tmp_path, "delta.json"), trunk=trunk)
    assert report["north_star_1e-3"], report["worst_abs_delta"]


@pytest.mark.skipif(
    find_weights("s3fd", DEFAULT_SEARCH_DIRS) is None,
    reason="published s3fd.pth not on this machine",
)
def test_real_s3fd_crop_geometry():
    """With the published s3fd.pth on disk, every bundled FFHQ sample must
    detect and the detector-box crop must agree with the mask-box crop."""
    result = rehearse_s3fd(
        find_weights("s3fd", DEFAULT_SEARCH_DIRS), require_detection=True
    )
    assert result["crop_geometry_ok"]
