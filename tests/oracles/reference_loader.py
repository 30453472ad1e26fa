"""Import the (read-only, GPU-only) reference scripts as CPU parity oracles.

The reference scripts hard-code `.cuda()` everywhere, import kornia (not
installed) and use `np.asscalar` (removed in numpy>=1.23). This loader
monkeypatches those so the reference model can run on torch-CPU and serve as
the numerical oracle for parity tests. Nothing here ships in the framework.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import torch

REFERENCE_ROOT = "/root/reference"

_PATCHED = False


def _install_stubs() -> None:
    global _PATCHED
    if _PATCHED:
        return

    # kornia.geometry.depth.depth_to_normals -> local stand-in.
    from tests.oracles import kornia_oracle

    kornia = types.ModuleType("kornia")
    geometry = types.ModuleType("kornia.geometry")
    depth_mod = types.ModuleType("kornia.geometry.depth")
    depth_mod.depth_to_normals = kornia_oracle.depth_to_normals
    geometry.depth = depth_mod
    kornia.geometry = geometry
    sys.modules.setdefault("kornia", kornia)
    sys.modules.setdefault("kornia.geometry", geometry)
    sys.modules.setdefault("kornia.geometry.depth", depth_mod)

    # pytorch_msssim is only imported by the train scripts; provide the names.
    if "pytorch_msssim" not in sys.modules:
        msssim = types.ModuleType("pytorch_msssim")
        msssim.ssim = None
        msssim.ms_ssim = None
        msssim.SSIM = None
        msssim.MS_SSIM = None
        sys.modules["pytorch_msssim"] = msssim

    # numpy>=1.23 removed asscalar.
    if not hasattr(np, "asscalar"):
        np.asscalar = lambda a: a.item()

    # Route .cuda() to CPU.
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self

    _PATCHED = True


def load_reference_module(script_name: str):
    """Import e.g. 'test_relight_single_image_lighting_transfer' from the reference."""
    _install_stubs()
    path = os.path.join(REFERENCE_ROOT, script_name + ".py")
    spec = importlib.util.spec_from_file_location("ref_" + script_name, path)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


def load_transfer_model():
    """Reference lighting-transfer RelightNet with the bundled checkpoint, on CPU."""
    mod = load_reference_module("test_relight_single_image_lighting_transfer")
    model = mod.RelightNet()
    state = torch.load(
        os.path.join(REFERENCE_ROOT, "model_lighting_transfer/model_epoch106.pth"),
        map_location="cpu",
    )
    model.load_state_dict(state)
    model = model.float().eval()
    return mod, model


def intrinsics(focal: float, size: int = 256) -> torch.Tensor:
    K = np.zeros((1, 3, 3))
    K[:, 0, 0] = focal
    K[:, 1, 1] = focal
    K[:, 2, 2] = 1.0
    K[:, 0, 2] = size / 2.0
    K[:, 1, 2] = size / 2.0
    return torch.from_numpy(K)
