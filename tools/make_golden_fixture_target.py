"""Generate target-lighting-path parity fixtures (tests/golden/ref_target_*.npz).

The reference's target-lighting checkpoint is a missing blob upstream, but the
transfer checkpoint embeds exactly into the target architecture (1x1 shortcut
= centre tap of a 3x3; convert.transfer_to_target_variant). This script:
  1. converts model_epoch106.pth -> Flax -> target-variant -> torch state dict,
  2. loads it into the reference test_relight_single_image.RelightNet
     (3x3-shortcut architecture, ambient est-0.1, 160 samples, f=1570,
     inside-image +5.0 gate),
  3. records the reference CPU forward on a bundled FFHQ sample under the
     lighting preset the reference recorded for that sample
     (/root/reference/test_relight_single_image.py:519-562).
The parity suite then checks this framework's single_image preset end to end.

Usage: python tools/make_golden_fixture_target.py [--image 00295.png]
           [--light lx,ly,lz] [--out-name ref_target_00295.npz]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TARGET_LIGHT = np.array([[0.0, 0.7071, 0.7071]], np.float32)  # A00E45
IMAGE = "00295.png"


def main(image=IMAGE, light=None, out_name=None) -> None:
    import cv2
    import imageio.v2 as imageio
    import torch

    from geomconsistentfr_tpu.convert import (
        load_relightnet_variables,
        transfer_to_target_variant,
        variables_to_torch_state,
    )
    from tests.oracles.reference_loader import intrinsics, load_reference_module

    light = (
        TARGET_LIGHT
        if light is None
        else np.asarray(light, np.float32).reshape(1, 3)
    )
    out_name = out_name or f"ref_target_{image.split('.')[0]}.npz"

    variables = transfer_to_target_variant(
        load_relightnet_variables(
            "/root/reference/model_lighting_transfer/model_epoch106.pth"
        )
    )
    state_np = variables_to_torch_state(variables)
    state = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in state_np.items()}

    mod = load_reference_module("test_relight_single_image")
    model = mod.RelightNet()
    model.load_state_dict(state)
    model = model.float().eval()

    img = cv2.resize(
        imageio.imread(f"/root/reference/sample_test_images_FFHQ/{image}") / 255.0,
        (256, 256),
    ).astype(np.float32)
    mask = (
        imageio.imread(f"/root/reference/FFHQ_skin_masks/{image}").astype(np.float32)
        / 255.0
    )

    with torch.no_grad():
        out = model(
            torch.from_numpy(img[None]),
            200,
            intrinsics(1570.0),
            torch.from_numpy(mask[..., None]),
            torch.from_numpy(light.reshape(1, 3, 1, 1)),
            torch.from_numpy(np.zeros((1, 1, 1), np.float32)),  # dead arg
            torch.from_numpy(mask[None, ..., None]),            # dead arg
        )
    (albedo, depth, sw, amb, full, rend, unit, ambv, final, norm) = [
        o.detach().numpy().astype(np.float32) for o in out
    ]

    dest = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
    os.makedirs(dest, exist_ok=True)
    np.savez_compressed(
        os.path.join(dest, out_name),
        image=img,
        mask=mask,
        target_light=light,
        albedo=albedo,
        depth=depth,
        shadow_weights=sw,
        rendered=rend,
        final_shading=final,
    )
    print(f"wrote tests/golden/{out_name}")


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--image", default=IMAGE)
    ap.add_argument("--light", default=None, help="lx,ly,lz")
    ap.add_argument("--out-name", default=None)
    a = ap.parse_args()
    light = [float(v) for v in a.light.split(",")] if a.light else None
    main(a.image, light, a.out_name)
