"""Generate the committed parity fixture tests/golden/ref_transfer_00104.npz.

Runs the reference lighting-transfer RelightNet (CPU-patched, real bundled
checkpoint model_epoch106.pth) on a bundled FFHQ sample with a fixed target
light, and records inputs + every forward output. The parity test then checks
the JAX framework against these tensors without needing the (slow) torch
forward at test time.

Usage: python tools/make_golden_fixture.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TARGET_LIGHT = np.array([[0.3, 0.4, 0.8660254]], np.float32)
TARGET_AMBIENT = np.array([0.45], np.float32)
IMAGE = "00104.png"


def main(image=IMAGE, light=None, ambient=None, out_name=None) -> None:
    import cv2
    import imageio.v2 as imageio
    import torch

    from tests.oracles.reference_loader import load_transfer_model, intrinsics

    light = TARGET_LIGHT if light is None else np.asarray(light, np.float32).reshape(1, 3)
    ambient = TARGET_AMBIENT if ambient is None else np.asarray([ambient], np.float32)
    out_name = out_name or f"ref_transfer_{image.split('.')[0]}.npz"
    img = cv2.resize(
        imageio.imread(f"/root/reference/sample_test_images_FFHQ/{image}") / 255.0,
        (256, 256),
    ).astype(np.float32)
    mask = (
        imageio.imread(f"/root/reference/FFHQ_skin_masks/{image}").astype(np.float32)
        / 255.0
    )

    _, model = load_transfer_model()
    with torch.no_grad():
        out = model(
            torch.from_numpy(img[None]),
            200,
            intrinsics(700.0),
            torch.from_numpy(mask[..., None]),
            torch.from_numpy(light.reshape(1, 3, 1, 1)),
            torch.from_numpy(ambient.reshape(1, 1, 1)),
        )
    (albedo, depth, sw, amb, full, rend, unit, ambv, final, norm, estd, esta) = [
        o.detach().numpy().astype(np.float32) for o in out
    ]

    dest = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
    os.makedirs(dest, exist_ok=True)
    np.savez_compressed(
        os.path.join(dest, out_name),
        image=img,
        mask=mask,
        target_light=light,
        target_ambient=ambient,
        albedo=albedo,
        depth=depth,
        shadow_weights=sw,
        full_shading=full,
        rendered=rend,
        final_shading=final,
        normals=norm,
        est_dir=estd,
        est_amb=esta,
    )
    print(f"wrote tests/golden/{out_name}")


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--image", default=IMAGE)
    ap.add_argument("--light", default=None, help="lx,ly,lz")
    ap.add_argument("--ambient", type=float, default=None)
    ap.add_argument("--out-name", default=None)
    a = ap.parse_args()
    light = [float(v) for v in a.light.split(",")] if a.light else None
    main(a.image, light, a.ambient, a.out_name)
