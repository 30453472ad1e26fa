"""Torch transcription of the reference LPIPS formulas — TEST ORACLE ONLY.

Re-derives the math of PerceptualSimilarity/lpips/lpips.py:22-241 and
pretrained_networks.py's alexnet slices (scaling layer -> AlexNet feature
taps -> unit-L2 channel normalisation (eps 1e-10) -> squared diff -> 1x1
linear heads -> bilinear upsample, align_corners=False -> sum over taps) so
the Flax implementation in geomconsistentfr_tpu/models/lpips.py can be
checked against the reference semantics with *shared* weights. Nothing here
ships in the framework.
"""

import numpy as np
import torch
import torch.nn.functional as F

# (out_ch, in_ch, kernel, stride, pad) of torchvision AlexNet `features`
# convs; maxpool(3, stride 2) after taps 0 and 1 (pretrained_networks.py).
CONVS = (
    (64, 3, 11, 4, 2),
    (192, 64, 5, 1, 2),
    (384, 192, 3, 1, 1),
    (256, 384, 3, 1, 1),
    (256, 256, 3, 1, 1),
)
POOL_AFTER = (0, 1)

SHIFT = torch.tensor([-0.030, -0.088, -0.188])[None, :, None, None]
SCALE = torch.tensor([0.458, 0.448, 0.450])[None, :, None, None]


def _normalize(feat, eps=1e-10):
    # lpips/__init__.py:13-15
    norm = torch.sqrt(torch.sum(feat**2, dim=1, keepdim=True))
    return feat / (norm + eps)


def lpips_spatial_torch(x01, y01, trunk_weights, lin_weights):
    """Masked-eval LPIPS map per the reference formulas.

    Args:
      x01, y01: (H, W, 3) float arrays in [0, 1] (im2tensor scales to [-1,1]).
      trunk_weights: {'convI': {'kernel': HWIO, 'bias': (O,)}} — the Flax
        trunk params, converted here to torch OIHW.
      lin_weights: {'linI': {'kernel': (1, 1, C, 1)}} — Flax lin heads.
    Returns: (H, W) float32 distance map.
    """
    def to_t(img):
        t = torch.from_numpy(np.asarray(img, np.float32)).permute(2, 0, 1)[None]
        return t * 2.0 - 1.0

    xa, xb = to_t(x01), to_t(y01)
    h, w = xa.shape[2], xa.shape[3]

    def taps(inp):
        z = (inp - SHIFT) / SCALE  # ScalingLayer, lpips.py:152-159
        outs = []
        for i, (_, _, k, s, p) in enumerate(CONVS):
            kern = torch.from_numpy(
                np.asarray(trunk_weights[f"conv{i}"]["kernel"], np.float32)
            ).permute(3, 2, 0, 1)  # HWIO -> OIHW
            bias = torch.from_numpy(
                np.asarray(trunk_weights[f"conv{i}"]["bias"], np.float32)
            )
            z = F.relu(F.conv2d(z, kern, bias, stride=s, padding=p))
            outs.append(z)
            if i in POOL_AFTER:
                z = F.max_pool2d(z, 3, stride=2)
        return outs

    fx, fy = taps(xa), taps(xb)
    total = torch.zeros(1, 1, h, w)
    for i, (a, b) in enumerate(zip(fx, fy)):
        d = (_normalize(a) - _normalize(b)) ** 2  # lpips.py:123-124
        lin = torch.from_numpy(
            np.asarray(lin_weights[f"lin{i}"]["kernel"], np.float32)
        ).permute(3, 2, 0, 1)
        r = F.conv2d(d, lin)  # NetLinLayer (1x1, no bias), lpips.py:160-170
        # upsample(), lpips.py:17-19: bilinear to input size, align_corners=False
        total = total + F.interpolate(
            r, size=(h, w), mode="bilinear", align_corners=False
        )
    return total[0, 0].numpy()
