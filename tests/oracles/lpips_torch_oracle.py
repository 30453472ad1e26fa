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


def _conv(trunk_weights, name):
    kern = torch.from_numpy(
        np.asarray(trunk_weights[name]["kernel"], np.float32)
    ).permute(3, 2, 0, 1)  # HWIO -> OIHW
    bias = torch.from_numpy(np.asarray(trunk_weights[name]["bias"], np.float32))
    return kern, bias


def alex_taps(z, trunk_weights):
    """AlexNet slices (pretrained_networks.py alexnet)."""
    outs = []
    for i, (_, _, k, s, p) in enumerate(CONVS):
        kern, bias = _conv(trunk_weights, f"conv{i}")
        z = F.relu(F.conv2d(z, kern, bias, stride=s, padding=p))
        outs.append(z)
        if i in POOL_AFTER:
            z = F.max_pool2d(z, 3, stride=2)
    return outs


# vgg16 conv channels; taps after ReLUs of convs 1/3/6/9/12 (= torchvision
# features 3/8/15/22/29); maxpool(2,2) between tap groups.
VGG_TAPS = (1, 3, 6, 9, 12)


def vgg_taps(z, trunk_weights):
    """VGG16 slices (pretrained_networks.py vgg16: relu{1_2..5_3})."""
    outs = []
    for i in range(13):
        kern, bias = _conv(trunk_weights, f"conv{i}")
        z = F.relu(F.conv2d(z, kern, bias, stride=1, padding=1))
        if i in VGG_TAPS:
            outs.append(z)
            if i != VGG_TAPS[-1]:
                z = F.max_pool2d(z, 2, stride=2)
    return outs


SQUEEZE_FIRES = (3, 4, 6, 7, 9, 10, 11, 12)
SQUEEZE_TAPS = (1, 4, 7, 9, 10, 11, 12)
SQUEEZE_POOLS = (2, 5, 8)


def squeeze_taps(z, trunk_weights):
    """SqueezeNet1_1 slices (pretrained_networks.py squeezenet, 7 taps;
    torchvision fire modules with ceil-mode maxpool(3, 2))."""
    def fire(x, idx):
        ks, bs = _conv(trunk_weights, f"fire{idx}_squeeze")
        s = F.relu(F.conv2d(x, ks, bs))
        k1, b1 = _conv(trunk_weights, f"fire{idx}_expand1")
        k3, b3 = _conv(trunk_weights, f"fire{idx}_expand3")
        return torch.cat(
            [F.relu(F.conv2d(s, k1, b1)), F.relu(F.conv2d(s, k3, b3, padding=1))],
            dim=1,
        )

    outs = []
    k0, b0 = _conv(trunk_weights, "conv0")
    z = F.relu(F.conv2d(z, k0, b0, stride=2))
    for idx in range(1, 13):
        if idx in SQUEEZE_POOLS:
            z = F.max_pool2d(z, 3, stride=2, ceil_mode=True)
        elif idx in SQUEEZE_FIRES:
            z = fire(z, idx)
        if idx in SQUEEZE_TAPS:
            outs.append(z)
    return outs


TAP_FNS = {"alex": alex_taps, "vgg": vgg_taps, "squeeze": squeeze_taps}


def lpips_spatial_torch(x01, y01, trunk_weights, lin_weights, net="alex"):
    """Masked-eval LPIPS map per the reference formulas.

    Args:
      x01, y01: (H, W, 3) float arrays in [0, 1] (im2tensor scales to [-1,1]).
      trunk_weights: {'convI': {'kernel': HWIO, 'bias': (O,)}} — the Flax
        trunk params, converted here to torch OIHW.
      lin_weights: {'linI': {'kernel': (1, 1, C, 1)}} — Flax lin heads.
      net: 'alex' | 'vgg' | 'squeeze' (lpips.py:32-40 trunk selection).
    Returns: (H, W) float32 distance map.
    """
    def to_t(img):
        t = torch.from_numpy(np.asarray(img, np.float32)).permute(2, 0, 1)[None]
        return t * 2.0 - 1.0

    xa, xb = to_t(x01), to_t(y01)
    h, w = xa.shape[2], xa.shape[3]

    def taps(inp):
        z = (inp - SHIFT) / SCALE  # ScalingLayer, lpips.py:152-159
        return TAP_FNS[net](z, trunk_weights)

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
