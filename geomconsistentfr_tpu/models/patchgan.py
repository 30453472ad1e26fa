"""PatchGAN discriminator (reference train_*.py:15-35).

Five 4x4 convs: stride 2 for conv1-4 (3->64->128->256->512, BN on conv2-4,
LReLU 0.2), stride 1 for conv5 -> (B, 15, 15, 1) patch logits on 256x256 input.
NHWC, torch-default init, torch-parity BatchNorm.
"""

from __future__ import annotations

from typing import Optional

import jax
from flax import linen as nn

from geomconsistentfr_tpu.config import PatchGANConfig
from geomconsistentfr_tpu.models.layers import TorchBatchNorm, conv2d, leaky_relu

Array = jax.Array


class PatchGAN(nn.Module):
    cfg: PatchGANConfig = PatchGANConfig()
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, img: Array, *, train: bool = False) -> Array:
        cfg = self.cfg
        ura = not train

        def bn(x, name):
            return TorchBatchNorm(
                x.shape[-1],
                momentum=cfg.bn_momentum,
                eps=cfg.bn_eps,
                axis_name=self.axis_name,
                name=name,
            )(x, use_running_average=ura)

        x = img
        x = leaky_relu(
            conv2d(x, cfg.channels[0], cfg.kernel, name="conv1", stride=2),
            cfg.leaky_slope,
        )
        for i, feat in enumerate(cfg.channels[1:], start=2):
            x = conv2d(x, feat, cfg.kernel, name=f"conv{i}", stride=2)
            x = leaky_relu(bn(x, f"bn{i}"), cfg.leaky_slope)
        return conv2d(x, 1, cfg.kernel, name="conv5", stride=1)

    # torch Conv2d(k=4, stride=2, padding=1) pads 1 on each side; flax 'SAME'
    # would pad asymmetrically, so conv2d's explicit ((1,1),(1,1)) padding from
    # kernel//2 == 1 is never used here -- kernel 4 gives p=(4-1)//2=1 on both
    # sides, matching torch. (Documented invariant; see layers.conv2d.)
