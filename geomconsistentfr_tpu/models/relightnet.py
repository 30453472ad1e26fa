"""RelightNet: shared encoder + lighting head + albedo & depth decoders (Flax).

Architecture parity with the reference (layer graph:
test_relight_single_image.py:30-167 [definitions], :169-323 [forward]):
  * Encoder: conv5x5(3->16)+BN+LReLU(0.2), maxpool; then 3 residual stages
    (16->32->64->155), each two conv3x3+BN with a BN'd projection shortcut,
    maxpool between stages. The 155-ch bottleneck splits into 128 identity
    channels and 27 lighting channels (:198-199).
  * Lighting head: global average over the 16x16 map -> Dense 27->128 ->
    LReLU -> Dense 128->4 = [ambient, lx, ly, lz] (:58-61, :203-205).
  * Two mirrored decoders (albedo -> 3ch sigmoid, depth -> 1ch * 100): four
    up-stages, each a residual pair of stride-1 3x3 transposed convs with a
    BN'd projection shortcut, nearest x2 upsample, and an *epoch-gated*
    additive skip from the matching encoder stage whose own residual branch is
    always evaluated (:208-323). Final head: conv3x3 + two conv1x1 + conv1x1
    out (:259-263, :317-323).

Variants ('target' vs 'transfer') differ only in the projection shortcuts:
3x3 with bias (train_raytracing_relighting_CelebAHQ_DSSIM_8x.py:63-69,...) vs
1x1 bias-free (train_lighting_transfer.py:63-69,...).

Stride-1, padding-1 ConvTranspose2d is mathematically a plain 3x3 convolution
with spatially flipped, channel-transposed weights, so the decoders here use
ordinary convs (MXU-friendly); the checkpoint converter performs the flip.

Layout is NHWC; inputs are (B, H, W, 3) in [0, 1].
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from geomconsistentfr_tpu.config import ModelConfig
from geomconsistentfr_tpu.models.layers import (
    TorchBatchNorm,
    conv2d,
    leaky_relu,
    max_pool2,
    upsample2_nearest,
)

Array = jax.Array


class RelightNetOutputs(NamedTuple):
    albedo: Array      # (B, H, W, 3), sigmoid
    depth: Array       # (B, H, W), scaled by 100
    lighting: Array    # (B, 4) raw head output: [ambient, lx, ly, lz]


class RelightNet(nn.Module):
    cfg: ModelConfig = ModelConfig()
    axis_name: Optional[str] = None  # cross-replica BN axis for data parallelism

    @nn.compact
    def __call__(
        self,
        img: Array,
        *,
        train: bool = False,
        use_skips: Tuple[bool, bool, bool, bool] = (True, True, True, True),
    ) -> RelightNetOutputs:
        cfg = self.cfg
        slope = cfg.leaky_slope
        ura = not train

        prec = None if cfg.conv_precision == "default" else cfg.conv_precision
        if cfg.compute_dtype == "bfloat16":
            dtype = jnp.bfloat16
        elif cfg.compute_dtype == "float32":
            dtype = None
        else:
            raise ValueError(f"unknown compute_dtype: {cfg.compute_dtype}")
        if dtype is not None:
            img = img.astype(dtype)

        def lrelu(x):
            return leaky_relu(x, slope)

        def bn(x, name):
            return TorchBatchNorm(
                x.shape[-1],
                momentum=cfg.bn_momentum,
                eps=cfg.bn_eps,
                axis_name=self.axis_name,
                dtype=dtype,
                name=name,
            )(x, use_running_average=ura)

        def conv_bn(x, name, feat, k):
            return bn(
                conv2d(x, feat, k, name=f"conv_{name}", precision=prec, dtype=dtype),
                f"bn_{name}",
            )

        def shortcut(x, name, feat, transposed):
            # Projection shortcut; variant-dependent geometry.
            layer = "deconv_" if transposed else "conv_"
            if cfg.variant == "target":
                y = conv2d(x, feat, 3, name=f"{layer}{name}", precision=prec, dtype=dtype)
            elif cfg.variant == "transfer":
                y = conv2d(
                    x, feat, 1, name=f"{layer}{name}", use_bias=False,
                    precision=prec, dtype=dtype,
                )
            else:
                raise ValueError(f"unknown variant: {cfg.variant}")
            return bn(y, f"bn_{name}")

        # ------------------------------------------------------------------
        # Encoder
        # ------------------------------------------------------------------
        c1_og = lrelu(conv_bn(img, "c1_og", cfg.base_channels, 5))
        c1 = max_pool2(c1_og)

        h1_1 = lrelu(conv_bn(c1, "h1_1", 16, 3))
        h1_2 = conv_bn(h1_1, "h1_2", 16, 3)
        h1_out_og = lrelu(c1 + h1_2)

        h1_out = max_pool2(h1_out_og)
        h2_1 = lrelu(conv_bn(h1_out, "h2_1", 32, 3))
        h2_2 = conv_bn(h2_1, "h2_2", 32, 3)
        sc1 = shortcut(h1_out, "shortcut_h1_out", 32, transposed=False)
        h2_out_og = lrelu(sc1 + h2_2)

        h2_out = max_pool2(h2_out_og)
        h3_1 = lrelu(conv_bn(h2_out, "h3_1", 64, 3))
        h3_2 = conv_bn(h3_1, "h3_2", 64, 3)
        sc2 = shortcut(h2_out, "shortcut_h2_out", 64, transposed=False)
        h3_out_og = lrelu(sc2 + h3_2)

        h3_out = max_pool2(h3_out_og)
        h4_1 = lrelu(conv_bn(h3_out, "h4_1", 155, 3))
        h4_2 = conv_bn(h4_1, "h4_2", 155, 3)
        sc3 = shortcut(h3_out, "shortcut_h3_out", 155, transposed=False)
        h4_out = lrelu(sc3 + h4_2)

        identity = h4_out[..., : cfg.identity_channels]
        lighting_features = h4_out[..., cfg.identity_channels :]

        # ------------------------------------------------------------------
        # Lighting head (AvgPool over the full 16x16 map -> MLP)
        # ------------------------------------------------------------------
        # Head MLP runs in f32 even under bfloat16 activations: it is 4 output
        # scalars (ambient + light direction) on a (B, 27) input — zero cost,
        # and the renderer consumes them directly.
        lf = jnp.mean(lighting_features.astype(jnp.float32), axis=(1, 2))
        sl1 = lrelu(
            nn.Dense(
                cfg.lighting_hidden,
                name="linear_SL1",
                kernel_init=_dense_init,
                bias_init=_dense_bias_init(cfg.lighting_channels),
                precision=prec,
            )(lf)
        )
        lighting = nn.Dense(
            cfg.lighting_out,
            name="linear_SL2",
            kernel_init=_dense_init,
            bias_init=_dense_bias_init(cfg.lighting_hidden),
            precision=prec,
        )(sl1)

        # ------------------------------------------------------------------
        # Decoders
        # ------------------------------------------------------------------
        skips = (h3_out_og, h2_out_og, h1_out_og, c1_og)

        def decoder(prefix: str, out_ch: int) -> Array:
            stages = (
                ("h5", 64, "all_features"),
                ("h6", 32, "h5_out"),
                ("h7", 16, "h6_out"),
                ("h8", 16, None),
            )
            x = identity
            for idx, (stage, feat, sc_src) in enumerate(stages):
                y1 = lrelu(
                    bn(
                        conv2d(x, feat, 3, name=f"deconv_{prefix}_{stage}_1", precision=prec),
                        f"bn_{prefix}_{stage}_1",
                    )
                )
                y2 = bn(
                    conv2d(y1, feat, 3, name=f"deconv_{prefix}_{stage}_2", precision=prec),
                    f"bn_{prefix}_{stage}_2",
                )
                if sc_src is None:
                    sc = x  # plain residual (final stage keeps 16 channels)
                else:
                    sc = shortcut(
                        x, f"{prefix}_shortcut_{sc_src}", feat, transposed=True
                    )
                x = lrelu(sc + y2)
                x = upsample2_nearest(x)

                # Encoder skip branch: always evaluated (its BN stats update in
                # train mode even while the gate is closed), gated additively.
                s = skips[idx]
                s1 = lrelu(conv_bn(s, f"{prefix}_skip_s{idx + 1}_1", s.shape[-1], 3))
                s2 = conv_bn(s1, f"{prefix}_skip_s{idx + 1}_2", s.shape[-1], 3)
                s_out = lrelu(s + s2)
                if use_skips[idx]:
                    x = x + s_out

            x = lrelu(conv_bn(x, f"{prefix}_c2_1", 16, 3))
            x = lrelu(conv_bn(x, f"{prefix}_c2_2", 16, 1))
            x = lrelu(conv_bn(x, f"{prefix}_c2_3", 16, 1))
            out = conv2d(
                x, out_ch, 1, name=f"conv_{prefix}_c2_o", precision=prec, dtype=dtype
            )
            # Renderer consumes f32 regardless of the CNN activation dtype.
            return out.astype(jnp.float32)

        albedo = jax.nn.sigmoid(decoder("albedo", 3))
        # "allow network to estimate smaller values" (train_*.py:349-350)
        depth = 100.0 * decoder("depth", 1)[..., 0]

        return RelightNetOutputs(albedo=albedo, depth=depth, lighting=lighting)


def _dense_init(key, shape, dtype=jnp.float32):
    from geomconsistentfr_tpu.models.layers import torch_kernel_init

    return torch_kernel_init(key, shape, dtype)


def _dense_bias_init(fan_in: int):
    from geomconsistentfr_tpu.models.layers import torch_bias_init_for

    return torch_bias_init_for(fan_in)
