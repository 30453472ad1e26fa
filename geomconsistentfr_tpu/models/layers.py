"""Shared NN building blocks with torch-matching numerics.

The reference is a PyTorch model; converted checkpoints must reproduce its
outputs bit-closely, and fresh training should follow the same statistics. The
layers here therefore match torch semantics exactly:
  * `TorchBatchNorm`: biased variance for normalisation, unbiased for the
    running-var update, running = (1-m)*running + m*batch (torch momentum
    convention), eps 1e-5. Optionally syncs batch moments across a named mesh
    axis (cross-replica BN) so data-parallel training matches the reference's
    single-device batch statistics.
  * `torch_conv_init` / `torch_linear_init`: kaiming-uniform(a=sqrt(5)) weight
    plus uniform(+-1/sqrt(fan_in)) bias, the torch defaults.

Layout is NHWC throughout (TPU-native).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


def torch_kernel_init(key, shape, dtype=jnp.float32):
    """torch kaiming_uniform_(a=sqrt(5)) for conv (HWIO) / dense (IO) kernels."""
    if len(shape) == 2:  # dense (in, out)
        fan_in = shape[0]
    else:  # conv HWIO
        receptive = 1
        for s in shape[:-2]:
            receptive *= s
        fan_in = shape[-2] * receptive
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_bias_init_for(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


class TorchBatchNorm(nn.Module):
    """BatchNorm2d with exact torch semantics and optional cross-replica sync.

    Moments, running statistics, and the affine transform are always computed
    in float32 regardless of the activation dtype; when `dtype` is set (e.g.
    bfloat16 for the fast serving path) only the returned activations are
    narrowed.
    """

    features: int
    momentum: float = 0.1
    eps: float = 1e-5
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, use_running_average: bool) -> Array:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
        )

        out_dtype = self.dtype or x.dtype
        x = x.astype(jnp.float32)
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            reduce_axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x, axis=reduce_axes)
            mean_sq = jnp.mean(jnp.square(x), axis=reduce_axes)
            n = x.size // x.shape[-1]
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
                mean_sq = jax.lax.pmean(mean_sq, self.axis_name)
                n = n * jax.lax.psum(1, self.axis_name)
            var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
            if not self.is_initializing():
                m = self.momentum
                bessel = n / jnp.maximum(n - 1, 1)
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                ra_var.value = (1.0 - m) * ra_var.value + m * var * bessel

        inv = jax.lax.rsqrt(var + self.eps)
        return ((x - mean) * inv * scale + bias).astype(out_dtype)


def conv2d(
    x: Array,
    features: int,
    kernel: int,
    *,
    name: str,
    use_bias: bool = True,
    stride: int = 1,
    padding: Optional[Sequence[tuple[int, int]]] = None,
    precision: Optional[str] = None,
    dtype: Optional[jnp.dtype] = None,
) -> Array:
    """3x3/5x5/1x1 same-style conv with torch-default init, NHWC.

    `dtype` is the computation/activation dtype (params stay float32 —
    flax promotes them per call); None keeps the input dtype.
    """
    if padding is None:
        p = (kernel - 1) // 2
        padding = ((p, p), (p, p))
    fan_in = x.shape[-1] * kernel * kernel
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=padding,
        use_bias=use_bias,
        name=name,
        kernel_init=torch_kernel_init,
        bias_init=torch_bias_init_for(fan_in),
        precision=precision,
        dtype=dtype,
    )(x)


def max_pool2(x: Array) -> Array:
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def upsample2_nearest(x: Array) -> Array:
    """Exact nearest-neighbour x2 upsample (torch nn.Upsample(scale_factor=2))."""
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)


def leaky_relu(x: Array, slope: float) -> Array:
    return jnp.where(x >= 0, x, slope * x)
