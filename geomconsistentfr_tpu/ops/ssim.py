"""SSIM with pytorch_msssim parity (the reference's DSSIM loss backend).

Reference usage (train_raytracing_relighting_CelebAHQ_DSSIM_8x.py:643):
  ssim(X, Y, data_range=1.0, size_average=True, nonnegative_ssim=True)
pytorch_msssim semantics reproduced here:
  * separable 1D gaussian window, size 11, sigma 1.5, L1-normalised
  * VALID (no-padding) filtering per channel
  * K1=0.01, K2=0.03; sigma terms as E[x^2]-mu^2 style differences
  * per-channel spatial mean, optional relu (nonnegative), batch/channel mean
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

Array = jax.Array


def gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    coords = np.arange(size, dtype=np.float64) - size // 2
    g = np.exp(-(coords ** 2) / (2.0 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def _filter_valid(x: Array, win: Array) -> Array:
    """Separable valid-mode filtering over H and W. x: (B, H, W, C)."""
    k = win.shape[0]

    def along(axis: int, a: Array) -> Array:
        n = a.shape[axis]
        out = None
        for i in range(k):
            piece = jax.lax.slice_in_dim(a, i, n - (k - 1) + i, axis=axis)
            term = piece * win[i]
            out = term if out is None else out + term
        return out

    return along(2, along(1, x))


def ssim(
    x: Array,
    y: Array,
    data_range: float = 1.0,
    win_size: int = 11,
    win_sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
    nonnegative: bool = True,
    size_average: bool = True,
) -> Array:
    """SSIM between (B, H, W, C) images; scalar if size_average else (B, C)."""
    win = jnp.asarray(gaussian_window(win_size, win_sigma), x.dtype)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    mu1 = _filter_valid(x, win)
    mu2 = _filter_valid(y, win)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = _filter_valid(x * x, win) - mu1_sq
    sigma2_sq = _filter_valid(y * y, win) - mu2_sq
    sigma12 = _filter_valid(x * y, win) - mu1_mu2

    cs_map = (2.0 * sigma12 + c2) / (sigma1_sq + sigma2_sq + c2)
    ssim_map = ((2.0 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1)) * cs_map

    per_channel = jnp.mean(ssim_map, axis=(1, 2))  # (B, C)
    if nonnegative:
        per_channel = jax.nn.relu(per_channel)
    return jnp.mean(per_channel) if size_average else per_channel


def dssim(x: Array, y: Array, **kwargs) -> Array:
    """(1 - SSIM) / 2."""
    return (1.0 - ssim(x, y, **kwargs)) / 2.0
