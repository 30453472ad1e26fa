"""Torch transcription of pytorch_msssim's `ssim` — TEST ORACLE ONLY.

pytorch_msssim is not installed in this environment, but the reference's
DSSIM loss is `8*(1 - ssim(composite, input, data_range=1.0,
size_average=True, nonnegative_ssim=True))/2`
(train_raytracing_relighting_CelebAHQ_DSSIM_8x.py:643). This module is a
literal re-derivation of that library's documented algorithm (VainF/
pytorch-msssim `ssim.py`: `_fspecial_gauss_1d`, `gaussian_filter`, `_ssim`)
so the framework's JAX SSIM (geomconsistentfr_tpu/ops/ssim.py) can be gated
against the reference library's behaviour rather than the builder's own
transcription. Nothing here ships in the framework.

Semantics transcribed:
  * 1D gaussian window `exp(-(i - size//2)^2 / (2 sigma^2))`, L1-normalised,
    built in float32 then cast to the input dtype;
  * separable grouped conv over each spatial dim, stride 1, NO padding
    (valid), skipping dims smaller than the window;
  * C1=(K1*L)^2, C2=(K2*L)^2 with K=(0.01, 0.03), compensation=1.0;
  * sigma terms as filter(x*x) - mu^2;
  * ssim_map/cs_map per pixel, per-channel spatial mean, optional relu
    (nonnegative_ssim), then overall mean when size_average.
"""

import torch
import torch.nn.functional as F


def _fspecial_gauss_1d(size: int, sigma: float) -> torch.Tensor:
    coords = torch.arange(size, dtype=torch.float)
    coords -= size // 2
    g = torch.exp(-(coords**2) / (2 * sigma**2))
    g /= g.sum()
    return g.reshape(1, 1, size)


def gaussian_filter(x: torch.Tensor, win: torch.Tensor) -> torch.Tensor:
    """Separable blur: grouped 1D convs along H then W, valid padding."""
    c = x.shape[1]
    out = x
    for i, s in enumerate(x.shape[2:]):
        if s >= win.shape[-1]:
            w = win.repeat(c, 1, 1)  # (C, 1, size), groups=C
            if i == 0:
                out = F.conv2d(out, w.unsqueeze(3), stride=1, padding=0, groups=c)
            else:
                out = F.conv2d(out, w.unsqueeze(2), stride=1, padding=0, groups=c)
    return out


def ssim(
    x: torch.Tensor,
    y: torch.Tensor,
    data_range: float = 255.0,
    size_average: bool = True,
    win_size: int = 11,
    win_sigma: float = 1.5,
    k: tuple = (0.01, 0.03),
    nonnegative_ssim: bool = False,
) -> torch.Tensor:
    """pytorch_msssim.ssim for 4D (B, C, H, W) inputs."""
    assert x.shape == y.shape and x.ndim == 4 and win_size % 2 == 1
    win = _fspecial_gauss_1d(win_size, win_sigma).to(x.device, dtype=x.dtype)

    k1, k2 = k
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    compensation = 1.0

    mu1 = gaussian_filter(x, win)
    mu2 = gaussian_filter(y, win)
    mu1_sq = mu1.pow(2)
    mu2_sq = mu2.pow(2)
    mu1_mu2 = mu1 * mu2
    sigma1_sq = compensation * (gaussian_filter(x * x, win) - mu1_sq)
    sigma2_sq = compensation * (gaussian_filter(y * y, win) - mu2_sq)
    sigma12 = compensation * (gaussian_filter(x * y, win) - mu1_mu2)

    cs_map = (2 * sigma12 + c2) / (sigma1_sq + sigma2_sq + c2)
    ssim_map = ((2 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1)) * cs_map

    ssim_per_channel = torch.flatten(ssim_map, 2).mean(-1)
    if nonnegative_ssim:
        ssim_per_channel = torch.relu(ssim_per_channel)
    if size_average:
        return ssim_per_channel.mean()
    return ssim_per_channel.mean(1)
