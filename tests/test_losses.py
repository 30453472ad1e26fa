"""Loss-suite parity tests against torch / float64 oracles."""

import numpy as np
import pytest

import jax.numpy as jnp

from geomconsistentfr_tpu.config import LossConfig
from geomconsistentfr_tpu import losses
from geomconsistentfr_tpu.ops.ssim import gaussian_window, ssim


def test_bce_with_logits_matches_torch():
    torch = pytest.importorskip("torch")

    rng = np.random.default_rng(0)
    logits = rng.normal(size=(3, 1, 15, 15)).astype(np.float32) * 3
    targets = (rng.uniform(size=logits.shape) > 0.5).astype(np.float32)
    got = float(losses.bce_with_logits(jnp.asarray(logits), jnp.asarray(targets)))
    want = float(
        torch.nn.BCEWithLogitsLoss()(
            torch.from_numpy(logits), torch.from_numpy(targets)
        )
    )
    assert abs(got - want) < 1e-6


def _ssim_f64_oracle(x, y, nonnegative=True):
    """pytorch_msssim algorithm in float64 numpy: separable 11-tap gaussian
    (sigma 1.5), VALID padding, K1=.01/K2=.03, per-channel mean, relu, mean."""
    win = gaussian_window(11, 1.5).astype(np.float64)

    def filt(a):  # a: (B, H, W, C)
        a = np.apply_along_axis(lambda v: np.convolve(v, win[::-1], "valid"), 1, a)
        a = np.apply_along_axis(lambda v: np.convolve(v, win[::-1], "valid"), 2, a)
        return a

    x = x.astype(np.float64)
    y = y.astype(np.float64)
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    mx, my = filt(x), filt(y)
    sx = filt(x * x) - mx * mx
    sy = filt(y * y) - my * my
    sxy = filt(x * y) - mx * my
    cs = (2 * sxy + c2) / (sx + sy + c2)
    m = ((2 * mx * my + c1) / (mx ** 2 + my ** 2 + c1)) * cs
    per_channel = m.mean(axis=(1, 2))
    if nonnegative:
        per_channel = np.maximum(per_channel, 0)
    return float(per_channel.mean())


def test_ssim_matches_f64_oracle():
    rng = np.random.default_rng(1)
    x = rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)
    y = np.clip(x + 0.1 * rng.normal(size=x.shape).astype(np.float32), 0, 1)
    got = float(ssim(jnp.asarray(x), jnp.asarray(y)))
    want = _ssim_f64_oracle(x, y)
    assert abs(got - want) < 1e-5, (got, want)


def test_ssim_identity_is_one():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(size=(1, 16, 16, 3)).astype(np.float32))
    assert abs(float(ssim(x, x)) - 1.0) < 1e-6


def test_generator_losses_formulas():
    """Check each term against a direct float64 transcription of
    train_raytracing_relighting_CelebAHQ_DSSIM_8x.py:633-645."""
    rng = np.random.default_rng(3)
    B, H, W = 2, 32, 32
    rendered = rng.uniform(size=(B, H, W, 3)).astype(np.float32)
    images = rng.uniform(size=(B, H, W, 3)).astype(np.float32)
    depth = (rng.normal(size=(B, H, W)) * 10).astype(np.float32)
    depth_gt = (rng.normal(size=(B, H, W)) * 10).astype(np.float32)
    depth_mask = (rng.uniform(size=(B, H, W)) > 0.3).astype(np.float32)
    albedo = rng.uniform(size=(B, H, W, 3)).astype(np.float32)
    albedo_gt = rng.uniform(size=(B, H, W)).astype(np.float32)
    face_mask = (rng.uniform(size=(B, H, W)) > 0.3).astype(np.float32)
    est_ambient = rng.uniform(size=(B,)).astype(np.float32)
    est_dir = rng.normal(size=(B, 3)).astype(np.float32)
    light_gt = rng.normal(size=(B, 3)).astype(np.float32)
    fake_logits = rng.normal(size=(B, 1, 3, 3)).astype(np.float32)

    cfg = LossConfig()
    out = losses.generator_losses(
        rendered=jnp.asarray(rendered),
        images=jnp.asarray(images),
        depth=jnp.asarray(depth),
        depth_gt=jnp.asarray(depth_gt),
        depth_mask=jnp.asarray(depth_mask),
        albedo=jnp.asarray(albedo),
        albedo_gt=jnp.asarray(albedo_gt),
        face_mask=jnp.asarray(face_mask),
        est_ambient=jnp.asarray(est_ambient),
        est_unit_dir=jnp.asarray(est_dir),
        light_gt=jnp.asarray(light_gt),
        fake_logits=jnp.asarray(fake_logits),
        cfg=cfg,
    )

    m3 = np.repeat(face_mask[..., None], 3, -1).astype(np.float64)
    recon = 20.0 * np.sum(((rendered - images).astype(np.float64) * m3) ** 2 * 0 + np.square((rendered.astype(np.float64) * m3 - images.astype(np.float64) * m3))) / m3.sum()
    assert abs(float(out["reconstruction"]) - recon) < 1e-3 * max(1, abs(recon))

    depth_l = np.sum(np.abs(depth.astype(np.float64) * depth_mask - depth_gt.astype(np.float64) * depth_mask)) / depth_mask.sum()
    assert abs(float(out["depth"]) - depth_l) < 1e-3 * max(1, abs(depth_l))

    amb = 2.5 * np.mean(np.abs(est_ambient - 0.5))
    assert abs(float(out["ambient"]) - amb) < 1e-5

    dirn = np.sum(1 - np.sum(est_dir * light_gt, axis=1)) / B
    assert abs(float(out["direction"]) - dirn) < 1e-5

    alb = 5.0 * np.sum(np.abs(albedo.mean(-1).astype(np.float64) * face_mask - albedo_gt.astype(np.float64) * face_mask)) / face_mask.sum()
    assert abs(float(out["albedo"]) - alb) < 1e-3 * max(1, abs(alb))

    assert np.isfinite(float(out["total"]))


def test_masked_composite():
    rng = np.random.default_rng(4)
    r = jnp.asarray(rng.uniform(size=(1, 4, 4, 3)).astype(np.float32))
    img = jnp.asarray(rng.uniform(size=(1, 4, 4, 3)).astype(np.float32))
    mask = jnp.zeros((1, 4, 4))
    np.testing.assert_allclose(
        np.asarray(losses.masked_composite(r, img, mask)), np.asarray(img)
    )
    mask = jnp.ones((1, 4, 4))
    np.testing.assert_allclose(
        np.asarray(losses.masked_composite(r, img, mask)), np.asarray(r)
    )


def test_ssim_matches_pytorch_msssim_oracle():
    """ops/ssim.ssim vs the literal pytorch_msssim transcription (torch).

    Gates the 8.0-weighted DSSIM loss term against the reference library's
    algorithm rather than the builder's own float64 re-derivation.
    """
    import torch

    from geomconsistentfr_tpu.ops.ssim import ssim as ssim_jax
    from tests.oracles.msssim_oracle import ssim as ssim_oracle

    rng = np.random.default_rng(21)
    x = rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)
    y = np.clip(x + 0.15 * rng.normal(size=x.shape), 0, 1).astype(np.float32)

    got = float(ssim_jax(jnp.asarray(x), jnp.asarray(y),
                         data_range=1.0, nonnegative=True))
    want = float(ssim_oracle(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        torch.from_numpy(y.transpose(0, 3, 1, 2)),
        data_range=1.0, size_average=True, nonnegative_ssim=True,
    ))
    assert abs(got - want) < 1e-5, (got, want)

    # Degenerate anti-correlated case exercises the nonnegative relu branch.
    a = np.zeros((1, 16, 16, 1), np.float32); a[:, ::2] = 1.0
    b = 1.0 - a
    got = float(ssim_jax(jnp.asarray(a), jnp.asarray(b),
                         data_range=1.0, nonnegative=True))
    want = float(ssim_oracle(
        torch.from_numpy(a.transpose(0, 3, 1, 2)),
        torch.from_numpy(b.transpose(0, 3, 1, 2)),
        data_range=1.0, size_average=True, nonnegative_ssim=True,
    ))
    assert abs(got - want) < 1e-6, (got, want)
