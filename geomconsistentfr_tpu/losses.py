"""Training losses (reference train_raytracing_relighting_CelebAHQ_DSSIM_8x.py:582-645).

Seven generator terms + the discriminator term, with the reference's exact
weights and mask normalisations:
  reconstruction  20 * sum((rend - img)^2 * mask3) / sum(mask3)      (:633)
  depth            sum(|depth - gt| * mask) / sum(mask)              (:634)
  ambient          2.5 * mean(|ambient_est - 0.5|)                   (:635)
  direction        sum(1 - <unit_est, unit_gt>) / B                  (:636)
  albedo           5 * sum(|gray(albedo) - gt| * mask) / sum(mask)   (:637-639)
  g_adv            0.01 * BCE(D(composite), real)                    (:641-642)
  dssim            8 * (1 - SSIM(composite, img)) / 2                (:643)
  d_loss           0.01 * (BCE(D(composite), fake) + BCE(D(img), real)) (:621-623)
where composite = rendered*mask3 + (1-mask3)*img (:619).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from geomconsistentfr_tpu.config import LossConfig
from geomconsistentfr_tpu.ops.ssim import ssim

Array = jax.Array


def bce_with_logits(
    logits: Array, targets: Array, axis_name: Optional[str] = None
) -> Array:
    """Mean binary cross-entropy on logits (torch BCEWithLogitsLoss parity)."""
    loss = jnp.mean(
        jnp.maximum(logits, 0.0)
        - logits * targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
    if axis_name is not None:
        loss = jax.lax.pmean(loss, axis_name)
    return loss


def masked_composite(rendered: Array, image: Array, mask: Array) -> Array:
    """rendered*mask + (1-mask)*image with a (B,H,W) mask over (B,H,W,3)."""
    m = mask[..., None]
    return rendered * m + (1.0 - m) * image


def generator_losses(
    *,
    rendered: Array,           # (B,H,W,3)
    images: Array,             # (B,H,W,3) input photos (self-supervision target)
    depth: Array,              # (B,H,W) predicted
    depth_gt: Array,           # (B,H,W) pseudo-GT
    depth_mask: Array,         # (B,H,W) depth-loss mask
    albedo: Array,             # (B,H,W,3) predicted
    albedo_gt: Array,          # (B,H,W) grayscale pseudo-GT
    face_mask: Array,          # (B,H,W) "fill nose and mouth" mask
    est_ambient: Array,        # (B,)
    est_unit_dir: Array,       # (B,3)
    light_gt: Array,           # (B,3)
    fake_logits: Array,        # D(composite)
    cfg: LossConfig,
    axis_name: Optional[str] = None,
) -> Dict[str, Array]:
    """Generator losses; with `axis_name`, masked sums / means are reduced
    across the data-parallel axis so sharded training reproduces the
    reference's global-batch normalisation exactly."""

    def allsum(x):
        s = jnp.sum(x)
        return jax.lax.psum(s, axis_name) if axis_name is not None else s

    def allmean(x):
        m = jnp.mean(x)
        return jax.lax.pmean(m, axis_name) if axis_name is not None else m

    composite = masked_composite(rendered, images, face_mask)

    recon = (
        cfg.reconstruction
        * allsum(jnp.square(rendered - images) * face_mask[..., None])
        / (3.0 * allsum(face_mask))
    )
    depth_l = (
        cfg.depth
        * allsum(jnp.abs(depth - depth_gt) * depth_mask)
        / allsum(depth_mask)
    )
    ambient_l = cfg.ambient * allmean(jnp.abs(est_ambient - cfg.ambient_target))
    direction_l = cfg.direction * allmean(
        1.0 - jnp.sum(est_unit_dir * light_gt, axis=-1)
    )
    gray_albedo = jnp.mean(albedo, axis=-1)
    albedo_l = (
        cfg.albedo
        * allsum(jnp.abs(gray_albedo - albedo_gt) * face_mask)
        / allsum(face_mask)
    )
    g_adv = cfg.gan * bce_with_logits(
        fake_logits, jnp.ones_like(fake_logits), axis_name
    )
    dssim_l = (
        cfg.dssim
        * (1.0 - _allmean_ssim(composite, images, axis_name))
        / 2.0
    )

    total = recon + depth_l + ambient_l + direction_l + albedo_l + g_adv + dssim_l
    return {
        "total": total,
        "reconstruction": recon,
        "depth": depth_l,
        "ambient": ambient_l,
        "direction": direction_l,
        "albedo": albedo_l,
        "generator": g_adv,
        "dssim": dssim_l,
    }


def _allmean_ssim(x: Array, y: Array, axis_name: Optional[str]) -> Array:
    val = ssim(x, y, data_range=1.0, nonnegative=True)
    if axis_name is not None:
        val = jax.lax.pmean(val, axis_name)
    return val


def discriminator_losses(
    fake_logits: Array,
    real_logits: Array,
    cfg: LossConfig,
    axis_name: Optional[str] = None,
) -> Dict[str, Array]:
    d_fake = cfg.gan * bce_with_logits(
        fake_logits, jnp.zeros_like(fake_logits), axis_name
    )
    d_real = cfg.gan * bce_with_logits(
        real_logits, jnp.ones_like(real_logits), axis_name
    )
    return {
        "discriminator": d_fake + d_real,
        "discriminator_fake": d_fake,
        "discriminator_real": d_real,
    }


def psnr(x: Array, y: Array, data_range: float = 1.0) -> Array:
    mse = jnp.mean(jnp.square(x - y))
    return 10.0 * jnp.log10(data_range ** 2 / jnp.maximum(mse, 1e-12))
