"""Training-phase parity vs the reference train script (heavy; env-gated).

Runs the reference lighting-transfer train-variant RelightNet (CPU, bundled
checkpoint, train mode) plus a weight-shared PatchGAN on one batch, computes
the reference's exact loss expressions (train_lighting_transfer.py:624-651 /
train_raytracing_...py:617-645), and checks this framework's fused train-step
metrics against them. Gated behind GCFR_HEAVY_TESTS=1 (several minutes on this
1-core VM).
"""

import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    os.environ.get("GCFR_HEAVY_TESTS") != "1",
    reason="heavy parity test; set GCFR_HEAVY_TESTS=1",
)

CKPT = "/root/reference/model_lighting_transfer/model_epoch106.pth"


def test_train_step_loss_parity():
    import torch

    from tests.oracles.reference_loader import (
        intrinsics,
        load_reference_module,
    )

    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    B, S = 3, 256
    images = rng.uniform(0.1, 0.9, (B, S, S, 3)).astype(np.float32)
    face_mask = np.ones((B, S, S), np.float32)
    face_mask[:, :40] = 0.0
    depth_gt = (rng.normal(size=(B, S, S)) * 20).astype(np.float32)
    depth_mask = (rng.uniform(size=(B, S, S)) > 0.2).astype(np.float32)
    albedo_gt = rng.uniform(size=(B, S, S)).astype(np.float32)
    light_gt = rng.normal(size=(B, 3)).astype(np.float32)
    light_gt /= np.linalg.norm(light_gt, axis=1, keepdims=True)

    # ---- reference side ----
    mod = load_reference_module("train_lighting_transfer")
    ref_model = mod.RelightNet()
    ref_model.load_state_dict(torch.load(CKPT, map_location="cpu"))
    ref_model = ref_model.float().train()
    ref_d = mod.PatchGAN().float().train()

    timg = torch.from_numpy(images)
    tmask3 = torch.from_numpy(
        np.repeat(np.transpose(face_mask[:, None], (0, 1, 2, 3)), 3, axis=1)
    )
    tmasks = torch.from_numpy(face_mask[..., None])

    bce = torch.nn.BCEWithLogitsLoss()
    l1 = torch.nn.L1Loss()
    l1s = torch.nn.L1Loss(reduction="sum")
    l2s = torch.nn.MSELoss(reduction="sum")

    with torch.no_grad():
        out = ref_model(timg, 0, intrinsics(1570.0), tmasks)
        albedo, depth, _, _, _, rendered, unit_dir, ambient_vals = out
        composite = rendered * tmask3 + (1.0 - tmask3) * timg.permute(0, 3, 1, 2)
        logits_fake = ref_d(composite)
        logits_real = ref_d(timg.permute(0, 3, 1, 2))
        fake_labels = torch.zeros_like(logits_fake)
        real_labels = torch.ones_like(logits_real)
        d_fake = 0.01 * bce(logits_fake, fake_labels)
        d_real = 0.01 * bce(logits_real, real_labels)
        # second fake pass in train mode (reference :646-647 region)
        logits_fake2 = ref_d(composite)
        g_adv = 0.01 * bce(logits_fake2, real_labels)

        tdm = torch.from_numpy(depth_mask[..., None])
        recon = 20.0 * l2s(
            rendered * tmask3, timg.permute(0, 3, 1, 2) * tmask3
        ) / torch.sum(tmask3)
        depth_l = l1s(
            depth.permute(0, 2, 3, 1) * tdm, torch.from_numpy(depth_gt)[..., None] * tdm
        ) / torch.sum(tdm)
        ambient_l = 2.5 * l1(
            ambient_vals, torch.full((B, 1, 1), 0.5)
        )
        dir_l = torch.sum(
            1 - torch.sum(unit_dir * torch.from_numpy(light_gt).reshape(B, 3, 1, 1), dim=1)
        ) / B
        gray = torch.mean(albedo, 1)
        talb = torch.from_numpy(albedo_gt)
        tfm = torch.from_numpy(face_mask)
        albedo_l = 5.0 * l1s(gray * tfm, talb * tfm) / torch.sum(tfm)

        # DSSIM term (train_raytracing_...py:643): composite vs input through
        # the pytorch_msssim transcription oracle — closes the round-1 gap
        # where the 8.0-weighted term had no reference-library-backed check.
        from tests.oracles.msssim_oracle import ssim as ssim_oracle

        dssim_l = 8.0 * (
            1.0
            - ssim_oracle(
                composite,
                timg.permute(0, 3, 1, 2),
                data_range=1.0,
                size_average=True,
                nonnegative_ssim=True,
            )
        ) / 2.0

    ref_losses = {
        "reconstruction": float(recon),
        "depth": float(depth_l),
        "ambient": float(ambient_l),
        "direction": float(dir_l),
        "albedo": float(albedo_l),
        "generator": float(g_adv),
        "discriminator_fake": float(d_fake),
        "discriminator_real": float(d_real),
        "dssim": float(dssim_l),
    }

    # ---- framework side ----
    from geomconsistentfr_tpu import train as train_mod
    from geomconsistentfr_tpu.config import preset_transfer_train
    from geomconsistentfr_tpu.convert import (
        load_relightnet_variables,
        torch_state_to_variables,
    )

    cfg = preset_transfer_train()
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, conv_precision="highest"),
        render=dataclasses.replace(cfg.render, use_pallas_shadows=False),
    )
    state = train_mod.init_state(cfg, jax.random.PRNGKey(0))
    g_vars = load_relightnet_variables(CKPT)
    d_state = {k: v.detach().numpy() for k, v in ref_d.state_dict().items()}
    d_vars = torch_state_to_variables(d_state)
    state = state.replace(
        params_g=jax.tree.map(jnp.asarray, g_vars["params"]),
        batch_stats_g=jax.tree.map(jnp.asarray, g_vars["batch_stats"]),
        params_d=jax.tree.map(jnp.asarray, d_vars["params"]),
        batch_stats_d=jax.tree.map(jnp.asarray, d_vars["batch_stats"]),
    )
    batch = {
        "image": images,
        "face_mask": face_mask,
        "depth_gt": depth_gt,
        "depth_mask": depth_mask,
        "albedo_gt": albedo_gt,
        "light_gt": light_gt,
    }
    step = train_mod.make_single_device_step(cfg)
    _, metrics = step(state, batch, (False, False, False, False))

    for key, want in ref_losses.items():
        got = float(metrics[key])
        assert abs(got - want) < max(2e-3, 5e-3 * abs(want)), (key, got, want)
