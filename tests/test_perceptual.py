"""Perceptual-metric extras and LPIPS architecture tests."""

import numpy as np
import pytest

from geomconsistentfr_tpu.metrics.perceptual import (
    dssim_distance,
    l2_distance,
    score_2afc,
    score_jnd,
    write_html_gallery,
)


def test_l2_and_dssim_distances():
    rng = np.random.default_rng(0)
    x = rng.uniform(size=(16, 16, 3))
    assert l2_distance(x, x) == 0.0
    assert dssim_distance(x, x) < 1e-9
    y = np.clip(x + 0.2 * rng.normal(size=x.shape), 0, 1)
    assert l2_distance(x, y) > 0
    assert dssim_distance(x, y) > 0


def test_score_2afc():
    rng = np.random.default_rng(1)
    ref = [rng.uniform(size=(8, 8, 3)) for _ in range(4)]
    p0 = [np.clip(r + 0.01 * rng.normal(size=r.shape), 0, 1) for r in ref]  # close
    p1 = [rng.uniform(size=(8, 8, 3)) for _ in ref]                          # far
    # all judges prefer p0 (judge=0 -> humans chose p0)
    score = score_2afc(ref, p0, p1, [0.0] * 4, l2_distance)
    assert score == 1.0
    # inverted judgements score 0
    assert score_2afc(ref, p0, p1, [1.0] * 4, l2_distance) == 0.0


def test_score_jnd_perfect_separation():
    rng = np.random.default_rng(2)
    base = [rng.uniform(size=(8, 8, 3)) for _ in range(6)]
    pairs0 = base
    pairs1 = [
        b if i < 3 else np.clip(b + 0.5 * rng.normal(size=b.shape), 0, 1)
        for i, b in enumerate(base)
    ]
    same = [1.0, 1.0, 1.0, 0.0, 0.0, 0.0]
    ap = score_jnd(pairs0, pairs1, same, l2_distance)
    assert ap == pytest.approx(1.0)


def test_html_gallery(tmp_path):
    import imageio.v2 as imageio

    img = (np.random.default_rng(3).uniform(size=(8, 8, 3)) * 255).astype(np.uint8)
    p = tmp_path / "img.png"
    imageio.imwrite(p, img)
    out = tmp_path / "index.html"
    write_html_gallery(str(out), [{"id": "a", "img": str(p)}], title="t")
    html = out.read_text()
    assert "<img" in html and "img.png" in html


def test_lpips_architecture_shapes():
    """Random-trunk smoke: spatial map shape and non-negativity structure."""
    from geomconsistentfr_tpu.models.lpips import LPIPSMetric

    metric = LPIPSMetric(
        lin_weights_path="/root/reference/PerceptualSimilarity/lpips/weights/v0.1/alex.pth",
        allow_random_trunk=True,
    )
    rng = np.random.default_rng(4)
    a = rng.uniform(size=(64, 64, 3)).astype(np.float32)
    b = rng.uniform(size=(64, 64, 3)).astype(np.float32)
    d = metric(a, b)
    assert d.shape == (64, 64)
    assert np.isfinite(d).all()
    d0 = metric(a, a)
    assert abs(d0).max() < 1e-5  # identical inputs -> zero distance


def test_lpips_requires_trunk_by_default():
    from geomconsistentfr_tpu.models.lpips import LPIPSMetric

    with pytest.raises(RuntimeError, match="trunk"):
        LPIPSMetric()


def test_crop_geometry():
    from geomconsistentfr_tpu.preprocess import crop_face

    img = np.zeros((600, 600, 3), np.uint8)
    img[300, 300] = 255  # marker at the box centre
    # 250x280 box centred at (300, 300+...)
    out = crop_face(img, (175.0, 160.0, 425.0, 440.0))
    assert out is not None and out.shape == (256, 256, 3)
    # Too-small faces are skipped (reference :38-39).
    assert crop_face(img, (0, 0, 100, 150)) is None


@pytest.mark.parametrize("net", ["alex", "vgg", "squeeze"])
def test_lpips_matches_torch_transcription_oracle(net):
    """Flax LPIPS == reference-formula torch oracle with shared weights.

    Validates the scaling layer, conv/pool geometry (incl. squeezenet's
    ceil-mode pools and fire modules), unit-L2 normalisation (eps 1e-10),
    squared diff, the bundled 1x1 lin heads (5 for alex/vgg, 7 for squeeze),
    and the align_corners=False bilinear spatial upsample against
    lpips/lpips.py:22-241 + pretrained_networks.py:1-180 semantics, for all
    three trunks."""
    import jax

    from geomconsistentfr_tpu.models.lpips import LPIPSMetric
    from tests.oracles.lpips_torch_oracle import lpips_spatial_torch

    metric = LPIPSMetric(net=net, allow_random_trunk=True)
    params = metric._variables["params"]
    trunk = jax.tree.map(np.asarray, dict(params["trunk"]))
    lins = {k: jax.tree.map(np.asarray, dict(v))
            for k, v in params.items() if k.startswith("lin")}
    assert len(lins) == (7 if net == "squeeze" else 5)

    rng = np.random.default_rng(11)
    a = rng.uniform(size=(64, 64, 3)).astype(np.float32)
    b = np.clip(a + 0.1 * rng.normal(size=a.shape), 0, 1).astype(np.float32)

    got = metric(a, b)
    want = lpips_spatial_torch(a, b, trunk, lins, net=net)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-5)


def test_evaluate_output_dir_lpips_path(tmp_path):
    """Full harness LPIPS branch: masked mean with the reference's
    strictly-positive denominator (test_network.py:46-48)."""
    import imageio.v2 as imageio

    from geomconsistentfr_tpu.metrics.eval_multipie import evaluate_output_dir

    out_dir = tmp_path / "dump"; out_dir.mkdir()
    gt_dir = tmp_path / "gt"; gt_dir.mkdir()
    mask_dir = tmp_path / "mask"; mask_dir.mkdir()
    rng = np.random.default_rng(5)
    img = (rng.uniform(size=(32, 32, 3)) * 255).astype(np.uint8)
    suffixes = ["albedo", "depth", "rendered_image", "shading",
                "shadow_mask", "surface_normals"]
    for s in suffixes:
        imageio.imwrite(out_dir / f"img001_{s}.png", img)
    imageio.imwrite(gt_dir / "img001_07.png", img)
    mask = np.zeros((32, 32), np.uint8)
    mask[4:20, 4:20] = 255
    imageio.imwrite(mask_dir / "img001.png", mask)

    # Distance map with zeros inside the mask: the reference divides by the
    # count of strictly-positive masked products, not by the mask area.
    dist = np.zeros((32, 32), np.float32)
    dist[4:12, 4:12] = 2.0  # 64 positive pixels inside the 256-pixel mask

    metrics = evaluate_output_dir(
        str(out_dir), str(gt_dir), str(mask_dir), lpips_fn=lambda g, p: dist
    )
    assert metrics["masked_lpips_mean"] == pytest.approx(2.0)  # 128/64, not 128/256
    assert metrics["masked_lpips_std"] == pytest.approx(0.0)


def test_evaluate_output_dir_rejects_mispaired_triples(tmp_path):
    """A stray/renamed file must raise, not silently mispair (VERDICT weak #6)."""
    import imageio.v2 as imageio

    from geomconsistentfr_tpu.metrics.eval_multipie import evaluate_output_dir

    out_dir = tmp_path / "dump"; out_dir.mkdir()
    gt_dir = tmp_path / "gt"; gt_dir.mkdir()
    mask_dir = tmp_path / "mask"; mask_dir.mkdir()
    img = np.zeros((16, 16, 3), np.uint8)
    suffixes = ["albedo", "depth", "rendered_image", "shading",
                "shadow_mask", "surface_normals"]
    for stem in ("img001", "img002"):
        for s in suffixes:
            imageio.imwrite(out_dir / f"{stem}_{s}.png", img)
        imageio.imwrite(mask_dir / f"{stem}.png", img[..., 0])
    imageio.imwrite(gt_dir / "img001_03.png", img)
    imageio.imwrite(gt_dir / "img004_05.png", img)  # renamed GT -> id mismatch

    with pytest.raises(ValueError, match="mispaired"):
        evaluate_output_dir(str(out_dir), str(gt_dir), str(mask_dir))

    # A stray non-output file must not shift the 6-stride pairing.
    imageio.imwrite(gt_dir / "img004_05.png", img)  # keep counts equal
    os_err = None
    (out_dir / "aaa_montage.png").write_bytes((out_dir / "img001_albedo.png").read_bytes())
    try:
        evaluate_output_dir(str(out_dir), str(gt_dir), str(mask_dir))
    except ValueError as e:
        os_err = e
    assert os_err is not None  # still flags the renamed GT, not a stride shift


def test_dist2logit_matches_reference_formula():
    """Dist2Logit == a numpy transcription of lpips.py:169-184 with shared
    weights (feature order d0,d1,d0-d1,d0/(d1+.1),d1/(d0+.1); LReLU 0.2)."""
    import jax
    import jax.numpy as jnp

    from geomconsistentfr_tpu.metrics.lpips_train import Dist2Logit

    net = Dist2Logit()
    rng = np.random.default_rng(3)
    d0 = jnp.asarray(rng.uniform(0.01, 1.0, (6,)).astype(np.float32))
    d1 = jnp.asarray(rng.uniform(0.01, 1.0, (6,)).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), d0, d1)["params"]
    got = np.asarray(net.apply({"params": params}, d0, d1))

    def np_conv1x1(x, kernel, bias):  # x: (B, C); kernel: (1,1,C,O)
        return x @ np.asarray(kernel)[0, 0] + np.asarray(bias)

    def lrelu(x):
        return np.where(x > 0, x, 0.2 * x)

    d0n, d1n = np.asarray(d0), np.asarray(d1)
    feats = np.stack(
        [d0n, d1n, d0n - d1n, d0n / (d1n + 0.1), d1n / (d0n + 0.1)], axis=-1
    )
    h = lrelu(np_conv1x1(feats, params["fc0"]["kernel"], params["fc0"]["bias"]))
    h = lrelu(np_conv1x1(h, params["fc1"]["kernel"], params["fc1"]["bias"]))
    logit = np_conv1x1(h, params["fc2"]["kernel"], params["fc2"]["bias"])[:, 0]
    want = 1.0 / (1.0 + np.exp(-logit))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_2afc_trainer_learns_and_clamps():
    """A few optimisation steps on separable synthetic 2AFC triples: the
    ranking loss decreases, accuracy reaches 1.0 on the (easy) data, and the
    lin-head kernels stay >= 0 (reference clamp_weights semantics)."""
    import jax

    from geomconsistentfr_tpu.metrics.lpips_train import (
        LPIPS2AFCTrainer,
        compute_accuracy,
    )

    rng = np.random.default_rng(7)
    b = 4
    ref = rng.uniform(0.2, 0.8, (b, 64, 64, 3)).astype(np.float32)
    p0 = np.clip(ref + 0.01 * rng.normal(size=ref.shape), 0, 1).astype(np.float32)
    p1 = rng.uniform(size=ref.shape).astype(np.float32)
    judge = np.zeros((b,), np.float32)  # humans prefer p0 (judge = frac for p1)
    batch = {"ref": ref, "p0": p0, "p1": p1, "judge": judge}

    trainer = LPIPS2AFCTrainer(allow_random_trunk=True, lr=3e-3, seed=1)
    losses = [trainer.train_step(batch)["loss_total"] for _ in range(40)]
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.2 * losses[0], (losses[0], losses[-1])

    ev = trainer.evaluate(batch)
    assert ev["acc_r"] == 1.0  # metric orders the easy pairs correctly
    for leaf in jax.tree.leaves(trainer.params["lin"]):
        assert np.asarray(leaf).min() >= 0.0

    # accuracy formula parity (trainer.py:138-142)
    a = compute_accuracy(
        np.asarray([0.2, 0.9]), np.asarray([0.5, 0.1]), np.asarray([0.0, 1.0])
    )
    assert float(a) == 1.0


def test_2afc_trainer_net_selection_and_lin_roundtrip(tmp_path):
    """Trainer supports vgg/squeeze trunks; trained lin heads export in the
    reference .pth/.npz layout and round-trip into LPIPSMetric."""
    import numpy as np

    from geomconsistentfr_tpu.metrics.lpips_train import LPIPS2AFCTrainer
    from geomconsistentfr_tpu.models.lpips import LPIPSMetric, load_lin_weights

    trainer = LPIPS2AFCTrainer(allow_random_trunk=True, net="squeeze", seed=2)
    assert len(trainer.params["lin"]) == 7  # squeeze has 7 taps

    rng = np.random.default_rng(8)
    ref = rng.uniform(0.2, 0.8, (2, 64, 64, 3)).astype(np.float32)
    batch = {
        "ref": ref,
        "p0": np.clip(ref + 0.01 * rng.normal(size=ref.shape), 0, 1).astype(np.float32),
        "p1": rng.uniform(size=ref.shape).astype(np.float32),
        "judge": np.zeros((2,), np.float32),
    }
    trainer.train_step(batch)

    for ext in ("pth", "npz"):
        path = str(tmp_path / f"lins.{ext}")
        trainer.save_lin_weights(path)
        loaded = load_lin_weights(path)
        assert set(loaded) == set(trainer.params["lin"])
        for k in loaded:
            np.testing.assert_allclose(
                loaded[k]["kernel"], np.asarray(trainer.params["lin"][k]["kernel"])
            )
    # Round-trips into the metric (squeeze arch accepts the 7 heads).
    metric = LPIPSMetric(
        net="squeeze", lin_weights_path=str(tmp_path / "lins.npz"),
        allow_random_trunk=True,
    )
    d = metric(ref[0], batch["p1"][0])
    assert np.isfinite(d).all()


def test_2afc_trainer_lr_decay():
    """update_learning_rate parity (trainer.py:189-197): linear decay by
    initial_lr/nepoch_decay per call."""
    from geomconsistentfr_tpu.metrics.lpips_train import LPIPS2AFCTrainer

    trainer = LPIPS2AFCTrainer(allow_random_trunk=True, lr=1e-3, seed=0)
    assert trainer.decay_learning_rate(10) == pytest.approx(9e-4)
    assert trainer.decay_learning_rate(10) == pytest.approx(8e-4)


def test_lpips_delta_artifact_protocol(tmp_path):
    """CI-sized version of tools/lpips_delta.py: the eval harness's masked
    LPIPS (>0 denominator) agrees with the torch transcription to < 1e-3
    per image under shared trunk weights + reference lin heads."""
    import imageio.v2 as imageio
    import jax

    from geomconsistentfr_tpu.metrics.eval_multipie import evaluate_output_dir
    from geomconsistentfr_tpu.models.lpips import LPIPSMetric
    from tests.oracles.lpips_torch_oracle import lpips_spatial_torch
    from tools.lpips_delta import build_protocol_dump

    rng = np.random.default_rng(5)
    out_dir, gt_dir, mask_dir = build_protocol_dump(str(tmp_path), 2, rng)
    metric = LPIPSMetric(net="alex", allow_random_trunk=True)
    harness = evaluate_output_dir(out_dir, gt_dir, mask_dir, lpips_fn=metric)

    params = metric._variables["params"]
    trunk = jax.tree.map(np.asarray, dict(params["trunk"]))
    lins = {k: jax.tree.map(np.asarray, dict(v))
            for k, v in params.items() if k.startswith("lin")}
    import os as _os
    torch_means = []
    for pred_name, gt_name, mask_name in zip(
        sorted(f for f in _os.listdir(out_dir) if "_rendered_image" in f),
        sorted(_os.listdir(gt_dir)),
        sorted(_os.listdir(mask_dir)),
    ):
        pred = np.asarray(imageio.imread(f"{out_dir}/{pred_name}"), np.float64) / 255
        gt = np.asarray(imageio.imread(f"{gt_dir}/{gt_name}"), np.float64) / 255
        mask = np.asarray(imageio.imread(f"{mask_dir}/{mask_name}"), np.float64) / 255
        d = lpips_spatial_torch(gt.astype(np.float32), pred.astype(np.float32),
                                trunk, lins, net="alex")
        torch_means.append(float(np.sum(mask * d)) / max(float(np.sum((mask * d) > 0)), 1.0))
    assert abs(harness["masked_lpips_mean"] - float(np.mean(torch_means))) < 1e-3
