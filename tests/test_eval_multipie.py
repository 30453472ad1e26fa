"""End-to-end Multi-PIE eval harness on a synthetic mini dataset (CPU, 64px)."""

import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def fake_eval_data(tmp_path_factory):
    import imageio.v2 as imageio
    import scipy.io

    root = tmp_path_factory.mktemp("mp_eval")
    for d in (
        "input_images_MP_18_lightings",
        "groundtruth_images_MP_18_lightings",
        "MP_depth_masks_fill_nose",
    ):
        os.makedirs(root / d)
    rng = np.random.default_rng(0)
    directions = rng.normal(size=(18, 3))
    directions[:, 2] = np.abs(directions[:, 2]) + 0.3
    directions /= np.linalg.norm(directions, axis=1, keepdims=True)
    scipy.io.savemat(root / "MP_lighting_directions.mat",
                     {"lighting_directions": directions})
    for i in range(2):
        img = rng.integers(0, 256, (64, 64, 3)).astype(np.uint8)
        imageio.imwrite(
            root / "input_images_MP_18_lightings" / f"img{i:03d}.png", img
        )
        # GT filename encodes the 1-based target lighting index.
        imageio.imwrite(
            root / "groundtruth_images_MP_18_lightings" / f"img{i:03d}_{i + 3}.png",
            img,
        )
        mask = np.zeros((64, 64), np.uint8)
        mask[8:56, 8:56] = 255
        imageio.imwrite(root / "MP_depth_masks_fill_nose" / f"img{i:03d}.png", mask)
    return str(root)


def test_run_inference_and_evaluate(fake_eval_data, tmp_path):
    from geomconsistentfr_tpu.config import preset_multipie_eval
    from geomconsistentfr_tpu.infer import Relighter
    from geomconsistentfr_tpu.metrics.eval_multipie import (
        evaluate_output_dir,
        run_inference,
    )
    from geomconsistentfr_tpu.models.relightnet import RelightNet

    cfg = preset_multipie_eval()
    cfg = dataclasses.replace(
        cfg,
        render=dataclasses.replace(
            cfg.render, img_height=64, img_width=64,
            num_sample_points=16, t_stop=0.105, march_chunk=16,
            use_pallas_shadows=False,
        ),
    )
    model = RelightNet(cfg=cfg.model)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    rl = Relighter(cfg, variables)

    out_dir = str(tmp_path / "dump")
    n = run_inference(
        rl,
        input_dir=os.path.join(fake_eval_data, "input_images_MP_18_lightings"),
        gt_dir=os.path.join(fake_eval_data, "groundtruth_images_MP_18_lightings"),
        lighting_mat=os.path.join(fake_eval_data, "MP_lighting_directions.mat"),
        mask_fill_nose_dir=os.path.join(fake_eval_data, "MP_depth_masks_fill_nose"),
        output_dir=out_dir,
    )
    assert n == 2
    files = sorted(os.listdir(out_dir))
    assert len(files) == 12  # six outputs per image (reference convention)
    # 3rd of each sorted 6-file group is the rendered image (stride protocol).
    assert files[2].endswith("_rendered_image.png")
    assert files[8].endswith("_rendered_image.png")

    metrics = evaluate_output_dir(
        out_dir,
        os.path.join(fake_eval_data, "groundtruth_images_MP_18_lightings"),
        os.path.join(fake_eval_data, "MP_depth_masks_fill_nose"),
    )
    assert metrics["num_images"] == 2
    assert 0 <= metrics["masked_dssim_mean"] <= 0.5
    assert metrics["masked_mse_mean"] > 0
    assert np.isfinite(metrics["masked_psnr_mean"])


def test_evaluate_with_real_lpips_metric(fake_eval_data, tmp_path):
    """Full LPIPS path over a real inference dump: random trunk (no
    torchvision in this env) + the reference's bundled lin-heads. The CLI
    reaches this exact code via --lpips-random-trunk / --lpips-trunk."""
    import dataclasses

    from geomconsistentfr_tpu.config import preset_multipie_eval
    from geomconsistentfr_tpu.infer import Relighter
    from geomconsistentfr_tpu.metrics.eval_multipie import (
        evaluate_output_dir,
        run_inference,
    )
    from geomconsistentfr_tpu.models.lpips import LPIPSMetric
    from geomconsistentfr_tpu.models.relightnet import RelightNet

    cfg = preset_multipie_eval()
    cfg = dataclasses.replace(
        cfg,
        render=dataclasses.replace(
            cfg.render, img_height=64, img_width=64,
            num_sample_points=16, t_stop=0.105, march_chunk=16,
            use_pallas_shadows=False,
        ),
    )
    model = RelightNet(cfg=cfg.model)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    rl = Relighter(cfg, variables)

    out_dir = str(tmp_path / "dump")
    run_inference(
        rl,
        input_dir=os.path.join(fake_eval_data, "input_images_MP_18_lightings"),
        gt_dir=os.path.join(fake_eval_data, "groundtruth_images_MP_18_lightings"),
        lighting_mat=os.path.join(fake_eval_data, "MP_lighting_directions.mat"),
        mask_fill_nose_dir=os.path.join(fake_eval_data, "MP_depth_masks_fill_nose"),
        output_dir=out_dir,
    )
    metric = LPIPSMetric(
        lin_weights_path="/root/reference/PerceptualSimilarity/lpips/weights/v0.1/alex.pth",
        allow_random_trunk=True,
    )
    metrics = evaluate_output_dir(
        out_dir,
        os.path.join(fake_eval_data, "groundtruth_images_MP_18_lightings"),
        os.path.join(fake_eval_data, "MP_depth_masks_fill_nose"),
        lpips_fn=metric,
    )
    assert "masked_lpips_mean" in metrics and "masked_lpips_std" in metrics
    assert np.isfinite(metrics["masked_lpips_mean"])
    assert metrics["masked_lpips_mean"] >= 0


def test_run_inference_rejects_mispaired_triples(fake_eval_data, tmp_path):
    """A stray file in the mask directory must raise at inference time (the
    reference's positional zip would silently shift every later lighting)."""
    import shutil

    from geomconsistentfr_tpu.metrics.eval_multipie import run_inference

    root = str(tmp_path / "skewed")
    shutil.copytree(fake_eval_data, root)
    mask_dir = os.path.join(root, "MP_depth_masks_fill_nose")
    first = sorted(os.listdir(mask_dir))[0]
    # Duplicate the first mask under a name that sorts before everything,
    # shifting the positional pairing by one.
    shutil.copy(
        os.path.join(mask_dir, first), os.path.join(mask_dir, "aaa_stray999.png")
    )
    # Match counts so only the id check can catch it.
    extra = np.zeros((64, 64, 3), np.uint8)
    import imageio.v2 as imageio

    imageio.imwrite(
        os.path.join(root, "input_images_MP_18_lightings", "img998.png"), extra
    )
    imageio.imwrite(
        os.path.join(root, "groundtruth_images_MP_18_lightings", "img998_4.png"),
        extra,
    )

    with pytest.raises(ValueError, match="mispaired"):
        run_inference(
            relighter=None,  # must raise before any device work
            input_dir=os.path.join(root, "input_images_MP_18_lightings"),
            gt_dir=os.path.join(root, "groundtruth_images_MP_18_lightings"),
            lighting_mat=os.path.join(root, "MP_lighting_directions.mat"),
            mask_fill_nose_dir=os.path.join(root, "MP_depth_masks_fill_nose"),
            output_dir=str(tmp_path / "out"),
        )


def test_run_inference_rejects_count_mismatch(fake_eval_data, tmp_path):
    from geomconsistentfr_tpu.metrics.eval_multipie import run_inference

    import shutil

    root = str(tmp_path / "short")
    shutil.copytree(fake_eval_data, root)
    mask_dir = os.path.join(root, "MP_depth_masks_fill_nose")
    os.remove(os.path.join(mask_dir, sorted(os.listdir(mask_dir))[0]))
    with pytest.raises(ValueError, match="count mismatch"):
        run_inference(
            relighter=None,
            input_dir=os.path.join(root, "input_images_MP_18_lightings"),
            gt_dir=os.path.join(root, "groundtruth_images_MP_18_lightings"),
            lighting_mat=os.path.join(root, "MP_lighting_directions.mat"),
            mask_fill_nose_dir=os.path.join(root, "MP_depth_masks_fill_nose"),
            output_dir=str(tmp_path / "out"),
        )


def test_run_inference_data_parallel_matches_single_device(fake_eval_data, tmp_path):
    """run_inference over a mesh-sharded Relighter writes the same PNGs."""
    import imageio.v2 as imageio

    from geomconsistentfr_tpu.config import preset_multipie_eval
    from geomconsistentfr_tpu.infer import Relighter
    from geomconsistentfr_tpu.metrics.eval_multipie import run_inference
    from geomconsistentfr_tpu.models.relightnet import RelightNet
    from geomconsistentfr_tpu.parallel.mesh import make_mesh

    cfg = preset_multipie_eval()
    cfg = dataclasses.replace(
        cfg,
        render=dataclasses.replace(
            cfg.render, img_height=64, img_width=64,
            num_sample_points=16, t_stop=0.105, march_chunk=16,
            use_pallas_shadows=False,
        ),
    )
    model = RelightNet(cfg=cfg.model)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    mesh = make_mesh()

    kwargs = dict(
        input_dir=os.path.join(fake_eval_data, "input_images_MP_18_lightings"),
        gt_dir=os.path.join(fake_eval_data, "groundtruth_images_MP_18_lightings"),
        lighting_mat=os.path.join(fake_eval_data, "MP_lighting_directions.mat"),
        mask_fill_nose_dir=os.path.join(fake_eval_data, "MP_depth_masks_fill_nose"),
        batch_size=mesh.size,  # 2 images pad up to one mesh-wide batch
    )
    a_dir, b_dir = str(tmp_path / "single"), str(tmp_path / "dp")
    run_inference(Relighter(cfg, variables), output_dir=a_dir, **kwargs)
    run_inference(Relighter(cfg, variables, mesh=mesh), output_dir=b_dir, **kwargs)

    files = sorted(os.listdir(a_dir))
    assert files == sorted(os.listdir(b_dir)) and len(files) == 12
    for name in files:
        a = imageio.imread(os.path.join(a_dir, name)).astype(np.int16)
        b = imageio.imread(os.path.join(b_dir, name)).astype(np.int16)
        assert np.abs(a - b).max() <= 1, name


def test_eval_only_rescore_cli(fake_eval_data, tmp_path):
    """eval-multipie --eval-only re-scores an existing dump without loading
    the checkpoint or touching the device."""
    import json
    import subprocess
    import sys

    # Produce a dump via the library (tiny model).
    from geomconsistentfr_tpu.config import preset_multipie_eval
    from geomconsistentfr_tpu.infer import Relighter
    from geomconsistentfr_tpu.metrics.eval_multipie import run_inference
    from geomconsistentfr_tpu.models.relightnet import RelightNet

    cfg = preset_multipie_eval()
    cfg = dataclasses.replace(
        cfg,
        render=dataclasses.replace(
            cfg.render, img_height=64, img_width=64,
            num_sample_points=16, t_stop=0.105, march_chunk=16,
            use_pallas_shadows=False,
        ),
    )
    model = RelightNet(cfg=cfg.model)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    out_dir = str(tmp_path / "dump")
    run_inference(
        Relighter(cfg, variables),
        input_dir=os.path.join(fake_eval_data, "input_images_MP_18_lightings"),
        gt_dir=os.path.join(fake_eval_data, "groundtruth_images_MP_18_lightings"),
        lighting_mat=os.path.join(fake_eval_data, "MP_lighting_directions.mat"),
        mask_fill_nose_dir=os.path.join(fake_eval_data, "MP_depth_masks_fill_nose"),
        output_dir=out_dir,
    )

    r = subprocess.run(
        [sys.executable, "-m", "geomconsistentfr_tpu.cli", "eval-multipie",
         "--checkpoint", "/nonexistent/never_loaded.pth",
         "--data-root", fake_eval_data, "--out", out_dir, "--eval-only"],
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": ""},
    )
    assert r.returncode == 0, r.stderr
    metrics = json.loads(r.stdout.strip().splitlines()[-1])
    assert metrics["num_images"] == 2 and metrics["num_inferred"] == 0
