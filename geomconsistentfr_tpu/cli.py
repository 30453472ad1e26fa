"""Command-line interface: one tool replacing the reference's five scripts.

  relight        test_relight_single_image.py        (target light, 1 image)
  sweep          18-light relight of one image (vmapped renderer)
  transfer       test_relight_single_image_lighting_transfer.py (2-pass)
  eval-multipie  test_raytracing_relighting_CelebAHQ_DSSIM_8x.py + the MATLAB
                 DSSIM/MSE and LPIPS harnesses, in one command
  train          train_raytracing_relighting_CelebAHQ_DSSIM_8x.py /
                 train_lighting_transfer.py
  convert        reference .pth -> orbax checkpoint
  fix-border     fix_border_artifacts_CVPR2022.m
  build-cache    pack the reference MP_data layout into streaming memmaps

Unlike the reference (constants hard-coded in class bodies; see config.py),
every behavioural constant is a preset or flag.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _add_common_model_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--checkpoint", required=True, help=".pth file or orbax dir")
    p.add_argument(
        "--preset",
        default=None,
        help="pipeline preset (default: inferred per command)",
    )
    p.add_argument(
        "--config",
        default=None,
        help="JSON file with (partial) PipelineConfig overrides on the preset",
    )
    p.add_argument("--out", default="outputs", help="output directory")
    p.add_argument(
        "--precision",
        choices=["strict", "high", "fast", "draft"],
        default=None,
        help="serving precision tier: 'strict' = true-f32 shadow matmuls + "
        "f32 CNN (bit-close parity, the parity-suite mode); 'high' = "
        "bf16x3-split shadow matmuls + f32 CNN (matches strict on every "
        "golden fixture at +12%% throughput, docs/PARITY_matrix.json); "
        "'fast' = bf16 CNN + single-pass bf16 matmuls + bilinear veto (max "
        "throughput, golden parity >=46 dB); 'draft' = fast plus a "
        "quarter-resolution shadow march with a full-resolution boundary "
        "refine (preview grade, worst golden fixture >=45 dB visible). "
        "Default: high (strict when --config is given, so explicit "
        "precision overrides are honoured).",
    )
    p.add_argument(
        "--fast",
        action="store_true",
        help="alias for --precision fast",
    )
    p.add_argument(
        "--sample-parallel",
        action="store_true",
        help="latency parallelism: shard the shadow march's sample grid "
        "across all visible chips (pmin combine over ICI; outputs identical "
        "to single-chip). The right axis when the batch is small — single "
        "images, the 18-light sweep. Any batch size works.",
    )


def _relighter(args, default_preset: str):
    from geomconsistentfr_tpu.config import PRESETS, apply_precision_tier, load_config
    from geomconsistentfr_tpu.infer import load_relighter

    preset = args.preset or default_preset
    if getattr(args, "config", None):
        cfg = load_config(args.config, preset=preset)
    else:
        cfg = PRESETS[preset]()
    tier = getattr(args, "precision", None)
    if getattr(args, "fast", False):
        if tier and tier != "fast":
            raise SystemExit("--fast conflicts with --precision " + tier)
        tier = "fast"
    if tier is None and not getattr(args, "config", None):
        # Default serving tier: 'high' matches strict parity on every golden
        # fixture at +12% throughput (docs/BENCH_r04_high.json). When a
        # --config file is given, leave its precision fields untouched.
        tier = "high"
    if tier:
        cfg = apply_precision_tier(cfg, tier)
    mesh = None
    parallel = "data"
    if getattr(args, "data_parallel", False) and getattr(
        args, "sample_parallel", False
    ):
        raise SystemExit("--data-parallel conflicts with --sample-parallel")
    if getattr(args, "data_parallel", False) or getattr(
        args, "sample_parallel", False
    ):
        from geomconsistentfr_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
        if getattr(args, "sample_parallel", False):
            parallel = "samples"
    return load_relighter(args.checkpoint, cfg=cfg, mesh=mesh, parallel=parallel)


def _parse_light(args):
    import numpy as np

    from geomconsistentfr_tpu.lighting_presets import DEFAULT_AMBIENT, LIGHT_PRESETS

    if args.light_preset:
        direction = LIGHT_PRESETS[args.light_preset]
    else:
        direction = tuple(float(v) for v in args.light.split(","))
        assert len(direction) == 3, "--light expects lx,ly,lz"
    ambient = args.ambient if args.ambient is not None else DEFAULT_AMBIENT
    return np.asarray([direction], np.float32), np.asarray([ambient], np.float32)


def cmd_relight(args) -> int:
    import numpy as np

    from geomconsistentfr_tpu.utils.io import (
        read_image,
        read_mask,
        save_visual_pack,
        write_image,
    )

    rl = _relighter(args, "single_image")
    img = read_image(args.image)
    mask = read_mask(args.mask)
    light, ambient = _parse_light(args)
    pack = np.asarray(
        rl.forward_visuals(
            img[None], mask[None], target_light=light, target_ambient=ambient
        )
    )[0]
    stem = os.path.splitext(os.path.basename(args.image))[0]
    paths = save_visual_pack(args.out, stem, pack)
    # pack[..., 0:3] is rendered*mask quantized on device; composite pastes it
    # into the original where the mask is nonzero (reference :618-619).
    mask3 = np.repeat(mask[..., None], 3, axis=-1)
    composited = np.where(mask3 > 0, pack[..., 0:3] / 255.0, img)
    if args.fix_border:
        from geomconsistentfr_tpu.postprocess import fix_border_artifacts

        composited = fix_border_artifacts(composited, mask)
    write_image(os.path.join(args.out, f"{stem}_composited.png"), composited)
    print(json.dumps({"outputs": paths, "composited": f"{stem}_composited.png"}))
    return 0


def cmd_sweep(args) -> int:
    import numpy as np

    from geomconsistentfr_tpu.lighting_presets import DEFAULT_AMBIENT, LIGHT_PRESETS
    from geomconsistentfr_tpu.utils.io import read_image, read_mask, write_image_u8

    rl = _relighter(args, "single_image")
    img = read_image(args.image)
    mask = read_mask(args.mask)
    names = list(LIGHT_PRESETS)
    lights = np.asarray([LIGHT_PRESETS[n] for n in names], np.float32)
    ambients = np.full((len(names),), DEFAULT_AMBIENT, np.float32)
    # Masked uint8 renders quantized on device: one small fetch for all L.
    tiles = np.asarray(rl.relight_sweep_rendered_u8(img, mask, lights, ambients))
    stem = os.path.splitext(os.path.basename(args.image))[0]
    for i, name in enumerate(names):
        write_image_u8(os.path.join(args.out, f"{stem}_{name}.png"), tiles[i])
    # Contact-sheet montage of the whole sweep.
    cols = 4
    rows = -(-len(tiles) // cols)
    h, w = tiles.shape[1:3]
    sheet = np.zeros((rows * h, cols * w, 3), np.uint8)
    for i in range(len(names)):
        r, c = divmod(i, cols)
        sheet[r * h : (r + 1) * h, c * w : (c + 1) * w] = tiles[i]
    write_image_u8(os.path.join(args.out, f"{stem}_sweep_montage.png"), sheet)
    print(json.dumps({"num_lights": len(names), "out": args.out,
                      "montage": f"{stem}_sweep_montage.png"}))
    return 0


def cmd_transfer(args) -> int:
    import numpy as np

    from geomconsistentfr_tpu.utils.io import read_image, read_mask, save_visual_pack

    rl = _relighter(args, "lighting_transfer")
    img = read_image(args.input)
    ref = read_image(args.reference)
    mask = read_mask(args.mask)
    # 2-pass: estimate from the reference, then one packed-uint8 fetch of the
    # six dump outputs (4x fewer device->host bytes than f32 RenderOutputs).
    unit, ambient = rl.estimate_lighting(ref[None])
    pack = np.asarray(
        rl.forward_visuals(
            img[None], mask[None],
            target_light=np.asarray(unit, np.float32),
            target_ambient=np.asarray(ambient, np.float32),
        )
    )[0]
    stem = os.path.splitext(os.path.basename(args.input))[0]
    paths = save_visual_pack(args.out, stem, pack)
    print(json.dumps({
        "outputs": paths,
        "estimated_direction": [float(v) for v in unit[0]],
        "estimated_ambient": float(ambient[0]),
    }))
    return 0


def cmd_eval_multipie(args) -> int:
    from geomconsistentfr_tpu.metrics.eval_multipie import (
        evaluate_output_dir,
        run_inference,
    )

    lpips_fn = None
    if args.lpips_trunk or args.lpips_random_trunk:
        from geomconsistentfr_tpu.models.lpips import LPIPSMetric, load_trunk_state

        trunk = (
            load_trunk_state(args.lpips_trunk, net=args.lpips_net)
            if args.lpips_trunk
            else None
        )
        lpips_fn = LPIPSMetric(
            lin_weights_path=args.lpips_lin,
            trunk_state=trunk,
            allow_random_trunk=args.lpips_random_trunk,
            net=args.lpips_net,
        )
    else:
        print(
            "note: LPIPS skipped — no trunk weights supplied "
            "(pass --lpips-trunk <torchvision .pth/.npz>); reporting "
            "masked MSE/DSSIM/PSNR only",
            file=sys.stderr,
        )

    root = args.data_root
    if args.eval_only:
        # Re-score an existing dump (e.g. with a different LPIPS net)
        # without touching the device.
        n = 0
    else:
        rl = _relighter(args, "multipie_eval")
        n = run_inference(
            rl,
            input_dir=os.path.join(root, "input_images_MP_18_lightings"),
            gt_dir=os.path.join(root, "groundtruth_images_MP_18_lightings"),
            lighting_mat=os.path.join(root, "MP_lighting_directions.mat"),
            mask_fill_nose_dir=os.path.join(root, "MP_depth_masks_fill_nose"),
            output_dir=args.out,
            limit=args.limit,
            batch_size=args.batch_size,
        )
    metrics = evaluate_output_dir(
        args.out,
        os.path.join(root, "groundtruth_images_MP_18_lightings"),
        os.path.join(root, "MP_depth_masks_fill_nose"),
        lpips_fn=lpips_fn,
    )
    metrics["num_inferred"] = n
    print(json.dumps(metrics))
    return 0


def cmd_train(args) -> int:
    import numpy as np

    from geomconsistentfr_tpu.config import PRESETS, load_config
    from geomconsistentfr_tpu.train import Trainer

    preset = args.preset or "target_lighting_train"
    if args.config:
        cfg = load_config(args.config, preset=preset)
    else:
        cfg = PRESETS[preset]()
    if getattr(args, "precision", None):
        from geomconsistentfr_tpu.config import apply_precision_tier

        cfg = apply_precision_tier(cfg, args.precision)
    if args.debug_nans:
        from geomconsistentfr_tpu.utils.profiling import debug_nans

        debug_nans(True)
    if args.data == "synthetic":
        from geomconsistentfr_tpu.data import SyntheticFaceData

        data = SyntheticFaceData(
            num_samples=args.synthetic_samples, size=cfg.render.img_height
        )
    else:
        from geomconsistentfr_tpu.data import CelebAHQRelightingData

        data = CelebAHQRelightingData(args.data)
    trainer = Trainer(cfg, data=data, workdir=args.out, profile=args.profile)
    state = trainer.init_or_resume()
    # Per-epoch (seed, epoch)-derived shuffles inside run_epoch make a
    # resumed run replay the uninterrupted batch order exactly; a mid-epoch
    # step checkpoint resumes inside its epoch (the already-trained head of
    # the shuffle is skipped, never re-trained).
    start_epoch, start_batch = divmod(
        int(state.step), cfg.train.batches_per_epoch
    )
    for epoch in range(start_epoch, args.epochs):
        state, metrics = trainer.run_epoch(state, epoch, start_batch=start_batch)
        start_batch = 0
        trainer.save(state)
        if args.visualize_every and (epoch + 1) % args.visualize_every == 0:
            metrics["visuals"] = trainer.visualize(state, epoch)
        print(json.dumps(metrics))
    return 0


def cmd_convert(args) -> int:
    import jax

    from geomconsistentfr_tpu.convert import load_relightnet_variables
    from geomconsistentfr_tpu.utils.checkpoint import save_variables

    variables = load_relightnet_variables(args.pth)
    save_variables(args.out, variables)
    n = sum(x.size for x in jax.tree.leaves(variables))
    print(json.dumps({"out": args.out, "num_values": int(n)}))
    return 0


def cmd_fix_border(args) -> int:
    import imageio.v2 as imageio
    import numpy as np

    from geomconsistentfr_tpu.postprocess import fix_border_artifacts
    from geomconsistentfr_tpu.utils.io import read_mask

    img = np.asarray(imageio.imread(args.image))
    mask = read_mask(args.mask, size=img.shape[0])
    fixed = fix_border_artifacts(img, mask)
    out = args.out_image or args.image
    imageio.imwrite(out, fixed.astype(np.uint8))
    print(json.dumps({"out": out}))
    return 0


def cmd_crop(args) -> int:
    """Face-crop preprocessing (reference recrop_CelebA-HQ_images.py geometry)."""
    import imageio.v2 as imageio
    import numpy as np

    from geomconsistentfr_tpu.preprocess import (
        box_from_mask,
        crop_face,
        detect_faces_s3fd,
        detect_faces_sfd,
    )

    img = np.asarray(imageio.imread(args.image))
    if args.box:
        box = tuple(float(v) for v in args.box.split(","))
        assert len(box) == 4, "--box expects x1,y1,x2,y2"
    elif args.mask:
        box = box_from_mask(np.asarray(imageio.imread(args.mask)))
    else:
        if args.s3fd_weights:
            detections = detect_faces_s3fd(
                img, weights_path=args.s3fd_weights
            )
        else:
            detections = detect_faces_sfd(img)
        if not len(detections):
            print(json.dumps({"error": "no face detected"}))
            return 1
        box = tuple(detections[0][:4])
    crop = crop_face(img, box)
    if crop is None:
        print(json.dumps({"error": "face below 200px minimum"}))
        return 1
    imageio.imwrite(args.out_image, np.asarray(crop, np.uint8))
    print(json.dumps({"out": args.out_image}))
    return 0


def cmd_build_cache(args) -> int:
    from geomconsistentfr_tpu.data import build_cache

    n = build_cache(args.src, args.out, limit=args.limit)
    print(json.dumps({"num_samples": n, "cache": args.out}))
    return 0


def cmd_config(args) -> int:
    """Print the fully-resolved pipeline config as JSON (reproducibility:
    the exact constants a preset + overrides resolve to, reusable as a
    --config file)."""
    import dataclasses

    from geomconsistentfr_tpu.config import PRESETS, load_config

    if args.config:
        cfg = load_config(args.config, preset=args.preset)
    else:
        cfg = PRESETS[args.preset]()
    print(json.dumps(dataclasses.asdict(cfg), indent=2, default=str))
    return 0


def cmd_lpips_train(args) -> int:
    """Train LPIPS linear heads + ranking net on a BAPPS-style 2AFC directory.

    Counterpart of the vendored library's training mode
    (PerceptualSimilarity/lpips/trainer.py + scripts/train_test_metric.sh:
    nepoch regular epochs then nepoch_decay epochs of linear LR decay),
    driving data/bapps.TwoAFCDirectory into metrics/lpips_train.
    """
    import numpy as np

    from geomconsistentfr_tpu.data.bapps import TwoAFCDirectory
    from geomconsistentfr_tpu.metrics.lpips_train import LPIPS2AFCTrainer

    trunk = None
    if args.trunk:
        from geomconsistentfr_tpu.models.lpips import load_trunk_state

        trunk = load_trunk_state(args.trunk, net=args.net)
    trainer = LPIPS2AFCTrainer(
        trunk_state=trunk,
        allow_random_trunk=args.random_trunk,
        lr=args.lr,
        net=args.net,
        seed=args.seed,
    )
    data = TwoAFCDirectory(args.data_root, load_size=args.load_size)
    if not len(data):
        raise SystemExit(f"no 2AFC triples under {args.data_root}")
    for epoch in range(args.epochs + args.epochs_decay):
        agg = []
        for batch in data.batches(
            args.batch_size, shuffle=True, seed=args.seed + epoch,
            drop_remainder=len(data) > args.batch_size,
        ):
            agg.append(trainer.train_step(batch))
        mean = {k: float(np.mean([m[k] for m in agg])) for k in agg[0]}
        row = {"epoch": epoch, "batches": len(agg), **mean}
        if epoch >= args.epochs:
            row["lr"] = trainer.decay_learning_rate(args.epochs_decay)
        print(json.dumps(row))
    trainer.save_lin_weights(args.out)
    print(json.dumps({"lin_weights": args.out, "net": args.net}))
    return 0


def cmd_lpips_score(args) -> int:
    """Score a perceptual metric on a BAPPS-style 2AFC or JND directory.

    Counterpart of the vendored library's evaluation mode
    (PerceptualSimilarity test_dataset_model.py / scripts/eval_valsets.sh):
    2AFC human-agreement or JND mAP for the LPIPS / L2 / DSSIM distances.
    """
    import numpy as np

    from geomconsistentfr_tpu.data.bapps import (
        score_2afc_directory,
        score_jnd_directory,
    )
    from geomconsistentfr_tpu.metrics.perceptual import (
        dssim_distance,
        l2_distance,
    )

    if args.metric == "l2":
        distance = l2_distance
    elif args.metric == "dssim":
        distance = dssim_distance
    else:
        from geomconsistentfr_tpu.models.lpips import LPIPSMetric, load_trunk_state

        trunk = load_trunk_state(args.trunk, net=args.net) if args.trunk else None
        metric = LPIPSMetric(
            lin_weights_path=args.lin,
            trunk_state=trunk,
            allow_random_trunk=args.random_trunk,
            net=args.net,
        )

        def distance(a, b):
            return float(np.mean(metric(a, b)))

    if args.mode == "2afc":
        score = score_2afc_directory(
            args.data_root, distance, load_size=args.load_size
        )
    else:
        if len(args.data_root) != 1:
            raise SystemExit(
                "--mode jnd takes exactly one --data-root (a directory with "
                f"p0/ p1/ same/), got {len(args.data_root)}"
            )
        score = score_jnd_directory(
            args.data_root[0], distance, load_size=args.load_size
        )
    print(json.dumps({
        "mode": args.mode, "metric": args.metric, "score": round(score, 6),
    }))
    return 0


def cmd_visualize_lighting(args) -> int:
    """Render shaded-sphere lighting visualizations (one PNG per direction).

    Counterpart of the reference's bundled lighting_visualizations/ assets
    (21 spheres, one per Multi-PIE flash / azimuth-elevation preset)."""
    import imageio.v2 as imageio
    import numpy as np

    from geomconsistentfr_tpu.lighting_presets import (
        LIGHT_PRESETS,
        azimuth_elevation,
        lighting_sphere,
    )

    if args.light:
        vals = [float(v) for v in args.light.split(",")]
        assert len(vals) == 3, "--light expects lx,ly,lz"
        targets = {"custom": tuple(vals)}
    elif args.azimuth is not None or args.elevation is not None:
        az, el = args.azimuth or 0.0, args.elevation or 0.0
        targets = {f"A{az:g}E{el:g}": azimuth_elevation(az, el)}
    elif args.preset:
        targets = {args.preset: LIGHT_PRESETS[args.preset]}
    else:
        targets = dict(LIGHT_PRESETS)

    os.makedirs(args.out, exist_ok=True)
    written = []
    for name, direction in targets.items():
        sphere = lighting_sphere(
            direction, size=args.size, ambient=args.ambient,
            directional=args.directional, clamp=args.clamp,
        )
        path = os.path.join(args.out, f"{name}.png")
        imageio.imwrite(path, (sphere * 255.0 + 0.5).astype(np.uint8))
        written.append(path)
    print(json.dumps({"out": args.out, "count": len(written)}))
    return 0


def cmd_bench(args) -> int:
    import runpy

    sys.argv = ["bench.py"]
    runpy.run_path(os.path.join(os.path.dirname(__file__), "..", "bench.py"),
                   run_name="__main__")
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="geomconsistentfr_tpu", description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("relight", help="relight one image with a target light")
    _add_common_model_args(p)
    p.add_argument("--image", required=True)
    p.add_argument("--mask", required=True)
    p.add_argument("--light", default=None, help="lx,ly,lz")
    p.add_argument("--light-preset", default=None)
    p.add_argument("--ambient", type=float, default=None)
    p.add_argument("--fix-border", action="store_true")
    p.set_defaults(fn=cmd_relight)

    p = sub.add_parser("sweep", help="relight one image under all presets")
    _add_common_model_args(p)
    p.add_argument("--image", required=True)
    p.add_argument("--mask", required=True)
    p.set_defaults(fn=cmd_sweep)

    p = sub.add_parser("transfer", help="2-pass lighting transfer")
    _add_common_model_args(p)
    p.add_argument("input")
    p.add_argument("reference")
    p.add_argument("mask")
    p.set_defaults(fn=cmd_transfer)

    p = sub.add_parser("eval-multipie", help="862-image benchmark protocol")
    _add_common_model_args(p)
    p.add_argument("--data-root", required=True)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument(
        "--data-parallel",
        action="store_true",
        help="shard inference batches across all visible devices "
        "(batch-size must be a multiple of the device count)",
    )
    p.add_argument(
        "--eval-only",
        action="store_true",
        help="skip inference: re-score the existing dump in --out "
        "(e.g. with a different --lpips-net); --checkpoint is not loaded",
    )
    p.add_argument(
        "--lpips-trunk",
        default=None,
        help="trunk weights (.pth/.pt torchvision state_dict or .npz) for "
        "--lpips-net — enables the masked spatial LPIPS metric "
        "(test_network.py:30-52)",
    )
    p.add_argument(
        "--lpips-net",
        default="alex",
        choices=("alex", "vgg", "squeeze"),
        help="LPIPS trunk architecture (lpips/lpips.py:32-40)",
    )
    p.add_argument(
        "--lpips-lin",
        default=None,
        help="LPIPS linear-head weights (default: the reference's bundled "
        "weights/v0.1/<net>.pth)",
    )
    p.add_argument(
        "--lpips-random-trunk",
        action="store_true",
        help="SMOKE ONLY: random AlexNet trunk (exercises the LPIPS path "
        "without torchvision weights; numbers are not the calibrated metric)",
    )
    p.set_defaults(fn=cmd_eval_multipie)

    p = sub.add_parser("train", help="self-supervised GAN training")
    p.add_argument("--preset", default=None)
    p.add_argument("--config", default=None, help="JSON PipelineConfig overrides")
    p.add_argument(
        "--precision",
        choices=["strict", "high", "fast"],
        default=None,
        help="training precision tier (config.apply_precision_tier minus "
        "'draft', which changes the marched computation and is serving-"
        "only). Default: the preset's strict f32; applied on top of "
        "--config when both are given.",
    )
    p.add_argument("--debug-nans", action="store_true", help="jax_debug_nans fault isolation")
    p.add_argument("--profile", action="store_true", help="jax.profiler device traces")
    p.add_argument("--data", default="synthetic", help="cache dir or 'synthetic'")
    p.add_argument("--synthetic-samples", type=int, default=64)
    p.add_argument(
        "--visualize-every", type=int, default=0,
        help="every N epochs, render a fixed probe through the current "
        "generator and append to <out>/visuals/index.html (0 = off)",
    )
    p.add_argument("--epochs", type=int, default=1000)
    p.add_argument("--out", default="runs/train")
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("convert", help=".pth -> orbax checkpoint")
    p.add_argument("--pth", required=True)
    p.add_argument("--out", required=True)
    p.set_defaults(fn=cmd_convert)

    p = sub.add_parser("fix-border", help="border-artifact median fix")
    p.add_argument("--image", required=True)
    p.add_argument("--mask", required=True)
    p.add_argument("--out-image", default=None)
    p.set_defaults(fn=cmd_fix_border)

    p = sub.add_parser("crop", help="face-crop preprocessing (reference geometry)")
    p.add_argument("--image", required=True)
    p.add_argument("--box", default=None, help="x1,y1,x2,y2 (else see --mask)")
    p.add_argument(
        "--mask", default=None,
        help="skin/face mask PNG: derive the face box from its bounding box "
        "(detector-free; else the SFD detector is required)",
    )
    p.add_argument(
        "--s3fd-weights", default=None,
        help="torch s3fd.pth checkpoint: run the NATIVE S3FD detector "
        "(models/s3fd.py) instead of the optional face_alignment package",
    )
    p.add_argument("--out-image", required=True)
    p.set_defaults(fn=cmd_crop)

    p = sub.add_parser("build-cache", help="pack MP_data into memmaps")
    p.add_argument("--src", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--limit", type=int, default=None)
    p.set_defaults(fn=cmd_build_cache)

    p = sub.add_parser(
        "config", help="print a fully-resolved preset config as JSON"
    )
    p.add_argument("--preset", default="single_image",
                   help="preset name (see config.PRESETS)")
    p.add_argument("--config", default=None, help="JSON overrides to resolve")
    p.set_defaults(fn=cmd_config)

    p = sub.add_parser(
        "lpips-train",
        help="train LPIPS lin heads on a BAPPS-style 2AFC directory",
    )
    p.add_argument(
        "--data-root", required=True, nargs="+",
        help="2AFC directory roots (each with ref/ p0/ p1/ judge/)",
    )
    p.add_argument("--out", required=True, help="output lin-head weights (.npz)")
    p.add_argument("--net", default="alex", choices=("alex", "vgg", "squeeze"))
    p.add_argument("--trunk", default=None, help="trunk weights (.pth/.npz)")
    p.add_argument(
        "--random-trunk", action="store_true",
        help="SMOKE ONLY: train against a random frozen trunk",
    )
    p.add_argument("--epochs", type=int, default=10,
                   help="constant-LR epochs (reference nepoch)")
    p.add_argument("--epochs-decay", type=int, default=10,
                   help="linear-decay epochs (reference nepoch_decay)")
    p.add_argument("--batch-size", type=int, default=50)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--load-size", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(fn=cmd_lpips_train)

    p = sub.add_parser(
        "lpips-score",
        help="2AFC / JND scoring of LPIPS|L2|DSSIM on a BAPPS directory",
    )
    p.add_argument("--mode", choices=("2afc", "jnd"), default="2afc")
    p.add_argument(
        "--data-root", required=True, nargs="+",
        help="dataset roots (2afc: ref/p0/p1/judge dirs; jnd: exactly one "
        "root with p0/p1/same)",
    )
    p.add_argument("--metric", choices=("lpips", "l2", "dssim"), default="lpips")
    p.add_argument("--net", default="alex", choices=("alex", "vgg", "squeeze"))
    p.add_argument("--trunk", default=None, help="LPIPS trunk weights")
    p.add_argument("--lin", default=None, help="LPIPS lin-head weights")
    p.add_argument("--random-trunk", action="store_true",
                   help="SMOKE ONLY: random LPIPS trunk")
    p.add_argument("--load-size", type=int, default=64)
    p.set_defaults(fn=cmd_lpips_score)

    p = sub.add_parser(
        "visualize-lighting", help="shaded-sphere lighting visualizations"
    )
    p.add_argument("--out", required=True)
    p.add_argument("--preset", default=None, help="one preset (default: all)")
    p.add_argument("--light", default=None, help="lx,ly,lz explicit direction")
    p.add_argument("--azimuth", type=float, default=None)
    p.add_argument("--elevation", type=float, default=None)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--ambient", type=float, default=0.458)
    p.add_argument("--directional", type=float, default=0.572)
    p.add_argument(
        "--clamp", action="store_true",
        help="clamp n.l at 0 (the face renderer's shading; default matches "
        "the reference's bundled sphere assets, which do not clamp)",
    )
    p.set_defaults(fn=cmd_visualize_lighting)

    p = sub.add_parser("bench", help="throughput benchmark (one JSON line)")
    p.set_defaults(fn=cmd_bench)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
