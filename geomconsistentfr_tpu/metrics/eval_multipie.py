"""The 862-image Multi-PIE-relit CelebA-HQ evaluation protocol, end to end.

Replaces the reference's three-tool pipeline (inference dump from
test_raytracing_relighting_CelebAHQ_DSSIM_8x.py:603-608, then MATLAB
DSSIM_MP_RGB.m / MSE_MP.m and PerceptualSimilarity/test_network.py over the
dumped PNGs) with a single Python harness:

  1. `run_inference` relights each input with its target Multi-PIE lighting
     (index parsed from the GT filename, test_raytracing_...py:525-527) and
     writes the same six-files-per-image directory layout;
  2. `evaluate_output_dir` scores rendered-vs-GT with masked MSE, masked
     MATLAB-parity DSSIM, PSNR, and (when LPIPS weights are available)
     masked spatial LPIPS — same file-stride convention (rendered image is
     the 3rd of 6 sorted outputs: DSSIM_MP_RGB.m:3-4, test_network.py:23-24).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from geomconsistentfr_tpu.metrics.image_metrics import (
    masked_dssim_matlab,
    masked_mse,
    psnr,
)


def _stem_id(name: str) -> Optional[str]:
    """First digit run in a filename stem — the image id in the MP layout."""
    import re

    m = re.search(r"\d+", os.path.splitext(name)[0])
    return str(int(m.group(0))) if m else None  # zero-padding-insensitive


def evaluate_output_dir(
    output_dir: str,
    gt_dir: str,
    mask_dir: str,
    lpips_fn=None,
) -> Dict[str, float]:
    """Score a 6-files-per-image inference dump against ground truth.

    The reference pairs `sorted()` listings purely positionally (the rendered
    image is the 3rd of each 6-file group: DSSIM_MP_RGB.m:3-4,
    test_network.py:23-24), so one stray file silently mispairs everything
    after it. Here rendered images are selected by their `_rendered_image`
    suffix and each rendered/GT/mask triple must agree on its parsed image id
    (first digit run of the stem) — a mispairing raises instead of skewing
    the metrics.
    """
    import imageio.v2 as imageio

    outputs = sorted(os.listdir(output_dir))
    rendered = [
        f for f in outputs if os.path.splitext(f)[0].endswith("_rendered_image")
    ]
    gts = sorted(os.listdir(gt_dir))
    masks = sorted(os.listdir(mask_dir))
    if not (len(rendered) == len(gts) == len(masks)):
        raise ValueError(
            f"count mismatch: {len(rendered)} rendered vs {len(gts)} GT vs "
            f"{len(masks)} masks"
        )

    # Validate EVERY pairing (filename-only) before reading any pixels, so a
    # directory-level mispairing is reported even when an earlier triple
    # would fail a per-image content check (e.g. an empty mask) first.
    for pred_name, gt_name, mask_name in zip(rendered, gts, masks):
        ids = {
            n: _stem_id(n) for n in (pred_name, gt_name, mask_name)
        }
        known = {v for v in ids.values() if v is not None}
        if len(known) > 1:
            raise ValueError(f"mispaired eval triple (image ids differ): {ids}")

    mses, dssims, psnrs, lpipss = [], [], [], []
    for pred_name, gt_name, mask_name in zip(rendered, gts, masks):
        pred = np.asarray(
            imageio.imread(os.path.join(output_dir, pred_name)), np.float64
        ) / 255.0
        gt = np.asarray(imageio.imread(os.path.join(gt_dir, gt_name)), np.float64) / 255.0
        mask = np.asarray(
            imageio.imread(os.path.join(mask_dir, mask_name)), np.float64
        )
        if mask.ndim == 3:
            mask = mask[..., 0]
        mask = mask / 255.0
        if not np.any(mask > 0):
            # One bad mask would otherwise NaN the aggregate (masked_mse) or
            # silently contribute 0 (the LPIPS >0-denominator path below).
            raise ValueError(
                f"empty face mask: {mask_name!r} — masked metrics undefined"
            )

        mses.append(masked_mse(pred, gt, mask))
        dssims.append(masked_dssim_matlab(pred, gt, mask))
        psnrs.append(psnr(pred * mask[..., None], gt * mask[..., None]))
        if lpips_fn is not None:
            # test_network.py:46-48: masked spatial mean with >0 denominator.
            dist_map = lpips_fn(gt, pred)  # (H, W)
            num = float(np.sum(mask * dist_map))
            den = float(np.sum((mask * dist_map) > 0))
            lpipss.append(num / max(den, 1.0))

    result = {
        "masked_mse_mean": float(np.mean(mses)),
        "masked_dssim_mean": float(np.mean(dssims)),
        "masked_psnr_mean": float(np.mean(psnrs)),
        "num_images": float(len(mses)),
    }
    if lpipss:
        result["masked_lpips_mean"] = float(np.mean(lpipss))
        result["masked_lpips_std"] = float(np.std(lpipss))
    return result


def run_inference(
    relighter,
    input_dir: str,
    gt_dir: str,
    lighting_mat: str,
    mask_fill_nose_dir: str,
    output_dir: str,
    limit: Optional[int] = None,
    batch_size: int = 8,
) -> int:
    """Relight the MP eval set and dump six PNGs per image (reference layout).

    Target lighting comes from MP_lighting_directions.mat row parsed from the
    GT filename (test_raytracing_...py:525-527); ambient defaults to 0.5 and
    the model's estimated ambient is used at render time per the
    multipie_eval preset (ambient_mode='estimated').

    The reference zips three independent `sorted()` listings positionally, so
    one stray file in any directory silently feeds the wrong *lighting* to
    every subsequent image. Here each input/GT/mask triple must agree on its
    parsed image id (first digit run of the stem, matching
    `evaluate_output_dir`) and the lighting index is parsed from the verified
    GT partner — a mispairing raises up front instead of corrupting the dump.
    """
    import scipy.io

    from geomconsistentfr_tpu.utils.io import (
        read_image_u8,
        read_mask_u8,
        save_visual_pack,
    )

    inputs = sorted(os.listdir(input_dir))
    gts = sorted(os.listdir(gt_dir))
    masks = sorted(os.listdir(mask_fill_nose_dir))
    if not (len(inputs) == len(gts) == len(masks)):
        raise ValueError(
            f"count mismatch: {len(inputs)} inputs vs {len(gts)} GT vs "
            f"{len(masks)} masks"
        )
    for triple in zip(inputs, gts, masks):
        ids = {name: _stem_id(name) for name in triple}
        known = {v for v in ids.values() if v is not None}
        if len(known) > 1:
            raise ValueError(f"mispaired inference triple (image ids differ): {ids}")
    directions = scipy.io.loadmat(lighting_mat)["lighting_directions"]
    size = relighter.cfg.render.img_height
    n = len(inputs) if limit is None else min(limit, len(inputs))

    os.makedirs(output_dir, exist_ok=True)

    def flush(pack, start, stop):
        # Forces the (async-dispatched) device results and writes the six
        # PNGs per image; runs while the NEXT batch computes on device.
        # The pack is uint8 with the visualization transforms already applied
        # on device (infer.pack_visuals) — one small fetch instead of six f32
        # tensors, which matters on a thin host link (the axon tunnel moves
        # ~8 MB/s; f32 outputs are 3.1 MB/image, this pack 0.77 MB).
        pack_np = np.asarray(pack)
        for k, i in enumerate(range(start, stop)):
            stem = inputs[i].split(".")[0]
            save_visual_pack(output_dir, stem, pack_np[k])

    # Device work is batched (one jit dispatch per batch_size images); the
    # reference loops the whole network one image at a time (:587-601).
    # One batch stays in flight: JAX dispatch is async, so batch k's host
    # decode/PNG-encode overlaps batch k+1's device compute.
    pending = None
    for start in range(0, n, batch_size):
        stop = min(start + batch_size, n)
        imgs, msks, lights = [], [], []
        for i in range(start, stop):
            # uint8 all the way to the device: the forward converts to
            # [0, 1] f32 on device, so the upload is bytes, not f32.
            imgs.append(read_image_u8(os.path.join(input_dir, inputs[i]), size=size))
            msks.append(
                read_mask_u8(os.path.join(mask_fill_nose_dir, masks[i]), size=size)
            )
            idx = int(gts[i].split(".")[0].split("_")[-1]) - 1
            lights.append(directions[idx])
        # Pad the tail so one compiled shape serves every batch.
        pad = batch_size - (stop - start)
        if pad:
            imgs += [imgs[-1]] * pad
            msks += [msks[-1]] * pad
            lights += [lights[-1]] * pad
        pack = relighter.forward_visuals(
            np.stack(imgs),
            np.stack(msks),
            target_light=np.asarray(lights, np.float32),
        )
        if hasattr(pack, "copy_to_host_async"):
            # Start this batch's device->host copy now, so it rides the link
            # while the previous batch's PNGs encode and the next batch's
            # inputs decode.
            pack.copy_to_host_async()
        if pending is not None:
            flush(*pending)
        pending = (pack, start, stop)
    if pending is not None:
        flush(*pending)
    return n
