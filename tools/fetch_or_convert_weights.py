"""One-command rehearsal for the real-weight drop-ins (LPIPS trunks + S3FD).

The two capabilities this environment cannot fully qualify are blocked only
on binary weights that are absent from the machine:

  * LPIPS pretrained trunks — the reference pulls torchvision zoo weights
    (/root/reference/PerceptualSimilarity/lpips/pretrained_networks.py:1-180);
    the conversion (models/lpips.load_trunk_state + convert_trunk) is tested
    with random tensors.
  * The S3FD face-detector checkpoint — the reference's face_alignment SFD
    (/root/reference/recrop_CelebA-HQ_images.py:9-10,29); the network,
    converter and decode/NMS (models/s3fd.py) are oracle-tested with shared
    random weights.

This tool makes the day-the-weights-appear a single command: given checkpoint
files on disk (explicit paths, or discovered in --search-dir under their
published filenames), it converts them and runs the full qualification for
each:

  (a) LPIPS: the delta protocol (tools/lpips_delta.py) with the REAL trunk —
      the committed worst |delta| < 1e-3 then IS the BASELINE north star.
  (b) S3FD: a full `crop`-equivalent drive over the 10 bundled FFHQ samples —
      native detection on the padded BGR frame, reference crop geometry, and
      a cross-check that the detector-derived box agrees with the bundled
      skin mask's box (IoU + crop-geometry comparison against the
      detector-free `--mask` path).

Without any weights present it reports what it looked for and exits 0, so it
can run unconditionally in CI. tests/test_weights_rehearsal.py drives the
same entry points with fabricated checkpoint files (and skips the real-weight
assertions when the binaries are absent).

Usage:
  python tools/fetch_or_convert_weights.py \
      [--lpips-trunk alexnet.pth] [--net alex] [--s3fd s3fd.pth] \
      [--search-dir ~/.cache/torch/hub/checkpoints --search-dir /weights] \
      [--out docs/WEIGHTS_rehearsal.json]
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Published checkpoint filename patterns per artifact (torchvision zoo /
# face_alignment release names), searched under each --search-dir.
SEARCH_PATTERNS = {
    "alex": ("alexnet-owt-*.pth", "alexnet*.pth", "alexnet*.npz"),
    "vgg": ("vgg16-*.pth", "vgg16*.npz"),
    "squeeze": ("squeezenet1_1-*.pth", "squeezenet1_1*.npz"),
    "s3fd": ("s3fd-*.pth", "s3fd*.pth", "sfd_face.pth"),
}

DEFAULT_SEARCH_DIRS = (
    os.path.expanduser("~/.cache/torch/hub/checkpoints"),
    os.path.expanduser("~/.face_alignment/data"),
    "/weights",
)

FFHQ_DIR = "/root/reference/sample_test_images_FFHQ"
MASK_DIR = "/root/reference/FFHQ_skin_masks"


def find_weights(kind: str, search_dirs) -> str | None:
    for d in search_dirs:
        for pat in SEARCH_PATTERNS[kind]:
            hits = sorted(glob.glob(os.path.join(d, pat)))
            if hits:
                return hits[0]
    return None


def box_iou(a, b) -> float:
    ix1, iy1 = max(a[0], b[0]), max(a[1], b[1])
    ix2, iy2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(0.0, ix2 - ix1) * max(0.0, iy2 - iy1)
    area = lambda r: max(0.0, r[2] - r[0]) * max(0.0, r[3] - r[1])  # noqa: E731
    union = area(a) + area(b) - inter
    return inter / union if union > 0 else 0.0


def rehearse_lpips(trunk_path: str, net: str, images: int, out_json: str) -> dict:
    """Convert the trunk and run the LPIPS delta protocol with it."""
    from tools.lpips_delta import run

    report = run(images=images, net=net, out=out_json, trunk=trunk_path)
    return {
        "weights": trunk_path,
        "net": net,
        "worst_abs_delta": report["worst_abs_delta"],
        "north_star_1e-3": report["north_star_1e-3"],
        "delta_artifact": out_json,
    }


def rehearse_s3fd(
    weights_path: str, require_detection: bool, limit: int | None = None
) -> dict:
    """Full crop drive on the bundled FFHQ samples with a converted s3fd.pth.

    For each sample: native detection (padded BGR frame, decode+NMS), the
    reference crop geometry on the top box, and the detector-free mask-box
    crop as the cross-check. With real weights every sample must detect one
    face whose box overlaps the skin-mask box (the mask covers the inner
    face, so IoU is moderate but the geometry must land: the two 256^2 crops
    must cover nearly the same pixels). With fabricated weights pass
    require_detection=False: the drive still exercises conversion, the
    detection path and the report shape end to end.
    """
    import imageio.v2 as imageio
    import numpy as np

    from geomconsistentfr_tpu.models.s3fd import load_s3fd_weights
    from geomconsistentfr_tpu.preprocess import (
        box_from_mask,
        crop_face,
        detect_faces_s3fd,
    )

    variables = load_s3fd_weights(weights_path)
    per_image = []
    detected = 0
    for name in sorted(os.listdir(FFHQ_DIR))[:limit]:
        img = np.asarray(imageio.imread(os.path.join(FFHQ_DIR, name)))
        mask = np.asarray(imageio.imread(os.path.join(MASK_DIR, name)))
        mask_box = box_from_mask(mask)
        det = detect_faces_s3fd(img, variables=variables)
        row = {"image": name, "detections": int(len(det))}
        if len(det):
            detected += 1
            det_box = tuple(float(v) for v in det[0][:4])
            row["score"] = float(det[0][4])
            row["iou_vs_mask_box"] = round(box_iou(det_box, mask_box), 4)
            crop_det = crop_face(img, det_box)
            crop_mask = crop_face(img, mask_box)
            row["crop_ok"] = crop_det is not None
            if crop_det is not None and crop_mask is not None:
                # Same face, two box sources: the 256^2 crops must be
                # near-identical fields of view (mean |delta| in [0,255]).
                row["crop_mad_vs_mask_crop"] = round(
                    float(
                        np.abs(
                            crop_det.astype(np.float32)
                            - crop_mask.astype(np.float32)
                        ).mean()
                    ),
                    2,
                )
        per_image.append(row)

    result = {
        "weights": weights_path,
        "images": len(per_image),
        "images_with_detection": detected,
        "per_image": per_image,
    }
    if require_detection:
        assert detected == len(per_image), (
            f"S3FD with real weights must detect a face on every bundled "
            f"FFHQ sample; got {detected}/{len(per_image)}"
        )
        for row in per_image:
            assert row.get("crop_ok"), f"crop failed on {row['image']}"
            assert row["iou_vs_mask_box"] > 0.25, (
                f"detector box far from the skin-mask box on {row['image']}: "
                f"IoU {row['iou_vs_mask_box']}"
            )
        result["crop_geometry_ok"] = True
    return result


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lpips-trunk", default=None)
    ap.add_argument("--net", default="alex", choices=("alex", "vgg", "squeeze"))
    ap.add_argument("--s3fd", default=None)
    ap.add_argument("--search-dir", action="append", default=None)
    ap.add_argument("--images", type=int, default=16,
                    help="delta-protocol image count")
    ap.add_argument("--out", default=os.path.join("docs", "WEIGHTS_rehearsal.json"))
    ap.add_argument("--allow-fabricated", action="store_true",
                    help="do not require detections/box agreement (test weights)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    search_dirs = args.search_dir or list(DEFAULT_SEARCH_DIRS)
    report = {"searched": search_dirs, "lpips": None, "s3fd": None}

    trunk = args.lpips_trunk or find_weights(args.net, search_dirs)
    if trunk:
        report["lpips"] = rehearse_lpips(
            trunk, args.net, args.images,
            out_json=os.path.join("docs", "LPIPS_delta_real.json"),
        )
    else:
        report["lpips"] = {
            "skipped": f"no {args.net} trunk found "
            f"(looked for {SEARCH_PATTERNS[args.net]})"
        }

    s3fd_path = args.s3fd or find_weights("s3fd", search_dirs)
    if s3fd_path:
        report["s3fd"] = rehearse_s3fd(
            s3fd_path, require_detection=not args.allow_fabricated
        )
    else:
        report["s3fd"] = {
            "skipped": f"no s3fd checkpoint found "
            f"(looked for {SEARCH_PATTERNS['s3fd']})"
        }

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({
        "lpips": "ok" if trunk else "absent",
        "s3fd": "ok" if s3fd_path else "absent",
        "out": args.out,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
