"""Face-crop preprocessing (reference recrop_CelebA-HQ_images.py:15-63).

The reference runs the SFD detector (face_alignment package, separate conda
env) and then applies fixed crop geometry. The detector is pluggable here —
any (x1, y1, x2, y2) face box source works — and the geometry is reproduced
exactly (pixel-identical; oracle: tests/oracles/crop_oracle.py):
  * pad the image by 50 px on every side with cv2.BORDER_DEFAULT, i.e.
    reflect-101 (:17-24; boxes shift by +50)
  * skip faces whose SCALED side l = 1.2 * max(w, h) is < 200 px (:37-39 —
    the guard tests l, not the raw box side)
  * centre = box centre shifted down by 0.06 * h, then int()-truncated
    per component (:33-36); half-side = int(l / 2), so the crop side is
    the even value 2 * int(l / 2) (:40-43)
  * PIL-style crop (zero fill outside the padded canvas, :48)
  * cv2.resize of the uint8 crop to 256x256, bilinear (:49)

If the optional `face_alignment` package is installed, `detect_faces_sfd`
wraps it; otherwise pass boxes explicitly (e.g. from any external detector).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

Box = Tuple[float, float, float, float]

PAD = 50
MIN_FACE = 200
SCALE = 1.2
CENTER_SHIFT = 0.06
OUT_SIZE = 256


def detect_faces_sfd(image: np.ndarray):
    """Detect faces with the SFD detector if face_alignment is available."""
    try:
        import face_alignment
        from face_alignment.detection.sfd import FaceDetector  # noqa: F401
    except Exception as e:  # pragma: no cover - optional dependency
        raise RuntimeError(
            "face_alignment (SFD) is not installed in this environment; "
            "pass face boxes to crop_face explicitly"
        ) from e
    fa = face_alignment.FaceAlignment(
        face_alignment.LandmarksType.TWO_D, face_detector="sfd", device="cpu"
    )
    return fa.face_detector.detect_from_image(image)


def detect_faces_s3fd(
    image_rgb: np.ndarray,
    variables=None,
    weights_path: str | None = None,
    _detect_fn=None,
) -> np.ndarray:
    """Native S3FD detection in ORIGINAL-image coordinates.

    Runs models/s3fd.py (the same public architecture the reference's
    face_alignment SFD detector implements) on the 50 px reflect-101-padded
    BGR frame — exactly the frame the reference's detector sees
    (recrop_CelebA-HQ_images.py:17-29: pad, then channel-flip back to BGR)
    — then shifts boxes back by PAD so they compose with `crop_face`
    (which pads internally). Returns (N, 5) [x1, y1, x2, y2, score].

    Pass converted Flax `variables`, or `weights_path` to a torch
    s3fd.pth checkpoint (converted on the fly).
    """
    from geomconsistentfr_tpu.models import s3fd

    if variables is None:
        if weights_path is None:
            raise ValueError("need s3fd variables or weights_path")
        variables = s3fd.load_s3fd_weights(weights_path)
    detect = _detect_fn or s3fd.detect_faces
    padded = np.pad(
        np.asarray(image_rgb), ((PAD, PAD), (PAD, PAD), (0, 0)),
        mode="reflect",
    )
    det = np.asarray(detect(padded[..., ::-1], variables))
    if len(det):
        det = det.copy()
        det[:, :4] -= PAD
    return det


def box_from_mask(mask: np.ndarray, threshold: float | None = None) -> Box:
    """Face box from a skin/face mask: tight bounding box of mask > threshold.

    Detector-free fallback for environments without the SFD detector
    (recrop_CelebA-HQ_images.py:9-10 needs face_alignment): the datasets this
    pipeline handles ship per-image skin masks, whose bounding box is a good
    SFD-style face box for the crop geometry.

    threshold defaults to half the mask's maximum, which handles 0/255,
    0/1 and float-[0,1] mask encodings alike.
    """
    m = np.asarray(mask)
    if m.ndim == 3:
        m = m[..., 0]
    if threshold is None:
        threshold = float(m.max()) / 2.0
    ys, xs = np.nonzero(m > threshold)
    if ys.size == 0:
        raise ValueError("mask is empty; cannot derive a face box")
    return (float(xs.min()), float(ys.min()), float(xs.max()), float(ys.max()))


def crop_face(
    image: np.ndarray,
    box: Box,
    out_size: int = OUT_SIZE,
) -> Optional[np.ndarray]:
    """Apply the reference crop geometry to one detected face box.

    Args:
      image: (H, W, 3) uint8/float image (unpadded original).
      box: (x1, y1, x2, y2) in original-image coordinates.
    Returns:
      (out_size, out_size, 3) crop, or None when the face is below MIN_FACE.
    """
    import cv2

    # cv2.BORDER_DEFAULT == reflect-101, which np.pad calls "reflect"
    # (edge pixel not repeated) — recrop_CelebA-HQ_images.py:17-24.
    padded = np.pad(image, ((PAD, PAD), (PAD, PAD), (0, 0)), mode="reflect")
    x1, y1, x2, y2 = [v + PAD for v in box]
    w, h = x2 - x1, y2 - y1
    # The reference guard tests the SCALED side (recrop:37-39): faces with
    # raw max-side in [200/1.2, 200) pass here but would fail a raw test.
    side = SCALE * max(w, h)
    if side < MIN_FACE:
        return None

    # int() truncation per the reference (recrop:35-36,40-43): centre
    # components truncate individually; the half-side truncates, so the
    # crop side is always the even value 2 * int(side / 2).
    cy = int(y1 + h / 2.0 + CENTER_SHIFT * h)
    cx = int(x1 + w / 2.0)
    half = int(side / 2.0)
    left, top = cx - half, cy - half
    side_i = 2 * half

    # PIL Image.crop semantics (recrop:48): zero fill outside the canvas.
    ph, pw = padded.shape[:2]
    pad_l = max(0, -left)
    pad_t = max(0, -top)
    pad_r = max(0, left + side_i - pw)
    pad_b = max(0, top + side_i - ph)
    if pad_l or pad_t or pad_r or pad_b:
        padded = np.pad(
            padded, ((pad_t, pad_b), (pad_l, pad_r), (0, 0)), mode="constant"
        )
        left += pad_l
        top += pad_t
    crop = padded[top : top + side_i, left : left + side_i]
    # uint8 fixed-point bilinear, as the reference resizes BEFORE its
    # float32 cast (recrop:49) — float-path resizes differ by +-1 LSB.
    return cv2.resize(crop, (out_size, out_size))


def crop_largest_face(
    image: np.ndarray, boxes: Sequence[Box], out_size: int = OUT_SIZE
) -> Optional[np.ndarray]:
    """Crop the largest detected face (the reference processes one per image)."""
    if not boxes:
        return None
    areas = [max(0, b[2] - b[0]) * max(0, b[3] - b[1]) for b in boxes]
    return crop_face(image, boxes[int(np.argmax(areas))], out_size)
