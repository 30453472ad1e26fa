"""Detector-free transcription of the reference crop geometry.

Reproduces recrop_CelebA-HQ_images.py:15-49 (pad, centre/size arithmetic,
PIL crop, resize) with the SFD detection replaced by an explicit box, so the
framework's `preprocess.crop_face` can be asserted pixel-identical. Nothing
here ships in the framework; the PIL dependency is test-only.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def reference_crop(image: np.ndarray, box) -> Optional[np.ndarray]:
    """Exactly the reference per-detection geometry for one face box.

    Args:
      image: (H, W, 3) uint8 array in original (unpadded) coordinates.
      box: (x1, y1, x2, y2) in original coordinates (the reference detector
        runs on the 50px-padded image, recrop:29, so its boxes carry a +50
        offset that we add here).
    Returns:
      (256, 256, 3) uint8 crop, or None when the reference's `continue`
      guard (recrop:38-39) skips the face.
    """
    import cv2
    from PIL import Image

    # recrop:17-24 — cv2.BORDER_DEFAULT is reflect-101.
    img = cv2.copyMakeBorder(
        np.asarray(image), 50, 50, 50, 50, borderType=cv2.BORDER_DEFAULT
    )
    scale = 1.2
    size = 256
    d = [float(v) + 50.0 for v in box]
    # recrop:33-36 — (y, x) centre, +0.06*h shift, per-component int().
    center = [d[3] - (d[3] - d[1]) / 2.0, d[2] - (d[2] - d[0]) / 2.0]
    center[0] += (d[3] - d[1]) * 0.06
    center = [int(center[0]), int(center[1])]
    # recrop:37-39 — the guard tests the SCALED side.
    side = max(d[2] - d[0], d[3] - d[1]) * scale
    if side < 200:
        return None
    # recrop:40-43 — truncated half-side, so the crop is 2*int(l/2) wide.
    x_s = center[1] - int(side / 2)
    y_s = center[0] - int(side / 2)
    x_e = center[1] + int(side / 2)
    y_e = center[0] + int(side / 2)
    # recrop:48-49 — PIL crop (zero fill out of canvas), uint8 resize.
    crop = Image.fromarray(img).crop((x_s, y_s, x_e, y_e))
    return cv2.resize(np.asarray(crop), (size, size))
