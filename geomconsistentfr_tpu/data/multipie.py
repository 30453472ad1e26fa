"""Multi-PIE-relit CelebA-HQ evaluation-set loader.

Reference protocol (test_raytracing_relighting_CelebAHQ_DSSIM_8x.py:507-540):
862 input images under 18 Multi-PIE lightings; the target lighting index is
parsed from the GT filename suffix (`*_<idx>.png`, 1-based) into
MP_lighting_directions.mat; masks are depth masks plus a binarised
"fill nose" union with the face mask (:534-538); pseudo-GT ambient is 0.5.

Unlike the reference (whole-set float64 arrays in RAM), items stream lazily.
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, Optional

import numpy as np


class MultiPIEEvalData:
    def __init__(self, root: str):
        self.root = root
        self.inputs = sorted(os.listdir(os.path.join(root, "input_images_MP_18_lightings")))
        self.gts = sorted(os.listdir(os.path.join(root, "groundtruth_images_MP_18_lightings")))
        self.masks = sorted(os.listdir(os.path.join(root, "MP_depth_masks")))
        self.masks_fill_nose = sorted(
            os.listdir(os.path.join(root, "MP_depth_masks_fill_nose"))
        )
        self.face_masks = sorted(os.listdir(os.path.join(root, "MP_face_masks")))
        import scipy.io

        self.lighting_directions = scipy.io.loadmat(
            os.path.join(root, "MP_lighting_directions.mat")
        )["lighting_directions"].astype(np.float32)

    def __len__(self) -> int:
        return len(self.inputs)

    def target_lighting(self, i: int) -> np.ndarray:
        idx = int(self.gts[i].split(".")[0].split("_")[-1]) - 1
        return self.lighting_directions[idx]

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        import imageio.v2 as imageio

        root = self.root
        image = (
            np.asarray(
                imageio.imread(
                    os.path.join(root, "input_images_MP_18_lightings", self.inputs[i])
                ),
                np.float32,
            )
            / 255.0
        )
        depth_mask = (
            np.asarray(
                imageio.imread(os.path.join(root, "MP_depth_masks", self.masks[i])),
                np.float32,
            ).reshape(256, 256)
        )
        fill = np.asarray(
            imageio.imread(
                os.path.join(root, "MP_depth_masks_fill_nose", self.masks_fill_nose[i])
            ),
            np.float32,
        ).reshape(256, 256)
        face = np.asarray(
            imageio.imread(os.path.join(root, "MP_face_masks", self.face_masks[i])),
            np.float32,
        ).reshape(256, 256)
        # :534-538 — binarised union for the "fill nose" mask.
        fill_union = np.maximum(face, fill)
        fill_union = np.where(fill_union > 128, 255.0, 0.0)
        return {
            "image": image,
            "mask": depth_mask / 255.0,
            "mask_fill_nose": fill_union / 255.0,
            "light_gt": self.target_lighting(i),
            "ambient_gt": np.float32(0.5),
            "name": self.inputs[i],
        }

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        for i in range(len(self)):
            yield self[i]
