"""BAPPS-style 2AFC / JND dataset-directory loaders.

Mirrors the on-disk layout the reference's perceptual-similarity harness
consumes (PerceptualSimilarity/data/dataset/twoafc_dataset.py:1-65,
jnd_dataset.py:1-53):

  2AFC root(s):   ref/  p0/  p1/   (images)  +  judge/*.npy  (human fraction
                  preferring p1, one scalar per triple, in [0, 1])
  JND root:       p0/  p1/         (images)  +  same/*.npy   (fraction who
                  said "same", one scalar per pair)

Images are resized to `load_size` (BAPPS ships 64x64 patches) and returned as
float32 in [0, 1]; `LPIPS2AFCTrainer` and the scorers in metrics/perceptual
rescale to [-1, 1] themselves. Pairing is by sorted order within equal-length
listings, as in the reference — but counts are verified per directory and a
mismatch raises instead of silently truncating (zip semantics).
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

# data/image_folder.py IMG_EXTENSIONS
_IMG_EXTS = (".jpg", ".jpeg", ".png", ".ppm", ".bmp")


def _list_images(directory: str) -> List[str]:
    if not os.path.isdir(directory):
        raise FileNotFoundError(f"missing dataset directory: {directory}")
    names = sorted(
        f for f in os.listdir(directory) if f.lower().endswith(_IMG_EXTS)
    )
    return [os.path.join(directory, f) for f in names]


def _list_npys(directory: str) -> List[str]:
    if not os.path.isdir(directory):
        raise FileNotFoundError(f"missing dataset directory: {directory}")
    names = sorted(f for f in os.listdir(directory) if f.endswith(".npy"))
    return [os.path.join(directory, f) for f in names]


def _read_image01(path: str, load_size: int) -> np.ndarray:
    import imageio.v2 as imageio

    img = np.asarray(imageio.imread(path))
    if img.ndim == 2:
        img = np.stack([img] * 3, -1)
    if img.shape[-1] == 4:
        img = img[..., :3]
    img = img.astype(np.float32) / 255.0
    if img.shape[0] != load_size or img.shape[1] != load_size:
        import cv2

        img = cv2.resize(img, (load_size, load_size))
    return img


def _read_scalar(path: str) -> float:
    return float(np.load(path).reshape(-1)[0])


class TwoAFCDirectory:
    """ref/p0/p1 images + judge/*.npy, possibly spanning several roots
    (the reference trains on e.g. train/traditional + train/cnn jointly)."""

    def __init__(self, roots: Sequence[str] | str, load_size: int = 64):
        if isinstance(roots, str):
            roots = [roots]
        self.load_size = load_size
        self.ref_paths: List[str] = []
        self.p0_paths: List[str] = []
        self.p1_paths: List[str] = []
        self.judge_paths: List[str] = []
        for root in roots:
            ref = _list_images(os.path.join(root, "ref"))
            p0 = _list_images(os.path.join(root, "p0"))
            p1 = _list_images(os.path.join(root, "p1"))
            judge = _list_npys(os.path.join(root, "judge"))
            if not (len(ref) == len(p0) == len(p1) == len(judge)):
                raise ValueError(
                    f"2AFC root {root}: count mismatch "
                    f"(ref {len(ref)}, p0 {len(p0)}, p1 {len(p1)}, "
                    f"judge {len(judge)})"
                )
            self.ref_paths += ref
            self.p0_paths += p0
            self.p1_paths += p1
            self.judge_paths += judge

    def __len__(self) -> int:
        return len(self.ref_paths)

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        return {
            "ref": _read_image01(self.ref_paths[i], self.load_size),
            "p0": _read_image01(self.p0_paths[i], self.load_size),
            "p1": _read_image01(self.p1_paths[i], self.load_size),
            "judge": np.float32(_read_scalar(self.judge_paths[i])),
        }

    def batches(
        self,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        drop_remainder: bool = False,
    ) -> Iterator[Dict[str, np.ndarray]]:
        """Yield stacked batches shaped for LPIPS2AFCTrainer.train_step."""
        order = np.arange(len(self))
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        for start in range(0, len(order), batch_size):
            idx = order[start : start + batch_size]
            if drop_remainder and len(idx) < batch_size:
                return
            items = [self[int(i)] for i in idx]
            yield {
                "ref": np.stack([it["ref"] for it in items]),
                "p0": np.stack([it["p0"] for it in items]),
                "p1": np.stack([it["p1"] for it in items]),
                "judge": np.asarray([it["judge"] for it in items], np.float32),
            }


class JNDDirectory:
    """p0/p1 images + same/*.npy (jnd_dataset.py:1-53)."""

    def __init__(self, root: str, load_size: int = 64):
        self.load_size = load_size
        self.p0_paths = _list_images(os.path.join(root, "p0"))
        self.p1_paths = _list_images(os.path.join(root, "p1"))
        self.same_paths = _list_npys(os.path.join(root, "same"))
        if not (len(self.p0_paths) == len(self.p1_paths) == len(self.same_paths)):
            raise ValueError(
                f"JND root {root}: count mismatch (p0 {len(self.p0_paths)}, "
                f"p1 {len(self.p1_paths)}, same {len(self.same_paths)})"
            )

    def __len__(self) -> int:
        return len(self.p0_paths)

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        return {
            "p0": _read_image01(self.p0_paths[i], self.load_size),
            "p1": _read_image01(self.p1_paths[i], self.load_size),
            "same": np.float32(_read_scalar(self.same_paths[i])),
        }


def score_2afc_directory(
    roots: Sequence[str] | str, distance, load_size: int = 64
) -> float:
    """2AFC agreement of `distance` over an on-disk dataset
    (trainer.py score_2afc_dataset semantics via metrics.perceptual)."""
    from geomconsistentfr_tpu.metrics.perceptual import score_2afc

    ds = TwoAFCDirectory(roots, load_size=load_size)
    items = [ds[i] for i in range(len(ds))]
    return score_2afc(
        [it["ref"] for it in items],
        [it["p0"] for it in items],
        [it["p1"] for it in items],
        [float(it["judge"]) for it in items],
        distance,
    )


def score_jnd_directory(root: str, distance, load_size: int = 64) -> float:
    """JND mAP of `distance` over an on-disk dataset
    (trainer.py score_jnd_dataset semantics via metrics.perceptual)."""
    from geomconsistentfr_tpu.metrics.perceptual import score_jnd

    ds = JNDDirectory(root, load_size=load_size)
    items = [ds[i] for i in range(len(ds))]
    return score_jnd(
        [it["p0"] for it in items],
        [it["p1"] for it in items],
        [float(it["same"]) for it in items],
        distance,
    )
