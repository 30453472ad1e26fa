"""Training data pipeline: streaming CelebA-HQ + pseudo-GT loader.

The reference loads all 29,890 samples into float64 numpy in RAM (~110 GB,
train_raytracing_relighting_CelebAHQ_DSSIM_8x.py:527-558). Here the dataset is
packed once into compact on-disk memmaps (uint8 images/masks/albedo, float32
depth) and batches stream from the memmap — constant memory, host-overlapped.

Packing reproduces the reference's preprocessing semantics:
  * images /255 (:550), masks /255 at batch time (:610-612)
  * "fill nose and mouth" face mask = max(face_mask, depth_mask) binarised at
    128 (:552-556)
  * lighting pseudo-GT from per-image .mat, ambient fixed at 0.5 (:541,549)

When no dataset is present (this environment has no MP_data), the
`SyntheticFaceData` generator emits procedurally plausible faces (ellipsoid
depth, smooth albedo, random lighting) with identical batch schema, for tests,
benchmarks and smoke training.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np

FIELDS = {
    "image": (np.uint8, (256, 256, 3)),
    "depth_gt": (np.float32, (256, 256)),
    "depth_mask": (np.uint8, (256, 256)),
    "albedo_gt": (np.uint8, (256, 256)),
    "face_mask": (np.uint8, (256, 256)),
    "light_gt": (np.float32, (3,)),
}


def build_cache(src_root: str, cache_dir: str, limit: Optional[int] = None) -> int:
    """Pack the reference MP_data layout into memmaps. Returns sample count.

    Expects the directory names of train_raytracing_...py:535-539:
      CelebA-HQ_DFNRMVS_cropped/   lighting_directions_CelebAHQ_DFNRMVS/
      depth_maps_CelebA-HQ/        depth_masks_CelebA-HQ_DFNRMVS/
      CelebA-HQ_albedo_grayscale/  CelebAHQ_face_masks/
    """
    import imageio.v2 as imageio
    import scipy.io

    # JPEG fields decode through the native threaded libjpeg path when the
    # shared library built with it (native/dataloader.cc); imageio otherwise.
    from geomconsistentfr_tpu.data import native_loader

    if native_loader.has_native_jpeg():
        def read_jpg(path, channels):
            return native_loader.decode_jpeg(path, 256, 256, channels)
    else:
        def read_jpg(path, channels):
            img = np.asarray(imageio.imread(path))
            return img[..., :channels] if channels == 3 else img.reshape(256, 256)

    depths = sorted(os.listdir(os.path.join(src_root, "depth_maps_CelebA-HQ")))
    if limit:
        depths = depths[:limit]
    n = len(depths)
    os.makedirs(cache_dir, exist_ok=True)

    maps = {
        k: np.lib.format.open_memmap(
            os.path.join(cache_dir, f"{k}.npy"),
            mode="w+",
            dtype=dt,
            shape=(n, *shape),
        )
        for k, (dt, shape) in FIELDS.items()
    }

    for i, depth_name in enumerate(depths):
        stem = depth_name.split("_")[0]
        maps["depth_gt"][i] = np.reshape(
            scipy.io.loadmat(
                os.path.join(src_root, "depth_maps_CelebA-HQ", depth_name)
            )["depth_img"],
            (256, 256),
        ).astype(np.float32)
        depth_mask = np.reshape(
            imageio.imread(
                os.path.join(
                    src_root,
                    "depth_masks_CelebA-HQ_DFNRMVS",
                    depth_name.replace(".mat", ".png"),
                )
            ),
            (256, 256),
        )
        maps["depth_mask"][i] = depth_mask
        maps["image"][i] = read_jpg(
            os.path.join(src_root, "CelebA-HQ_DFNRMVS_cropped", stem + ".jpg"), 3
        )
        maps["albedo_gt"][i] = read_jpg(
            os.path.join(src_root, "CelebA-HQ_albedo_grayscale", stem + ".jpg"), 1
        )
        face = read_jpg(
            os.path.join(src_root, "CelebAHQ_face_masks", stem + ".jpg"), 1
        )
        fill = np.maximum(face, depth_mask)
        maps["face_mask"][i] = np.where(fill > 128, 255, 0).astype(np.uint8)
        maps["light_gt"][i] = scipy.io.loadmat(
            os.path.join(
                src_root, "lighting_directions_CelebAHQ_DFNRMVS", stem + ".jpg.mat"
            )
        )["lighting_direction"].reshape(3)

    for m in maps.values():
        m.flush()
    with open(os.path.join(cache_dir, "meta.json"), "w") as f:
        json.dump({"num_samples": n}, f)
    return n


class CelebAHQRelightingData:
    """Streaming batches from a packed cache (see build_cache)."""

    def __init__(self, cache_dir: str):
        with open(os.path.join(cache_dir, "meta.json")) as f:
            self.num_samples = json.load(f)["num_samples"]
        self._maps = {
            k: np.load(os.path.join(cache_dir, f"{k}.npy"), mmap_mode="r")
            for k in FIELDS
        }

    def get_batch(self, indices: np.ndarray) -> Dict[str, np.ndarray]:
        m = self._maps
        return {
            "image": m["image"][indices].astype(np.float32) / 255.0,
            "depth_gt": np.asarray(m["depth_gt"][indices], np.float32),
            "depth_mask": m["depth_mask"][indices].astype(np.float32) / 255.0,
            "albedo_gt": m["albedo_gt"][indices].astype(np.float32) / 255.0,
            "face_mask": m["face_mask"][indices].astype(np.float32) / 255.0,
            "light_gt": np.asarray(m["light_gt"][indices], np.float32),
        }

    def get_batch_raw(self, indices: np.ndarray) -> Dict[str, np.ndarray]:
        """Stored-dtype batch (uint8 images/masks, f32 depth/light).

        Upload-optimal form: 2.8x fewer host->device bytes than get_batch's
        f32 schema. Consumers expand with train._decode_device_batch, which
        reproduces get_batch's `.astype(np.float32)/255.0` on device.
        """
        return {k: np.asarray(self._maps[k][indices]) for k in FIELDS}

    def sample_indices(self, rng: np.random.Generator, batch_size: int):
        """One batch's indices; consumes the rng exactly like sample_batch
        (so index-level consumers — the device-resident trainer path —
        replay the identical stream)."""
        return np.sort(rng.integers(0, self.num_samples, size=batch_size))

    def sample_batch(self, rng: np.random.Generator, batch_size: int):
        return self.get_batch(self.sample_indices(rng, batch_size))

    def sample_batch_raw(self, rng: np.random.Generator, batch_size: int):
        """Raw-dtype twin of sample_batch (identical index stream per rng)."""
        return self.get_batch_raw(self.sample_indices(rng, batch_size))

    def epoch_batch_indices(
        self, rng: np.random.Generator, batch_size: int, batches_per_epoch: int
    ):
        """Reference epoch structure: shuffle contiguous batch slots, visit the
        first `batches_per_epoch` (train_*.py:578,593,606)."""
        slots = np.arange(self.num_samples // batch_size)
        rng.shuffle(slots)
        for slot in slots[:batches_per_epoch]:
            yield np.arange(slot * batch_size, (slot + 1) * batch_size)


class SyntheticFaceData:
    """Procedural stand-in with the training batch schema (no dataset needed)."""

    def __init__(self, num_samples: int = 64, size: int = 256, seed: int = 0):
        self.num_samples = num_samples
        self.size = size
        rng = np.random.default_rng(seed)
        s = size
        yy, xx = np.mgrid[0:s, 0:s].astype(np.float32)
        cx = cy = s / 2.0
        r2 = ((xx - cx) / (0.38 * s)) ** 2 + ((yy - cy) / (0.46 * s)) ** 2
        inside = r2 < 1.0
        dome = np.where(inside, np.sqrt(np.clip(1.0 - r2, 0.0, 1.0)), 0.0)

        self._samples = []
        for _ in range(num_samples):
            jitter = rng.normal(scale=0.05, size=(s, s)).astype(np.float32)
            depth = (-60.0 * dome + 10.0 + 5.0 * jitter * inside).astype(np.float32)
            base = rng.uniform(0.25, 0.8, size=(1, 1, 3)).astype(np.float32)
            albedo = np.clip(
                base + 0.1 * rng.normal(size=(s, s, 3)).astype(np.float32), 0.05, 1.0
            )
            direction = rng.normal(size=3).astype(np.float32)
            direction[2] = abs(direction[2]) + 0.3
            direction /= np.linalg.norm(direction)
            shading = np.clip(
                0.5 + 0.5 * dome * direction[2]
                + 0.3 * ((xx - cx) / s) * direction[0]
                + 0.3 * ((cy - yy) / s) * direction[1],
                0.0,
                1.2,
            ).astype(np.float32)
            image = np.clip(albedo * shading[..., None], 0.0, 1.0)
            mask = inside.astype(np.float32)
            self._samples.append(
                {
                    "image": image,
                    "depth_gt": depth,
                    "depth_mask": mask,
                    "albedo_gt": albedo.mean(-1),
                    "face_mask": mask,
                    "light_gt": direction,
                }
            )

    def get_batch(self, indices) -> Dict[str, np.ndarray]:
        return {
            k: np.stack([self._samples[int(i)][k] for i in indices])
            for k in FIELDS
        }

    def sample_indices(self, rng: np.random.Generator, batch_size: int):
        """One batch's indices (same rng consumption as sample_batch)."""
        return rng.integers(0, self.num_samples, size=batch_size)

    def sample_batch(self, rng: np.random.Generator, batch_size: int):
        return self.get_batch(self.sample_indices(rng, batch_size))
