"""ctypes binding for the native C++ streaming data loader (native/dataloader.cc).

Background threads assemble float32 batches from the packed memmap cache and
keep a bounded prefetch queue, so host IO overlaps device compute. Falls back
transparently to the pure-numpy CelebAHQRelightingData when the shared library
cannot be built. Built on first use with g++ -O3 (no external deps).

Honest positioning: when the cache is page-cache-hot, numpy's vectorised
fancy-indexing path is comparable or faster (~870 vs ~540 batches/s measured
here — both ~100x beyond what the 0.4 s/step trainer consumes). The native
loader earns its keep on cold reads from disk/NFS, where the worker threads
hide IO latency behind device compute, and as the substrate for future
direct-JPEG decoding (TODO.md).
"""

from __future__ import annotations

import ctypes
import json
import os
import subprocess
from typing import Dict, Optional

import numpy as np

_LIB_CACHE: Optional[ctypes.CDLL] = None

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_SRC = os.path.join(_NATIVE_DIR, "dataloader.cc")
_SO = os.path.join(_NATIVE_DIR, "libgcfr_dataloader.so")


def build_library(force: bool = False) -> str:
    """Compile the loader with g++ if needed; returns the .so path.

    Links libjpeg for the direct-JPEG decode path when available; if the
    link fails (header without library, unusual distros) it rebuilds with
    JPEG support compiled out and the Python side falls back to imageio."""
    if force or not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        base = [
            "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
            "-pthread", _SRC, "-o", _SO,
        ]
        try:
            subprocess.run(base + ["-ljpeg"], check=True, capture_output=True)
        except subprocess.CalledProcessError:
            subprocess.run(
                base + ["-DGCFR_NO_JPEG"], check=True, capture_output=True
            )
    return _SO


def _lib() -> ctypes.CDLL:
    global _LIB_CACHE
    if _LIB_CACHE is None:
        lib = ctypes.CDLL(build_library())
        lib.gcfr_loader_create.restype = ctypes.c_void_p
        lib.gcfr_loader_create.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_uint64, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        fp = ctypes.POINTER(ctypes.c_float)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.gcfr_loader_next.argtypes = [ctypes.c_void_p] + [fp] * 6
        lib.gcfr_loader_next_raw.argtypes = [
            ctypes.c_void_p, u8p, fp, u8p, u8p, u8p, fp,
        ]
        lib.gcfr_loader_destroy.argtypes = [ctypes.c_void_p]
        lib.gcfr_has_jpeg.restype = ctypes.c_int
        lib.gcfr_decode_jpeg.restype = ctypes.c_int
        lib.gcfr_decode_jpeg.argtypes = [
            ctypes.c_char_p, u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.gcfr_decode_jpegs.restype = ctypes.c_int
        lib.gcfr_decode_jpegs.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, u8p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.gcfr_encode_jpeg.restype = ctypes.c_ulong
        lib.gcfr_encode_jpeg.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(u8p),
        ]
        lib.gcfr_free.argtypes = [u8p]
        _LIB_CACHE = lib
    return _LIB_CACHE


def has_native_jpeg() -> bool:
    """True when the shared library was built with libjpeg support."""
    try:
        return bool(_lib().gcfr_has_jpeg())
    except Exception:  # noqa: BLE001 - toolchain missing -> no native path
        return False


def decode_jpeg(path: str, height: int, width: int, channels: int) -> np.ndarray:
    """Decode one JPEG natively into (H, W, C) uint8 (C=1: grayscale).

    Raises on IO/corruption/dimension mismatch — silent rescaling would hide
    dataset corruption in the fixed-256x256 CelebA-HQ pipeline."""
    out = np.empty((height, width, channels), np.uint8)
    rc = _lib().gcfr_decode_jpeg(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        height, width, channels,
    )
    if rc != 0:
        raise ValueError(f"native JPEG decode failed (code {rc}): {path}")
    return out[..., 0] if channels == 1 else out


def decode_jpegs(
    paths, height: int, width: int, channels: int, workers: int = 4
) -> np.ndarray:
    """Threaded native batch decode -> (N, H, W, C) uint8.

    Raises if any file fails (failed slots are zero-filled by the C side,
    but a corrupt training set should stop the cache build, not poison it)."""
    paths = list(paths)
    out = np.empty((len(paths), height, width, channels), np.uint8)
    arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
    failures = _lib().gcfr_decode_jpegs(
        arr, len(paths),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        height, width, channels, workers,
    )
    if failures:
        raise ValueError(f"native JPEG batch decode: {failures} file(s) failed")
    return out[..., 0] if channels == 1 else out


def encode_jpeg(img: np.ndarray, quality: int = 90) -> bytes:
    """Native in-memory JPEG encode of (H, W, 3) or (H, W) uint8.

    Serving counterpart of decode_jpeg: the serve.py "format": "jpeg"
    response path uses this because PNG deflate on the 1-CPU host was 75%
    of serving wall time (docs/BENCH_serve.json round 4). Raises when the
    library was built without libjpeg — callers fall back to imageio."""
    img = np.ascontiguousarray(img)
    if img.dtype != np.uint8:
        raise ValueError(f"encode_jpeg needs uint8, got {img.dtype}")
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    lib = _lib()
    out = ctypes.POINTER(ctypes.c_uint8)()
    size = lib.gcfr_encode_jpeg(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w, c, int(quality), ctypes.byref(out),
    )
    if not size:
        raise ValueError(
            f"native JPEG encode failed (shape {img.shape}, q={quality})"
        )
    try:
        return ctypes.string_at(out, size)
    finally:
        lib.gcfr_free(out)


class NativeCelebAHQLoader:
    """Drop-in batch source backed by the C++ prefetching loader."""

    def __init__(
        self,
        cache_dir: str,
        batch_size: int,
        seed: int = 0,
        workers: int = 2,
        queue_capacity: int = 4,
        raw: bool = False,
    ):
        with open(os.path.join(cache_dir, "meta.json")) as f:
            self.num_samples = json.load(f)["num_samples"]
        self.batch_size = batch_size
        self.raw = raw
        self._lib = _lib()
        self._handle = self._lib.gcfr_loader_create(
            cache_dir.encode(), self.num_samples, batch_size,
            seed, workers, queue_capacity, int(raw),
        )
        if not self._handle:
            raise RuntimeError(f"native loader failed to open cache {cache_dir}")

    def next_batch(self) -> Dict[str, np.ndarray]:
        assert not self.raw, "loader created with raw=True; use next_batch_raw"
        b, s = self.batch_size, 256
        out = {
            "image": np.empty((b, s, s, 3), np.float32),
            "depth_gt": np.empty((b, s, s), np.float32),
            "depth_mask": np.empty((b, s, s), np.float32),
            "albedo_gt": np.empty((b, s, s), np.float32),
            "face_mask": np.empty((b, s, s), np.float32),
            "light_gt": np.empty((b, 3), np.float32),
        }
        fp = ctypes.POINTER(ctypes.c_float)
        self._lib.gcfr_loader_next(
            self._handle,
            *[out[k].ctypes.data_as(fp) for k in (
                "image", "depth_gt", "depth_mask", "albedo_gt",
                "face_mask", "light_gt",
            )],
        )
        return out

    def next_batch_raw(self) -> Dict[str, np.ndarray]:
        """Stored-dtype batch: uint8 image/masks/albedo, f32 depth/light.

        2.8x fewer bytes than next_batch for the device handoff; pair with
        train._decode_device_batch for the on-device /255 expansion.
        """
        assert self.raw, "loader created with raw=False; use next_batch"
        b, s = self.batch_size, 256
        out = {
            "image": np.empty((b, s, s, 3), np.uint8),
            "depth_gt": np.empty((b, s, s), np.float32),
            "depth_mask": np.empty((b, s, s), np.uint8),
            "albedo_gt": np.empty((b, s, s), np.uint8),
            "face_mask": np.empty((b, s, s), np.uint8),
            "light_gt": np.empty((b, 3), np.float32),
        }
        fp = ctypes.POINTER(ctypes.c_float)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        self._lib.gcfr_loader_next_raw(
            self._handle,
            out["image"].ctypes.data_as(u8p),
            out["depth_gt"].ctypes.data_as(fp),
            out["depth_mask"].ctypes.data_as(u8p),
            out["albedo_gt"].ctypes.data_as(u8p),
            out["face_mask"].ctypes.data_as(u8p),
            out["light_gt"].ctypes.data_as(fp),
        )
        return out

    def sample_batch(self, rng=None, batch_size=None) -> Dict[str, np.ndarray]:
        """Trainer-compatible signature (prefetch queue ignores rng)."""
        assert batch_size is None or batch_size == self.batch_size
        return self.next_batch_raw() if self.raw else self.next_batch()

    def close(self) -> None:
        if self._handle:
            self._lib.gcfr_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
