"""Unit tests for image IO helpers (cv2-fast encode/decode, uint8 readers)."""

import os

import numpy as np
import pytest


def test_write_read_roundtrip_lossless(tmp_path):
    from geomconsistentfr_tpu.utils.io import read_image, write_image

    rng = np.random.default_rng(0)
    img = rng.uniform(size=(64, 64, 3)).astype(np.float32)
    path = str(tmp_path / "x.png")
    write_image(path, img)
    back = read_image(path, size=64)
    # PNG is lossless; only the uint8 quantization is lost.
    q = np.clip(img * 255, 0, 255).astype(np.uint8).astype(np.float32) / 255.0
    np.testing.assert_allclose(back, q, atol=1e-6)


def test_read_image_u8_matches_float_reader(tmp_path):
    import imageio.v2 as imageio

    from geomconsistentfr_tpu.utils.io import read_image, read_image_u8

    rng = np.random.default_rng(1)
    raw = rng.integers(0, 256, (64, 64, 3)).astype(np.uint8)
    path = str(tmp_path / "y.png")
    imageio.imwrite(path, raw)
    u8 = read_image_u8(path, size=64)
    np.testing.assert_array_equal(u8, raw)
    f = read_image(path, size=64)
    np.testing.assert_allclose(u8.astype(np.float32) / 255.0, f, atol=1e-6)


def test_read_image_u8_grayscale_rgba_and_resize(tmp_path):
    import imageio.v2 as imageio

    from geomconsistentfr_tpu.utils.io import read_image_u8, read_mask_u8

    gray = (np.arange(64 * 64, dtype=np.uint64) % 256).astype(np.uint8)
    gray = gray.reshape(64, 64)
    pg = str(tmp_path / "g.png")
    imageio.imwrite(pg, gray)
    out = read_image_u8(pg, size=64)
    assert out.shape == (64, 64, 3)
    np.testing.assert_array_equal(out[..., 0], gray)

    rgba = np.dstack([gray] * 3 + [np.full_like(gray, 255)])
    pa = str(tmp_path / "a.png")
    imageio.imwrite(pa, rgba)
    out = read_image_u8(pa, size=64)
    assert out.shape == (64, 64, 3)

    # Resize path returns the requested size.
    out = read_image_u8(pa, size=32)
    assert out.shape == (32, 32, 3) and out.dtype == np.uint8

    m = read_mask_u8(pg, size=64)
    assert m.shape == (64, 64) and m.dtype == np.uint8
    np.testing.assert_array_equal(m, gray)
