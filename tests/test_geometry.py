"""Unit tests for geometry ops, cross-checked against independent oracles."""

import numpy as np
import pytest

import jax.numpy as jnp

from geomconsistentfr_tpu.ops import geometry


def test_pixel_grid_centered():
    xx, yy = geometry.pixel_grid_centered(4, 6)
    assert xx.shape == (4, 6) and yy.shape == (4, 6)
    # reference: xx = col - W/2, yy = H/2 - row (test_relight_single_image.py:24-28)
    np.testing.assert_allclose(np.asarray(xx[0]), np.arange(6) - 3.0)
    np.testing.assert_allclose(np.asarray(yy[:, 0]), 2.0 - np.arange(4))


def test_l2_normalize_matches_torch_semantics():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    x = rng.normal(size=(5, 3)).astype(np.float32)
    x[0] = 0.0  # degenerate row: torch returns zeros (eps guard)
    got = np.asarray(geometry.l2_normalize(jnp.asarray(x), axis=-1))
    want = F.normalize(torch.from_numpy(x), p=2, dim=-1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_sobel_gradients_vs_scipy():
    from scipy import ndimage

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 17, 23)).astype(np.float64)
    gx, gy = geometry.sobel_gradients(jnp.asarray(x))
    kx = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], dtype=np.float64) / 8.0
    want_gx = np.stack([ndimage.correlate(c, kx, mode="nearest") for c in x])
    want_gy = np.stack([ndimage.correlate(c, kx.T, mode="nearest") for c in x])
    np.testing.assert_allclose(np.asarray(gx), want_gx, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gy), want_gy, atol=1e-5)


def test_unproject_depth_principal_ray():
    depth = jnp.full((8, 8), 10.0)
    pts = geometry.unproject_depth(depth, fx=100.0, fy=100.0, cx=4.0, cy=4.0)
    # At the principal point the ray is (0, 0, 1): P = (0, 0, depth).
    np.testing.assert_allclose(np.asarray(pts[4, 4]), [0.0, 0.0, 10.0], atol=1e-5)
    # Ray is unit-normalised then scaled by depth: |P| == depth everywhere.
    norms = np.linalg.norm(np.asarray(pts), axis=-1)
    np.testing.assert_allclose(norms, 10.0, rtol=1e-5)


def test_depth_to_normals_vs_torch_oracle():
    from tests.oracles import kornia_oracle
    import torch

    rng = np.random.default_rng(2)
    depth = (rng.normal(size=(1, 32, 32)) * 20.0 + 1600.0).astype(np.float32)
    got = np.asarray(
        geometry.depth_to_normals(jnp.asarray(depth), fx=1570.0, fy=1570.0, cx=16.0, cy=16.0)
    )
    K = torch.zeros(1, 3, 3, dtype=torch.float32)
    K[:, 0, 0] = 1570.0
    K[:, 1, 1] = 1570.0
    K[:, 0, 2] = 16.0
    K[:, 1, 2] = 16.0
    K[:, 2, 2] = 1.0
    want = kornia_oracle.depth_to_normals(torch.from_numpy(depth)[:, None], K).numpy()
    want = np.moveaxis(want, 1, -1)  # NCHW -> NHWC
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_constant_depth_is_a_sphere():
    """Independent check of the normalized-ray unprojection semantics
    (kornia 0.4.1 `unproject_points(..., normalize=True)`): constant depth R
    means |P| = R — a camera-centred SPHERE, whose surface normals are radial
    (parallel to the ray). Under the alternative z-depth convention the same
    input would be a plane with normals (0,0,1); a wide FOV separates the two
    unambiguously at off-centre pixels."""
    h = w = 32
    f = 8.0  # very wide FOV: corner rays tilt strongly
    depth = jnp.full((h, w), 50.0)
    pts = np.asarray(geometry.unproject_depth(depth, f, f, w / 2, h / 2))
    np.testing.assert_allclose(np.linalg.norm(pts, axis=-1), 50.0, rtol=1e-5)

    normals = np.asarray(geometry.depth_to_normals(depth[None], f, f, w / 2, h / 2))[0]
    rays = pts / np.linalg.norm(pts, axis=-1, keepdims=True)
    # Compare up to sign, away from the border (replicate-pad edge effects).
    inner = (slice(4, -4), slice(4, -4))
    dots = np.abs(np.sum(normals[inner] * rays[inner], axis=-1))
    assert dots.min() > 0.999, float(dots.min())
    # Discriminator: corner normals are far from (0,0,1).
    assert abs(normals[6, 6, 2]) < 0.9


def test_depth_to_normals_flat_plane_faces_camera():
    normals = np.asarray(
        geometry.depth_to_normals(jnp.full((1, 16, 16), 1610.0), 1570.0, 1570.0, 8.0, 8.0)
    )
    inner = normals[0, 4:-4, 4:-4]
    # A fronto-parallel plane's normals point along -z/+z; z dominates.
    assert np.all(np.abs(inner[..., 2]) > 0.99)
