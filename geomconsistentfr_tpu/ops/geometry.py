"""Camera geometry ops: pixel grids, depth unprojection, surface normals.

These reproduce the numerics the reference obtains from kornia 0.4.1
(`depth_to_normals`, reference test_relight_single_image.py:8,326):
depth is unprojected through K^-1 along the *normalised* camera ray
(kornia `unproject_points(..., normalize=True)`), spatial gradients use the
L1-normalised 3x3 Sobel kernel with replicate padding (kornia
`spatial_gradient(mode='sobel', order=1, normalized=True)`), and the normal is
the cross product of the x- and y-gradients of the 3D point map, L2-normalised.

All ops are channels-last and vmap/jit friendly (static shapes, no host sync).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

# L2-normalisation epsilon matching torch.nn.functional.normalize.
_TORCH_NORMALIZE_EPS = 1e-12


def l2_normalize(x: Array, axis: int = -1, eps: float = _TORCH_NORMALIZE_EPS) -> Array:
    """x / max(||x||_2, eps) along `axis` (torch F.normalize parity)."""
    norm = jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True))
    return x / jnp.maximum(norm, eps)


def pixel_grid_centered(height: int, width: int, dtype=jnp.float32) -> tuple[Array, Array]:
    """Image-centred pixel coordinate grids.

    Returns (xx, yy) of shape (height, width) with
      xx = column - width/2   (increases rightward),
      yy = height/2 - row     (increases upward),
    matching the reference meshgrid (test_relight_single_image.py:24-28).
    """
    cols = jnp.arange(width, dtype=dtype)
    rows = jnp.arange(height, dtype=dtype)
    xx = jnp.broadcast_to(cols[None, :], (height, width)) - width / 2.0
    yy = height / 2.0 - jnp.broadcast_to(rows[:, None], (height, width))
    return xx, yy


def unproject_depth(depth: Array, fx: float, fy: float, cx: float, cy: float) -> Array:
    """Unproject a depth map to camera-frame 3D points (kornia `depth_to_3d` parity).

    Args:
      depth: (..., H, W) depth map.
    Returns:
      (..., H, W, 3) 3D points: normalize([(u-cx)/fx, (v-cy)/fy, 1]) * depth,
      where (u, v) are pixel coordinates with (0, 0) at the top-left.
    """
    h, w = depth.shape[-2], depth.shape[-1]
    u = jnp.arange(w, dtype=depth.dtype)
    v = jnp.arange(h, dtype=depth.dtype)
    x = (u[None, :] - cx) / fx                      # (1, W)
    y = (v[:, None] - cy) / fy                      # (H, 1)
    ray = jnp.stack(
        [
            jnp.broadcast_to(x, (h, w)),
            jnp.broadcast_to(y, (h, w)),
            jnp.ones((h, w), dtype=depth.dtype),
        ],
        axis=-1,
    )                                               # (H, W, 3)
    ray = l2_normalize(ray, axis=-1)
    return ray * depth[..., None]


def sobel_gradients(x: Array) -> tuple[Array, Array]:
    """Spatial gradients via the L1-normalised Sobel kernel with replicate padding.

    Matches kornia 0.4.1 `spatial_gradient` (cross-correlation with
    [[-1,0,1],[-2,0,2],[-1,0,1]]/8 and its transpose, replicate-padded).

    Args:
      x: (..., H, W).
    Returns:
      (gx, gy), each (..., H, W).
    """
    lead = x.shape[:-2]
    h, w = x.shape[-2], x.shape[-1]
    xp = jnp.pad(x.reshape((-1, h, w)), ((0, 0), (1, 1), (1, 1)), mode="edge")

    # Separable Sobel: Gx = smooth_y([1,2,1]) * diff_x([-1,0,1]) / 8 and vice versa.
    def smooth(a: Array, axis: int) -> Array:
        s0 = jax.lax.slice_in_dim(a, 0, a.shape[axis] - 2, axis=axis)
        s1 = jax.lax.slice_in_dim(a, 1, a.shape[axis] - 1, axis=axis)
        s2 = jax.lax.slice_in_dim(a, 2, a.shape[axis], axis=axis)
        return s0 + 2.0 * s1 + s2

    def diff(a: Array, axis: int) -> Array:
        s0 = jax.lax.slice_in_dim(a, 0, a.shape[axis] - 2, axis=axis)
        s2 = jax.lax.slice_in_dim(a, 2, a.shape[axis], axis=axis)
        return s2 - s0

    gx = smooth(diff(xp, axis=2), axis=1) / 8.0
    gy = diff(smooth(xp, axis=2), axis=1) / 8.0
    return gx.reshape((*lead, h, w)), gy.reshape((*lead, h, w))


def depth_to_normals(depth: Array, fx: float, fy: float, cx: float, cy: float) -> Array:
    """Surface normals from a depth map (kornia 0.4.1 `depth_to_normals` parity).

    Args:
      depth: (..., H, W).
    Returns:
      (..., H, W, 3) unit normals: normalize(cross(d(xyz)/dx, d(xyz)/dy)).
    """
    points = unproject_depth(depth, fx, fy, cx, cy)          # (..., H, W, 3)
    comp = jnp.moveaxis(points, -1, -3)                      # (..., 3, H, W)
    gx, gy = sobel_gradients(comp)                           # (..., 3, H, W)
    a = jnp.moveaxis(gx, -3, -1)                             # (..., H, W, 3)
    b = jnp.moveaxis(gy, -3, -1)
    normals = jnp.cross(a, b)
    return l2_normalize(normals, axis=-1)
