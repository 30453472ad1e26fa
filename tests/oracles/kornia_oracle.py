"""Torch stand-in for kornia 0.4.1's `depth_to_normals` (test oracle only).

kornia is not installed in this environment, but the reference scripts import
`from kornia.geometry.depth import depth_to_normals`. This module re-derives
the kornia 0.4.1 semantics so the reference scripts can run on CPU as parity
oracles:
  * `depth_to_3d`: unproject through K^-1 along the *normalised* pixel ray
    (kornia `unproject_points(..., normalize=True)`), i.e.
    P = normalize([(u-cx)/fx, (v-cy)/fy, 1]) * depth.
  * `spatial_gradient(mode='sobel', order=1, normalized=True)`:
    cross-correlation with the L1-normalised 3x3 Sobel kernels
    ([[-1,0,1],[-2,0,2],[-1,0,1]]/8 and transpose), replicate padding.
  * normals = L2-normalised cross(d(xyz)/dx, d(xyz)/dy).
"""

import torch
import torch.nn.functional as F


def depth_to_3d(depth: torch.Tensor, camera_matrix: torch.Tensor) -> torch.Tensor:
    """depth (B,1,H,W), camera_matrix (B,3,3) -> points (B,3,H,W)."""
    b, _, h, w = depth.shape
    u = torch.arange(w, dtype=depth.dtype, device=depth.device)
    v = torch.arange(h, dtype=depth.dtype, device=depth.device)
    bk = camera_matrix.shape[0]  # broadcasts over the depth batch when 1
    fx = camera_matrix[:, 0, 0].reshape(bk, 1, 1)
    fy = camera_matrix[:, 1, 1].reshape(bk, 1, 1)
    cx = camera_matrix[:, 0, 2].reshape(bk, 1, 1)
    cy = camera_matrix[:, 1, 2].reshape(bk, 1, 1)
    x = (u.reshape(1, 1, w) - cx) / fx                      # (B,1,W)
    y = (v.reshape(1, h, 1) - cy) / fy                      # (B,H,1)
    xyz = torch.stack(
        [
            x.expand(b, h, w),
            y.expand(b, h, w),
            torch.ones(b, h, w, dtype=x.dtype, device=depth.device),
        ],
        dim=1,
    )                                                        # (B,3,H,W)
    xyz = F.normalize(xyz, p=2, dim=1)
    return xyz * depth


def spatial_gradient(x: torch.Tensor) -> torch.Tensor:
    """x (B,C,H,W) -> gradients (B,C,2,H,W): [d/dx, d/dy], Sobel/8, replicate pad."""
    b, c, h, w = x.shape
    kx = (
        torch.tensor(
            [[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]], dtype=x.dtype
        )
        / 8.0
    )
    ky = kx.t().contiguous()
    kernel = torch.stack([kx, ky]).unsqueeze(1)              # (2,1,3,3)
    xp = F.pad(x.reshape(b * c, 1, h, w), (1, 1, 1, 1), mode="replicate")
    out = F.conv2d(xp, kernel)                               # cross-correlation
    return out.reshape(b, c, 2, h, w)


def depth_to_normals(depth: torch.Tensor, camera_matrix: torch.Tensor) -> torch.Tensor:
    """depth (B,1,H,W), camera_matrix (B,3,3) -> unit normals (B,3,H,W)."""
    camera_matrix = camera_matrix.to(depth.device)
    xyz = depth_to_3d(depth, camera_matrix)
    grad = spatial_gradient(xyz)
    a = grad[:, :, 0]
    b = grad[:, :, 1]
    normals = torch.cross(a, b, dim=1)
    return F.normalize(normals, p=2, dim=1)
