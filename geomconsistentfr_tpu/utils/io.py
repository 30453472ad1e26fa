"""Image IO and visualisation transforms for inference outputs.

The reference writes six PNGs per relit image (test_raytracing_...py:603-608,
test_..._lighting_transfer.py:574-579) with specific visualisation transforms;
these helpers reproduce them with RGB (imageio) conventions.
"""

from __future__ import annotations

import os

import numpy as np


def read_image(path: str, size: int = 256) -> np.ndarray:
    """Read an image as float32 RGB in [0, 1], resized to (size, size)."""
    import imageio.v2 as imageio

    img = np.asarray(imageio.imread(path), dtype=np.float64) / 255.0
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    if img.shape[-1] == 4:
        img = img[..., :3]
    if img.shape[0] != size or img.shape[1] != size:
        import cv2

        img = cv2.resize(img, (size, size))
    return img.astype(np.float32)


def read_mask(path: str, size: int = 256) -> np.ndarray:
    """Read a face mask as float32 in [0, 1] (values /255, reference :586)."""
    import imageio.v2 as imageio

    m = np.asarray(imageio.imread(path), dtype=np.float32)
    if m.ndim == 3:
        m = m[..., 0]
    if m.shape[0] != size or m.shape[1] != size:
        import cv2

        m = cv2.resize(m, (size, size), interpolation=cv2.INTER_NEAREST)
    return m / 255.0


def write_image(path: str, img01: np.ndarray) -> None:
    """Write a float image in [0, 1] (H, W[, C]) as an 8-bit PNG."""
    import imageio.v2 as imageio

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    arr = np.clip(np.asarray(img01) * 255.0, 0.0, 255.0).astype(np.uint8)
    imageio.imwrite(path, arr)


def composite_into_original(
    original: np.ndarray, rendered: np.ndarray, mask: np.ndarray
) -> np.ndarray:
    """Paste the relit face into the original image through the mask.

    Reference semantics (test_relight_single_image.py:618-619): where the mask
    is nonzero the output is `rendered * mask` (fractional masks attenuate).
    """
    mask3 = np.repeat(mask[..., None], 3, axis=-1)
    return np.where(mask3 > 0, rendered * mask3, original)


def depth_visualization(depth: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """-depth min-max normalised, masked (reference :594-597, :577)."""
    d = -np.asarray(depth, np.float64)
    d = (d - d.min()) / max(d.max() - d.min(), 1e-12)
    return d * mask


def normals_visualization(normals: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """(n+1)/2, masked (reference :599-601, :579)."""
    return (np.asarray(normals) + 1.0) / 2.0 * mask[..., None]


def save_render_outputs(out_dir: str, stem: str, outputs, mask: np.ndarray) -> dict:
    """Write the reference's six per-image outputs; returns {kind: path}.

    `outputs` is a RenderOutputs with leading batch axis of 1 (or none).
    """
    def first(x):
        x = np.asarray(x)
        return x[0] if x.ndim and x.shape[0] == 1 and x.ndim > 2 else x

    rendered = first(outputs.rendered)
    albedo = first(outputs.albedo)
    depth = first(outputs.depth)
    shading = first(outputs.final_shading)
    weights = first(outputs.shadow_mask_weights)
    normals = first(outputs.surface_normals)

    mask3 = np.repeat(mask[..., None], 3, axis=-1)
    paths = {}

    def emit(kind, img):
        path = os.path.join(out_dir, f"{stem}_{kind}.png")
        write_image(path, img)
        paths[kind] = path

    emit("rendered_image", rendered * mask3)
    emit("shadow_mask", weights * mask)
    emit("albedo", albedo * mask3)
    emit("depth", depth_visualization(depth, mask))
    emit("shading", shading * mask)
    emit("surface_normals", normals_visualization(normals, mask))
    return paths
