"""Image IO and visualisation transforms for inference outputs.

The reference writes six PNGs per relit image (test_raytracing_...py:603-608,
test_..._lighting_transfer.py:574-579) with specific visualisation transforms;
these helpers reproduce them with RGB (imageio) conventions.

Encode/decode goes through OpenCV when available: PNG is lossless either way,
and cv2's default zlib setting encodes a 256x256 RGB frame ~6x faster than
imageio/Pillow — the six-PNG-per-image eval dump (5,172 files for the
862-image protocol) is host-encode-bound on this machine, not device-bound.
"""

from __future__ import annotations

import os

import numpy as np

try:  # pragma: no cover - exercised implicitly everywhere
    import cv2 as _cv2
except ImportError:  # pragma: no cover
    _cv2 = None


def _imread(path: str) -> np.ndarray:
    """Read an image file as RGB (or grayscale) uint8-ish ndarray."""
    if _cv2 is not None:
        arr = _cv2.imread(path, _cv2.IMREAD_UNCHANGED)
        if arr is not None:
            if arr.ndim == 3 and arr.shape[-1] >= 3:
                # BGR(A) -> RGB(A)
                arr = arr[..., [2, 1, 0] + list(range(3, arr.shape[-1]))]
            return arr
    import imageio.v2 as imageio

    return np.asarray(imageio.imread(path))


def read_image(path: str, size: int = 256) -> np.ndarray:
    """Read an image as float32 RGB in [0, 1], resized to (size, size)."""
    img = np.asarray(_imread(path), dtype=np.float64) / 255.0
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    if img.shape[-1] == 4:
        img = img[..., :3]
    if img.shape[0] != size or img.shape[1] != size:
        import cv2

        img = cv2.resize(img, (size, size))
    return img.astype(np.float32)


def read_image_u8(path: str, size: int = 256) -> np.ndarray:
    """Read an image as uint8 RGB (H, W, 3), resized to (size, size).

    For device pipelines that convert to [0, 1] f32 on device
    (infer.Relighter accepts uint8 batches): uploading bytes costs 1/4 of
    f32 over the host link. At native size the values are exactly the
    PNG-decoded bytes; resizing interpolates in uint8."""
    img = np.asarray(_imread(path))
    if img.dtype != np.uint8:
        img = np.clip(img, 0, 255).astype(np.uint8)
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    if img.shape[-1] == 4:
        img = img[..., :3]
    if img.shape[0] != size or img.shape[1] != size:
        import cv2

        img = cv2.resize(img, (size, size))
    return img


def read_mask_u8(path: str, size: int = 256) -> np.ndarray:
    """Read a face mask as uint8 (H, W) (device pipelines divide by 255)."""
    m = np.asarray(_imread(path))
    if m.dtype != np.uint8:
        m = np.clip(m, 0, 255).astype(np.uint8)
    if m.ndim == 3:
        m = m[..., 0]
    if m.shape[0] != size or m.shape[1] != size:
        import cv2

        m = cv2.resize(m, (size, size), interpolation=cv2.INTER_NEAREST)
    return m


def read_mask(path: str, size: int = 256) -> np.ndarray:
    """Read a face mask as float32 in [0, 1] (values /255, reference :586)."""
    m = np.asarray(_imread(path), dtype=np.float32)
    if m.ndim == 3:
        m = m[..., 0]
    if m.shape[0] != size or m.shape[1] != size:
        import cv2

        m = cv2.resize(m, (size, size), interpolation=cv2.INTER_NEAREST)
    return m / 255.0


def write_image(path: str, img01: np.ndarray) -> None:
    """Write a float image in [0, 1] (H, W[, C]) as an 8-bit PNG."""
    arr = np.clip(np.asarray(img01, np.float32) * 255.0, 0.0, 255.0).astype(
        np.uint8
    )
    write_image_u8(path, arr)


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


def write_image_u8(path: str, arr: np.ndarray) -> None:
    """Write an already-quantized uint8 image (H, W[, C]) as a PNG."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    if _cv2 is not None:
        bgr = arr[..., ::-1] if arr.ndim == 3 and arr.shape[-1] == 3 else arr
        if _cv2.imwrite(path, np.ascontiguousarray(bgr)):
            return
    import imageio.v2 as imageio

    imageio.imwrite(path, arr)


def save_visual_pack(out_dir: str, stem: str, pack_u8: np.ndarray) -> dict:
    """Write the six per-image PNGs from a packed uint8 (H, W, 12) tensor.

    Counterpart of `save_render_outputs` for the device-quantized path
    (infer.pack_visuals); the channel layout is infer.VISUAL_PACK_LAYOUT.
    """
    from geomconsistentfr_tpu.infer import VISUAL_PACK_LAYOUT

    paths = {}
    c = 0
    for kind, width in VISUAL_PACK_LAYOUT:
        img = pack_u8[..., c : c + width]
        if width == 1:
            img = img[..., 0]
        path = os.path.join(out_dir, f"{stem}_{kind}.png")
        write_image_u8(path, img)
        paths[kind] = path
        c += width
    return paths


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

    mask = np.asarray(mask, np.float32)
    mask3 = mask[..., None]  # broadcast against (H, W, 3)
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
