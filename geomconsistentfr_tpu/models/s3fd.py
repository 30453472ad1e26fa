"""Native S3FD face detector (the reference's crop-preprocessing detector).

The reference pipeline runs the SFD detector from the `face_alignment`
package before its crop geometry (recrop_CelebA-HQ_images.py:9-10,29):
`face_alignment.detection.sfd.FaceDetector.detect_from_image`, i.e. the
public S3FD single-shot face detector (Zhang et al., ICCV 2017) — a VGG16
trunk with L2Norm-scaled side heads, a max-out background label on the
stride-4 head, SSD-style anchor decoding (variances 0.1/0.2, anchor side =
4x stride) and greedy IoU NMS. That package is not installable in this
environment, so this module implements the SAME architecture natively:

  * `S3FD` — the network as a Flax module (NHWC, jittable, fully
    convolutional; bf16-able via `compute_dtype` though detection is a
    host-side preprocessing step and ships in f32).
  * `convert_s3fd_state_dict` — torch `s3fd.pth` checkpoint -> Flax params
    (OIHW -> HWIO, matching models/lpips.py's converter conventions), so
    the published weights drop in with zero code change when a copy
    exists on disk.
  * `decode_detections` / `nms` — the SSD anchor decode and NMS, in numpy
    (variable-length host-side postprocessing).
  * `detect_faces` — the full detect_from_image-equivalent: BGR mean
    subtraction ([104, 117, 123]), forward, per-head softmax, score>0.05
    candidate gather, decode, NMS at IoU 0.3, final score>0.5 filter.

Parity strategy (weights are environment-blocked, like the LPIPS trunks):
tests/oracles/s3fd_torch.py transcribes the same public architecture in
torch; tests share RANDOM weights through the converter and assert
head-logit and end-to-end box parity, which pins the layer graph, padding
semantics, L2Norm, max-out, decode and NMS. Real weights validate the last
mile when available.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array

# Detector input is the BGR image minus this mean (sfd detect(): the
# reference feeds its padded BGR frame, recrop_CelebA-HQ_images.py:29).
BGR_MEAN = (104.0, 117.0, 123.0)
# Per-head anchor strides; anchor side = 4 * stride.
STRIDES = (4, 8, 16, 32, 64, 128)
VARIANCES = (0.1, 0.2)
CANDIDATE_THRESHOLD = 0.05
NMS_IOU = 0.3
SCORE_THRESHOLD = 0.5

# (name, in_ch, out_ch, kernel, stride, padding); pools sit after the
# blocks in __call__. fc6's padding-3 3x3 conv grows the map by 4 — that
# is the S3FD definition, preserved for weight compatibility.
_VGG_CONVS: Sequence[Tuple[str, int, int, int, int, int]] = (
    ("conv1_1", 3, 64, 3, 1, 1), ("conv1_2", 64, 64, 3, 1, 1),
    ("conv2_1", 64, 128, 3, 1, 1), ("conv2_2", 128, 128, 3, 1, 1),
    ("conv3_1", 128, 256, 3, 1, 1), ("conv3_2", 256, 256, 3, 1, 1),
    ("conv3_3", 256, 256, 3, 1, 1),
    ("conv4_1", 256, 512, 3, 1, 1), ("conv4_2", 512, 512, 3, 1, 1),
    ("conv4_3", 512, 512, 3, 1, 1),
    ("conv5_1", 512, 512, 3, 1, 1), ("conv5_2", 512, 512, 3, 1, 1),
    ("conv5_3", 512, 512, 3, 1, 1),
    ("fc6", 512, 1024, 3, 1, 3), ("fc7", 1024, 1024, 1, 1, 0),
    ("conv6_1", 1024, 256, 1, 1, 0), ("conv6_2", 256, 512, 3, 2, 1),
    ("conv7_1", 512, 128, 1, 1, 0), ("conv7_2", 128, 256, 3, 2, 1),
)

# Detection heads: (name, in_ch, out_ch). conf1 has 4 channels (3 of them
# max-out background competitors); every other conf head has 2.
_HEADS: Sequence[Tuple[str, int, int]] = (
    ("conv3_3_norm_mbox_conf", 256, 4), ("conv3_3_norm_mbox_loc", 256, 4),
    ("conv4_3_norm_mbox_conf", 512, 2), ("conv4_3_norm_mbox_loc", 512, 4),
    ("conv5_3_norm_mbox_conf", 512, 2), ("conv5_3_norm_mbox_loc", 512, 4),
    ("fc7_mbox_conf", 1024, 2), ("fc7_mbox_loc", 1024, 4),
    ("conv6_2_mbox_conf", 512, 2), ("conv6_2_mbox_loc", 512, 4),
    ("conv7_2_mbox_conf", 256, 2), ("conv7_2_mbox_loc", 256, 4),
)

_L2NORM_SCALES = {"conv3_3_norm": 10.0, "conv4_3_norm": 8.0,
                  "conv5_3_norm": 5.0}


class L2Norm(nn.Module):
    """Per-channel L2 normalization with a learned scale (SSD's L2Norm)."""

    channels: int
    init_scale: float

    @nn.compact
    def __call__(self, x: Array) -> Array:
        w = self.param(
            "weight",
            lambda _key, shape: jnp.full(shape, self.init_scale, jnp.float32),
            (self.channels,),
        )
        norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True)) + 1e-10
        return x / norm * w


class S3FD(nn.Module):
    """S3FD network: 12 outputs [cls1, reg1, ..., cls6, reg6], NHWC.

    cls1 already has the max-out background label applied (2 channels out,
    like every other conf head). Softmax is NOT applied (decode does it).
    """

    @nn.compact
    def __call__(self, x: Array) -> List[Array]:
        convs = {}
        for name, _cin, cout, k, s, p in _VGG_CONVS:
            convs[name] = nn.Conv(
                cout, (k, k), strides=(s, s), padding=((p, p), (p, p)),
                name=name,
            )

        def cr(name, h):
            return nn.relu(convs[name](h))

        def pool(h):
            # torch F.max_pool2d(h, 2, 2): floor mode, no padding.
            return nn.max_pool(h, (2, 2), strides=(2, 2))

        h = cr("conv1_2", cr("conv1_1", x))
        h = pool(h)
        h = cr("conv2_2", cr("conv2_1", h))
        h = pool(h)
        h = cr("conv3_3", cr("conv3_2", cr("conv3_1", h)))
        f3_3 = h
        h = pool(h)
        h = cr("conv4_3", cr("conv4_2", cr("conv4_1", h)))
        f4_3 = h
        h = pool(h)
        h = cr("conv5_3", cr("conv5_2", cr("conv5_1", h)))
        f5_3 = h
        h = pool(h)
        ffc7 = cr("fc7", cr("fc6", h))
        f6_2 = cr("conv6_2", cr("conv6_1", ffc7))
        f7_2 = cr("conv7_2", cr("conv7_1", f6_2))

        f3_3 = L2Norm(256, _L2NORM_SCALES["conv3_3_norm"],
                      name="conv3_3_norm")(f3_3)
        f4_3 = L2Norm(512, _L2NORM_SCALES["conv4_3_norm"],
                      name="conv4_3_norm")(f4_3)
        f5_3 = L2Norm(512, _L2NORM_SCALES["conv5_3_norm"],
                      name="conv5_3_norm")(f5_3)

        heads = {}
        for name, _cin, cout in _HEADS:
            heads[name] = nn.Conv(cout, (3, 3), padding=((1, 1), (1, 1)),
                                  name=name)

        feats = {"conv3_3_norm": f3_3, "conv4_3_norm": f4_3,
                 "conv5_3_norm": f5_3, "fc7": ffc7, "conv6_2": f6_2,
                 "conv7_2": f7_2}
        outputs: List[Array] = []
        for i, src in enumerate(
            ("conv3_3_norm", "conv4_3_norm", "conv5_3_norm", "fc7",
             "conv6_2", "conv7_2")
        ):
            cls = heads[f"{src}_mbox_conf"](feats[src])
            reg = heads[f"{src}_mbox_loc"](feats[src])
            if i == 0:
                # Max-out background label: the 3 background competitors
                # collapse to their max; channel 3 is the face logit.
                bmax = jnp.max(cls[..., 0:3], axis=-1, keepdims=True)
                cls = jnp.concatenate([bmax, cls[..., 3:4]], axis=-1)
            outputs.append(cls)
            outputs.append(reg)
        return outputs


def init_s3fd(rng: "jax.random.PRNGKey | int" = 0) -> Dict:
    """Random-init parameters (tests / converter-target shape reference)."""
    if isinstance(rng, int):
        rng = jax.random.PRNGKey(rng)
    model = S3FD()
    return model.init(rng, jnp.zeros((1, 64, 64, 3), jnp.float32))


def _oihw_to_hwio(w: np.ndarray) -> np.ndarray:
    return np.asarray(w, np.float32).transpose(2, 3, 1, 0)


def convert_s3fd_state_dict(state: Dict[str, "np.ndarray"]) -> Dict:
    """torch s3fd state_dict -> Flax variables for `S3FD`.

    Accepts torch tensors or numpy arrays. Torch names are flat
    (`conv1_1.weight`, `conv3_3_norm.weight`, ...) and map 1:1 onto the
    module names above.
    """
    def to_np(v):
        return np.asarray(getattr(v, "numpy", lambda: v)(), np.float32)

    params: Dict[str, dict] = {}
    for name, *_rest in list(_VGG_CONVS) + [
        (n, ci, co, 3, 1, 1) for n, ci, co in _HEADS
    ]:
        params[name] = {
            "kernel": _oihw_to_hwio(to_np(state[f"{name}.weight"])),
            "bias": to_np(state[f"{name}.bias"]),
        }
    for name in _L2NORM_SCALES:
        params[name] = {"weight": to_np(state[f"{name}.weight"])}
    return {"params": params}


def load_s3fd_weights(path: str) -> Dict:
    """Load a torch `s3fd.pth` checkpoint into Flax variables."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    return convert_s3fd_state_dict(state)


def nms(boxes: np.ndarray, iou_threshold: float = NMS_IOU) -> List[int]:
    """Greedy IoU NMS over (N, 5) [x1, y1, x2, y2, score] rows.

    +1-inclusive box areas, matching the SFD postprocessing convention.
    """
    if len(boxes) == 0:
        return []
    x1, y1, x2, y2, s = (boxes[:, i] for i in range(5))
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = s.argsort()[::-1]
    keep: List[int] = []
    while order.size > 0:
        i = int(order[0])
        keep.append(i)
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        inter = w * h
        iou = inter / (areas[i] + areas[order[1:]] - inter)
        order = order[1:][iou <= iou_threshold]
    return keep


def decode_detections(
    outputs: Sequence[np.ndarray],
    candidate_threshold: float = CANDIDATE_THRESHOLD,
) -> np.ndarray:
    """SSD anchor decode of the 12 S3FD outputs -> (N, 5) candidate boxes.

    outputs: [cls1, reg1, ..., cls6, reg6], each (1, H_i, W_i, C) NHWC
    RAW logits (softmax applied here). Head i uses stride 2**(i+2) with a
    square anchor of side 4*stride centred at ((w+0.5)*stride,
    (h+0.5)*stride); decode uses variances (0.1, 0.2).
    """
    rows: List[List[float]] = []
    for i in range(len(outputs) // 2):
        cls = np.asarray(outputs[2 * i], np.float32)[0]
        reg = np.asarray(outputs[2 * i + 1], np.float32)[0]
        # Softmax over the 2 labels; [..., 1] is the face probability.
        e = np.exp(cls - cls.max(axis=-1, keepdims=True))
        prob = (e / e.sum(axis=-1, keepdims=True))[..., 1]
        stride = float(STRIDES[i])
        hs, ws = np.where(prob > candidate_threshold)
        for hh, ww in zip(hs, ws):
            axc = stride / 2 + ww * stride
            ayc = stride / 2 + hh * stride
            side = stride * 4
            loc = reg[hh, ww]
            cx = axc + loc[0] * VARIANCES[0] * side
            cy = ayc + loc[1] * VARIANCES[0] * side
            bw = side * np.exp(loc[2] * VARIANCES[1])
            bh = side * np.exp(loc[3] * VARIANCES[1])
            rows.append([cx - bw / 2, cy - bh / 2, cx - bw / 2 + bw,
                         cy - bh / 2 + bh, float(prob[hh, ww])])
    if not rows:
        return np.zeros((0, 5), np.float32)
    return np.asarray(rows, np.float32)


def preprocess_bgr(image_bgr: np.ndarray) -> np.ndarray:
    """(H, W, 3) BGR uint8/float -> (1, H, W, 3) mean-subtracted f32."""
    x = np.asarray(image_bgr, np.float32) - np.asarray(BGR_MEAN, np.float32)
    return x[None]


def detect_faces(
    image_bgr: np.ndarray,
    variables: Dict,
    score_threshold: float = SCORE_THRESHOLD,
    apply_fn=None,
) -> np.ndarray:
    """Full SFD detect_from_image equivalent: (N, 5) kept detections.

    image_bgr: (H, W, 3) BGR (the channel order the reference feeds,
    recrop_CelebA-HQ_images.py:29). Returns [x1, y1, x2, y2, score] rows
    sorted by descending score after NMS and the final score filter.
    """
    if apply_fn is None:
        apply_fn = jax.jit(S3FD().apply)
    outputs = apply_fn(variables, jnp.asarray(preprocess_bgr(image_bgr)))
    outputs = [np.asarray(o) for o in outputs]
    boxes = decode_detections(outputs)
    if len(boxes) == 0:
        return boxes
    boxes = boxes[nms(boxes, NMS_IOU)]
    boxes = boxes[boxes[:, 4] > score_threshold]
    return boxes[np.argsort(-boxes[:, 4])]
