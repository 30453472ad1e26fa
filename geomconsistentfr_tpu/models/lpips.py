"""LPIPS perceptual metric (AlexNet / VGG16 / SqueezeNet trunks) in Flax.

Replaces the vendored PerceptualSimilarity library for the eval protocol
(PerceptualSimilarity/lpips/lpips.py:22-241, test_network.py:30-52):
  * inputs scaled to [-1, 1], then the ScalingLayer normalisation
    (shift [-.030,-.088,-.188], scale [.458,.448,.450], lpips.py:152-159)
  * a feature trunk with ReLU taps per pretrained_networks.py's slices:
    alexnet (5 taps), vgg16 (5 taps: relu{1_2,2_2,3_3,4_3,5_3}), or
    squeezenet1_1 (7 taps, ceil-mode pools)
  * per-tap unit-L2 channel normalisation (eps 1e-10), squared difference,
    learned 1x1 linear head, bilinear-upsampled to input size when
    spatial=True, summed over taps.

Weights: the linear heads for all three trunks ship with the reference
(lpips/weights/v0.1/{alex,vgg,squeeze}.pth — load with `load_lin_weights`);
the trunks come from torchvision (`convert_trunk`). This environment has no
torchvision/model zoo, so `LPIPSMetric` raises a clear error unless trunk
weights are supplied (or `allow_random_trunk=True` for smoke tests).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array

_SHIFT = np.asarray([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.asarray([0.458, 0.448, 0.450], np.float32)

# torchvision AlexNet `features` conv layout: (out, in, k, stride, pad)
_ALEX_CONVS = (
    (64, 3, 11, 4, 2),
    (192, 64, 5, 1, 2),
    (384, 192, 3, 1, 1),
    (256, 384, 3, 1, 1),
    (256, 256, 3, 1, 1),
)
# maxpool(3, stride 2) after taps 0 and 1.
_POOL_AFTER = (0, 1)


class AlexFeatures(nn.Module):
    """AlexNet feature trunk returning the five ReLU taps (NHWC)."""

    @nn.compact
    def __call__(self, x: Array) -> Sequence[Array]:
        taps = []
        for i, (out, _, k, s, p) in enumerate(_ALEX_CONVS):
            x = nn.Conv(
                out,
                (k, k),
                strides=(s, s),
                padding=((p, p), (p, p)),
                name=f"conv{i}",
            )(x)
            x = nn.relu(x)
            taps.append(x)
            if i in _POOL_AFTER:
                x = nn.max_pool(x, (3, 3), strides=(2, 2))
        return taps


# torchvision vgg16 `features` conv output channels; taps after the ReLU of
# convs 1/3/6/9/12 (= features 3/8/15/22/29, pretrained_networks.py vgg16
# slices); maxpool(2, stride 2) after each tap except the last.
_VGG_CHANNELS = (64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512)
_VGG_TAP_AFTER = (1, 3, 6, 9, 12)


class VGG16Features(nn.Module):
    """VGG16 feature trunk returning relu{1_2,2_2,3_3,4_3,5_3} (NHWC)."""

    @nn.compact
    def __call__(self, x: Array) -> Sequence[Array]:
        taps = []
        for i, out in enumerate(_VGG_CHANNELS):
            x = nn.Conv(
                out, (3, 3), padding=((1, 1), (1, 1)), name=f"conv{i}"
            )(x)
            x = nn.relu(x)
            if i in _VGG_TAP_AFTER:
                taps.append(x)
                if i != _VGG_TAP_AFTER[-1]:
                    x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return taps


def _max_pool_ceil(x: Array, k: int = 3, s: int = 2) -> Array:
    """torch MaxPool2d(k, s, ceil_mode=True): pad bottom/right with -inf."""
    h, w = x.shape[1], x.shape[2]
    out_h = -(-(h - k) // s) + 1
    out_w = -(-(w - k) // s) + 1
    pad_h = max(0, (out_h - 1) * s + k - h)
    pad_w = max(0, (out_w - 1) * s + k - w)
    return nn.max_pool(
        x, (k, k), strides=(s, s), padding=((0, pad_h), (0, pad_w))
    )


# torchvision squeezenet1_1 fire modules keyed by their `features` index:
# (squeeze, expand1x1, expand3x3) channels. Slice taps per
# pretrained_networks.py squeezenet: after features 1, 4, 7, 9, 10, 11, 12;
# ceil-mode maxpool(3, 2) at features 2, 5, 8.
_SQUEEZE_FIRES = {
    3: (16, 64, 64),
    4: (16, 64, 64),
    6: (32, 128, 128),
    7: (32, 128, 128),
    9: (48, 192, 192),
    10: (48, 192, 192),
    11: (64, 256, 256),
    12: (64, 256, 256),
}
_SQUEEZE_TAP_AFTER = (1, 4, 7, 9, 10, 11, 12)
_SQUEEZE_POOL_AT = (2, 5, 8)


class SqueezeFeatures(nn.Module):
    """SqueezeNet1_1 feature trunk returning the seven slice taps (NHWC)."""

    @nn.compact
    def __call__(self, x: Array) -> Sequence[Array]:
        def fire(x, idx, squeeze, e1, e3):
            s = nn.relu(
                nn.Conv(squeeze, (1, 1), name=f"fire{idx}_squeeze")(x)
            )
            a = nn.relu(nn.Conv(e1, (1, 1), name=f"fire{idx}_expand1")(s))
            b = nn.relu(
                nn.Conv(e3, (3, 3), padding=((1, 1), (1, 1)),
                        name=f"fire{idx}_expand3")(s)
            )
            return jnp.concatenate([a, b], axis=-1)

        taps = []
        # features.0: Conv2d(3, 64, 3, stride=2, padding=0) + ReLU
        x = nn.relu(
            nn.Conv(64, (3, 3), strides=(2, 2), padding="VALID", name="conv0")(x)
        )
        for idx in range(1, 13):
            if idx in _SQUEEZE_POOL_AT:
                x = _max_pool_ceil(x)
            elif idx in _SQUEEZE_FIRES:
                x = fire(x, idx, *_SQUEEZE_FIRES[idx])
            if idx in _SQUEEZE_TAP_AFTER:
                taps.append(x)
        return taps


TRUNKS = {
    "alex": (AlexFeatures, 5),
    "vgg": (VGG16Features, 5),
    "squeeze": (SqueezeFeatures, 7),
}


def _normalize_channels(x: Array, eps: float = 1e-10) -> Array:
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / (norm + eps)


def _upsample_bilinear(x: Array, size: tuple[int, int]) -> Array:
    return jax.image.resize(
        x, (x.shape[0], size[0], size[1], x.shape[-1]), method="bilinear"
    )


class LPIPS(nn.Module):
    """Full LPIPS: trunk taps -> normalise -> diff^2 -> lin heads -> sum."""

    spatial: bool = True
    net: str = "alex"  # 'alex' | 'vgg' | 'squeeze' (lpips.py:32-40)

    @nn.compact
    def __call__(self, x: Array, y: Array) -> Array:
        """x, y: (B, H, W, 3) in [-1, 1]. Returns (B, H, W) if spatial else (B,)."""
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)
        trunk_cls, _ = TRUNKS[self.net]
        trunk = trunk_cls(name="trunk")
        fx = trunk((x - shift) / scale)
        fy = trunk((y - shift) / scale)

        h, w = x.shape[1], x.shape[2]
        total = None
        for i, (a, b) in enumerate(zip(fx, fy)):
            d = jnp.square(_normalize_channels(a) - _normalize_channels(b))
            lin = nn.Conv(1, (1, 1), use_bias=False, name=f"lin{i}")(d)
            if self.spatial:
                lin = _upsample_bilinear(lin, (h, w))[..., 0]
            else:
                lin = jnp.mean(lin, axis=(1, 2))[..., 0]
            total = lin if total is None else total + lin
        return total


def load_lin_weights(path: str) -> Dict[str, dict]:
    """Load linear-head weights: the reference's bundled .pth files
    (lpips/weights/v0.1/{alex,vgg,squeeze}.pth) or an .npz exported by
    LPIPS2AFCTrainer.save_lin_weights (same `lin{i}.model.1.weight` keys).

    Reads every head present (5 for alex/vgg, 7 for squeeze)."""
    if path.endswith(".npz"):
        with np.load(path) as z:
            state = {k: np.asarray(z[k]) for k in z.files}
    else:
        import torch

        raw = torch.load(path, map_location="cpu")
        state = {k: v.numpy() for k, v in raw.items()}
    params = {}
    i = 0
    while f"lin{i}.model.1.weight" in state:
        w = np.asarray(state[f"lin{i}.model.1.weight"])  # (1, C, 1, 1)
        params[f"lin{i}"] = {"kernel": w.transpose(2, 3, 1, 0).astype(np.float32)}
        i += 1
    if not params:
        raise ValueError(f"no lin-head keys in {path}")
    return params


# torchvision `features` conv keys per trunk (what `load_trunk_state`
# validates and `convert_trunk` reads).
_TRUNK_CONV_KEYS = {
    "alex": tuple(f"features.{sid}" for sid in (0, 3, 6, 8, 10)),
    "vgg": tuple(
        f"features.{sid}" for sid in (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
    ),
    "squeeze": ("features.0",)
    + tuple(
        f"features.{sid}.{part}"
        for sid in (3, 4, 6, 7, 9, 10, 11, 12)
        for part in ("squeeze", "expand1x1", "expand3x3")
    ),
}


def load_trunk_state(path: str, net: str = "alex") -> Dict[str, "np.ndarray"]:
    """Load a torchvision trunk state_dict from .pth/.pt (torch) or .npz.

    Accepts either the bare `features.*` layout or a checkpoint nesting it
    under 'state_dict'. Returns numpy arrays keyed exactly like the
    torchvision state_dict (what `convert_trunk` expects).
    """
    if path.endswith(".npz"):
        with np.load(path) as z:
            state = {k: np.asarray(z[k]) for k in z.files}
    else:
        import torch

        raw = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(raw, dict) and "state_dict" in raw:
            raw = raw["state_dict"]
        state = {
            k: v.detach().cpu().numpy()
            for k, v in raw.items()
            if hasattr(v, "detach")
        }
    missing = [
        f"{prefix}.{kind}"
        for prefix in _TRUNK_CONV_KEYS[net]
        for kind in ("weight", "bias")
        if f"{prefix}.{kind}" not in state
    ]
    if missing:
        raise ValueError(f"trunk state at {path} is missing keys: {missing}")
    return state


def _oihw_to_hwio(w) -> np.ndarray:
    return np.asarray(w, np.float32).transpose(2, 3, 1, 0)


def convert_trunk(state: Dict[str, "np.ndarray"], net: str = "alex") -> Dict[str, dict]:
    """torchvision `features` state_dict -> Flax trunk params for `net`."""
    params = {}
    if net in ("alex", "vgg"):
        conv_ids = [int(k.split(".")[1]) for k in _TRUNK_CONV_KEYS[net]]
        for i, sid in enumerate(conv_ids):
            params[f"conv{i}"] = {
                "kernel": _oihw_to_hwio(state[f"features.{sid}.weight"]),
                "bias": np.asarray(state[f"features.{sid}.bias"], np.float32),
            }
    elif net == "squeeze":
        params["conv0"] = {
            "kernel": _oihw_to_hwio(state["features.0.weight"]),
            "bias": np.asarray(state["features.0.bias"], np.float32),
        }
        for sid in (3, 4, 6, 7, 9, 10, 11, 12):
            for part, ours in (
                ("squeeze", "squeeze"),
                ("expand1x1", "expand1"),
                ("expand3x3", "expand3"),
            ):
                params[f"fire{sid}_{ours}"] = {
                    "kernel": _oihw_to_hwio(state[f"features.{sid}.{part}.weight"]),
                    "bias": np.asarray(
                        state[f"features.{sid}.{part}.bias"], np.float32
                    ),
                }
    else:
        raise ValueError(f"unknown LPIPS net: {net}")
    return params


def convert_alexnet_features(state: Dict[str, "np.ndarray"]) -> Dict[str, dict]:
    """Back-compat alias for convert_trunk(state, 'alex')."""
    return convert_trunk(state, "alex")


class LPIPSMetric:
    """Callable matching the eval harness: (gt01, pred01) -> (H, W) map."""

    _LIN_DIR = "/root/reference/PerceptualSimilarity/lpips/weights/v0.1"

    def __init__(
        self,
        lin_weights_path: Optional[str] = None,
        trunk_state: Optional[Dict] = None,
        allow_random_trunk: bool = False,
        net: str = "alex",
    ):
        if net not in TRUNKS:
            raise ValueError(f"unknown LPIPS net: {net!r} (want {set(TRUNKS)})")
        if lin_weights_path is None:
            lin_weights_path = f"{self._LIN_DIR}/{net}.pth"
        model = LPIPS(spatial=True, net=net)
        rng = jax.random.PRNGKey(0)
        dummy = jnp.zeros((1, 64, 64, 3))
        variables = model.init(rng, dummy, dummy)
        params = dict(variables["params"])
        if trunk_state is not None:
            params["trunk"] = convert_trunk(trunk_state, net)
        elif not allow_random_trunk:
            raise RuntimeError(
                f"LPIPS needs {net} trunk weights (torchvision state_dict). "
                "This offline environment bundles only the linear heads; "
                "pass trunk_state= or allow_random_trunk=True."
            )
        try:
            params.update(load_lin_weights(lin_weights_path))
        except (FileNotFoundError, ImportError):
            # ImportError: load_lin_weights needs torch to read the bundled
            # .pth; the allow_random_trunk smoke path must work without it.
            if not allow_random_trunk:
                raise
        self._variables = {"params": params}
        self._fn = jax.jit(lambda v, a, b: model.apply(v, a, b))

    def __call__(self, gt01: np.ndarray, pred01: np.ndarray) -> np.ndarray:
        a = jnp.asarray(gt01, jnp.float32)[None] * 2.0 - 1.0
        b = jnp.asarray(pred01, jnp.float32)[None] * 2.0 - 1.0
        return np.asarray(self._fn(self._variables, a, b))[0]
