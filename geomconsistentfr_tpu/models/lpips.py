"""LPIPS perceptual metric (AlexNet trunk) in Flax.

Replaces the vendored PerceptualSimilarity library for the eval protocol
(PerceptualSimilarity/lpips/lpips.py:22-241, test_network.py:30-52):
  * inputs scaled to [-1, 1], then the ScalingLayer normalisation
    (shift [-.030,-.088,-.188], scale [.458,.448,.450], lpips.py:152-159)
  * AlexNet features trunk; taps after each of the five ReLUs
    (pretrained_networks.py alexnet slices)
  * per-tap unit-L2 channel normalisation (eps 1e-10), squared difference,
    learned 1x1 linear head, bilinear-upsampled to input size when
    spatial=True, summed over taps.

Weights: the five linear heads ship with the reference
(lpips/weights/v0.1/alex.pth — load with `load_lin_weights`); the AlexNet
trunk comes from torchvision (`convert_alexnet_features`). This environment
has no torchvision/model zoo, so `lpips_distance` raises a clear error unless
trunk weights are supplied (or `allow_random_trunk=True` for smoke tests).
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

    @nn.compact
    def __call__(self, x: Array, y: Array) -> Array:
        """x, y: (B, H, W, 3) in [-1, 1]. Returns (B, H, W) if spatial else (B,)."""
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)
        trunk = AlexFeatures(name="trunk")
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
    """Load the bundled linear-head weights (lpips/weights/v0.1/alex.pth)."""
    import torch

    state = torch.load(path, map_location="cpu")
    params = {}
    for i in range(5):
        w = state[f"lin{i}.model.1.weight"].numpy()  # (1, C, 1, 1)
        params[f"lin{i}"] = {"kernel": w.transpose(2, 3, 1, 0).astype(np.float32)}
    return params


def load_trunk_state(path: str) -> Dict[str, "np.ndarray"]:
    """Load a torchvision-AlexNet state_dict from .pth/.pt (torch) or .npz.

    Accepts either the bare `features.N.weight/bias` layout or a checkpoint
    nesting it under 'state_dict'. Returns numpy arrays keyed exactly like
    the torchvision state_dict (what `convert_alexnet_features` expects).
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
        f"features.{sid}.{kind}"
        for sid in (0, 3, 6, 8, 10)
        for kind in ("weight", "bias")
        if f"features.{sid}.{kind}" not in state
    ]
    if missing:
        raise ValueError(f"trunk state at {path} is missing keys: {missing}")
    return state


def convert_alexnet_features(state: Dict[str, "np.ndarray"]) -> Dict[str, dict]:
    """torchvision alexnet state_dict (features.N.weight/bias) -> trunk params."""
    conv_ids = [0, 3, 6, 8, 10]
    params = {}
    for i, sid in enumerate(conv_ids):
        w = np.asarray(state[f"features.{sid}.weight"], np.float32)
        b = np.asarray(state[f"features.{sid}.bias"], np.float32)
        params[f"conv{i}"] = {"kernel": w.transpose(2, 3, 1, 0), "bias": b}
    return params


class LPIPSMetric:
    """Callable matching the eval harness: (gt01, pred01) -> (H, W) map."""

    def __init__(
        self,
        lin_weights_path: str = "/root/reference/PerceptualSimilarity/lpips/weights/v0.1/alex.pth",
        trunk_state: Optional[Dict] = None,
        allow_random_trunk: bool = False,
    ):
        model = LPIPS(spatial=True)
        rng = jax.random.PRNGKey(0)
        dummy = jnp.zeros((1, 64, 64, 3))
        variables = model.init(rng, dummy, dummy)
        params = dict(variables["params"])
        if trunk_state is not None:
            params["trunk"] = convert_alexnet_features(trunk_state)
        elif not allow_random_trunk:
            raise RuntimeError(
                "LPIPS needs AlexNet trunk weights (torchvision alexnet "
                "state_dict). This offline environment bundles only the "
                "linear heads; pass trunk_state= or allow_random_trunk=True."
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
