"""Convert reference PyTorch checkpoints (.pth) to Flax variables.

The reference state dict (e.g. model_lighting_transfer/model_epoch106.pth,
391 tensors) is a flat OrderedDict of:
  conv_*.weight   (O, I, kh, kw)  -> params[name]['kernel'] (kh, kw, I, O)
  deconv_*.weight (I, O, kh, kw)  -> spatially flipped + channel-transposed:
      stride-1/pad-1 ConvTranspose2d(x, W) == Conv2d(x, flip_hw(W^T)), so the
      Flax kernel is W.flip(kh, kw).transpose(kh, kw, I, O).
  linear_*.weight (out, in)       -> params[name]['kernel'] (in, out)
  *.bias                          -> params[name]['bias']
  bn_*.weight / bias              -> params[name]['scale' / 'bias']
  bn_*.running_mean / running_var -> batch_stats[name]['mean' / 'var']
  bn_*.num_batches_tracked        -> dropped
PatchGAN checkpoints (conv1..conv5, bn2..bn4) convert with the same rules.

Works on plain numpy dicts; `load_torch_checkpoint` imports torch lazily.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth state dict into {name: float32 numpy array}."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.detach().cpu().numpy() for k, v in state.items()}


def torch_state_to_variables(state: Mapping[str, np.ndarray]) -> Dict[str, dict]:
    """Map a reference state dict to Flax {'params': ..., 'batch_stats': ...}."""
    params: Dict[str, dict] = {}
    batch_stats: Dict[str, dict] = {}

    for key, value in state.items():
        if key.endswith("num_batches_tracked"):
            continue
        module, leaf = key.rsplit(".", 1)
        value = np.asarray(value, dtype=np.float32)

        if module.startswith("bn"):
            if leaf == "weight":
                params.setdefault(module, {})["scale"] = value
            elif leaf == "bias":
                params.setdefault(module, {})["bias"] = value
            elif leaf == "running_mean":
                batch_stats.setdefault(module, {})["mean"] = value
            elif leaf == "running_var":
                batch_stats.setdefault(module, {})["var"] = value
            else:
                raise ValueError(f"unexpected BatchNorm leaf: {key}")
            continue

        if leaf == "bias":
            params.setdefault(module, {})["bias"] = value
            continue
        assert leaf == "weight", key

        if module.startswith("linear"):
            kernel = value.T  # (out, in) -> (in, out)
        elif module.startswith("deconv"):
            # (I, O, kh, kw) -> flip spatial -> (kh, kw, I, O)
            kernel = value[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)
        else:
            # conv: (O, I, kh, kw) -> (kh, kw, I, O)
            kernel = value.transpose(2, 3, 1, 0)
        params.setdefault(module, {})["kernel"] = np.ascontiguousarray(kernel)

    return {"params": params, "batch_stats": batch_stats}


def load_relightnet_variables(path: str) -> Dict[str, dict]:
    """Convenience: .pth -> Flax variables ready for RelightNet.apply."""
    return torch_state_to_variables(load_torch_checkpoint(path))


def transfer_to_target_variant(variables: Mapping[str, Mapping]) -> Dict[str, dict]:
    """Embed transfer-variant weights into the target-variant architecture.

    The two reference families differ only in the nine projection shortcuts:
    1x1 bias-free (transfer) vs 3x3 with bias (target). A 1x1 conv is exactly
    a 3x3 conv whose only nonzero tap is the centre, with zero bias — so the
    bundled transfer checkpoint (model_epoch106.pth) can drive the
    target-lighting pipeline with an identical function. (The reference's own
    target checkpoint, model/model_epoch99.pth, is a missing large blob
    upstream; see /root/reference/.MISSING_LARGE_BLOBS.)
    """
    shortcut_names = [
        "conv_shortcut_h1_out",
        "conv_shortcut_h2_out",
        "conv_shortcut_h3_out",
        "deconv_albedo_shortcut_all_features",
        "deconv_albedo_shortcut_h5_out",
        "deconv_albedo_shortcut_h6_out",
        "deconv_depth_shortcut_all_features",
        "deconv_depth_shortcut_h5_out",
        "deconv_depth_shortcut_h6_out",
    ]
    params = {k: dict(v) for k, v in variables["params"].items()}
    for name in shortcut_names:
        kernel = np.asarray(params[name]["kernel"])  # (1, 1, I, O)
        assert kernel.shape[:2] == (1, 1), (name, kernel.shape)
        padded = np.zeros((3, 3, *kernel.shape[2:]), kernel.dtype)
        padded[1, 1] = kernel[0, 0]
        params[name] = {
            "kernel": padded,
            "bias": np.zeros((kernel.shape[-1],), kernel.dtype),
        }
    return {"params": params, "batch_stats": dict(variables["batch_stats"])}


def variables_to_torch_state(variables: Mapping[str, Mapping]) -> Dict[str, np.ndarray]:
    """Inverse mapping (Flax -> reference .pth layout) for interop/export."""
    state: Dict[str, np.ndarray] = {}
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    for module, leaves in params.items():
        for leaf, value in leaves.items():
            value = np.asarray(value)
            if module.startswith("bn"):
                name = "weight" if leaf == "scale" else "bias"
                state[f"{module}.{name}"] = value
            elif leaf == "bias":
                state[f"{module}.bias"] = value
            elif module.startswith("linear"):
                state[f"{module}.weight"] = value.T
            elif module.startswith("deconv"):
                state[f"{module}.weight"] = np.ascontiguousarray(
                    value.transpose(2, 3, 0, 1)[:, :, ::-1, ::-1]
                )
            else:
                state[f"{module}.weight"] = value.transpose(3, 2, 0, 1)

    for module, leaves in batch_stats.items():
        state[f"{module}.running_mean"] = np.asarray(leaves["mean"])
        state[f"{module}.running_var"] = np.asarray(leaves["var"])
        state[f"{module}.num_batches_tracked"] = np.asarray(0, dtype=np.int64)

    return state
