"""2AFC training harness for the LPIPS linear heads (optax).

TPU-native equivalent of the vendored library's training mode
(PerceptualSimilarity/lpips/trainer.py:1-280): a Dist2Logit ranking net maps
a distance pair (d0, d1) to the predicted human judgement, a BCE ranking
loss trains it jointly with the LPIPS 1x1 linear heads (AlexNet trunk
frozen, as in the reference's `pnet_tune=False` default), Adam(lr, beta1=.5)
(trainer.py:70), and the lin-head kernels are clamped to >= 0 after every
step (trainer.py:105-108 `clamp_weights`). 2AFC/JND *scoring* lives in
metrics/perceptual.py.

Formulas transcribed:
  * Dist2LogitLayer (lpips.py:169-184): 1x1 convs 5 -> 32 -> 32 -> 1 with
    LeakyReLU(0.2) and a final sigmoid, fed
    cat(d0, d1, d0-d1, d0/(d1+eps), d1/(d0+eps)), eps=0.1;
  * BCERankingLoss (lpips.py:186-196): BCE(logit, (judge+1)/2) where the
    trainer passes judge*2-1 (trainer.py:131), so the target is the raw
    human fraction in [0, 1];
  * accuracy (trainer.py:138-142): (d1<d0)*judge + (1-(d1<d0))*(1-judge).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from geomconsistentfr_tpu.models.lpips import LPIPS

Array = jax.Array


class Dist2Logit(nn.Module):
    """Distance pair -> predicted-judgement probability (lpips.py:169-184)."""

    chn_mid: int = 32

    @nn.compact
    def __call__(self, d0: Array, d1: Array, eps: float = 0.1) -> Array:
        # d0, d1: (B,) scalar distances -> (B, 1, 1, 5) feature "image".
        feats = jnp.stack(
            [d0, d1, d0 - d1, d0 / (d1 + eps), d1 / (d0 + eps)], axis=-1
        )[:, None, None, :]
        x = nn.Conv(self.chn_mid, (1, 1), name="fc0")(feats)
        x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(self.chn_mid, (1, 1), name="fc1")(x)
        x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(1, (1, 1), name="fc2")(x)
        return jax.nn.sigmoid(x)[:, 0, 0, 0]  # (B,) probabilities


def bce_ranking_loss(prob: Array, judge: Array, eps: float = 1e-7) -> Array:
    """BCELoss(prob, judge): judge is the human fraction preferring p1."""
    prob = jnp.clip(prob, eps, 1.0 - eps)
    return -jnp.mean(judge * jnp.log(prob) + (1.0 - judge) * jnp.log(1.0 - prob))


def compute_accuracy(d0: Array, d1: Array, judge: Array) -> Array:
    """Fraction of human mass agreeing with the metric (trainer.py:138-142)."""
    d1_lt_d0 = (d1 < d0).astype(judge.dtype)
    return jnp.mean(d1_lt_d0 * judge + (1.0 - d1_lt_d0) * (1.0 - judge))


class LPIPS2AFCTrainer:
    """Train the LPIPS lin heads + ranking net on 2AFC triples.

    Batches are dicts of float arrays in [0, 1]:
      ref/p0/p1: (B, H, W, 3); judge: (B,) human fraction preferring p1.
    Only the lin heads and the ranking net receive gradients; the trunk is
    frozen (reference default pnet_tune=False, trainer.py:48-50).
    """

    def __init__(
        self,
        trunk_state: Optional[Dict] = None,
        allow_random_trunk: bool = False,
        lr: float = 1e-4,
        beta1: float = 0.5,
        seed: int = 0,
        net: str = "alex",
    ):
        if trunk_state is None and not allow_random_trunk:
            raise RuntimeError(
                f"LPIPS2AFCTrainer needs {net} trunk weights; pass "
                "trunk_state= or allow_random_trunk=True (smoke only)."
            )
        self.net = net
        self.lpips = LPIPS(spatial=False, net=net)
        self.ranknet = Dist2Logit()
        rng = jax.random.PRNGKey(seed)
        r1, r2 = jax.random.split(rng)
        dummy = jnp.zeros((1, 64, 64, 3))
        variables = self.lpips.init(r1, dummy, dummy)
        params = dict(variables["params"])
        if trunk_state is not None:
            from geomconsistentfr_tpu.models.lpips import convert_trunk

            params["trunk"] = convert_trunk(trunk_state, net)
        self.trunk = params.pop("trunk")  # frozen
        lin = {k: v for k, v in params.items() if k.startswith("lin")}
        rank = self.ranknet.init(r2, jnp.zeros((1,)), jnp.zeros((1,)))["params"]
        self.params = {"lin": lin, "rank": rank}
        self.lr = lr
        self._current_lr = lr
        self._beta1 = beta1
        self.tx = self._make_tx(lr)
        self.opt_state = self.tx.init(self.params)
        self._step = jax.jit(self._make_step())

    def _make_tx(self, lr: float):
        return optax.adam(lr, b1=self._beta1, b2=0.999)

    def decay_learning_rate(self, nepoch_decay: int) -> float:
        """Linear LR decay, trainer.py:189-197: lr -= initial_lr/nepoch_decay
        per call (optimizer moments are preserved)."""
        self._current_lr = self._current_lr - self.lr / nepoch_decay
        self.tx = self._make_tx(self._current_lr)
        self._step = jax.jit(self._make_step())
        return self._current_lr

    def _distances(self, lin_params, a: Array, b: Array) -> Array:
        variables = {"params": {**lin_params, "trunk": self.trunk}}
        return self.lpips.apply(variables, a * 2.0 - 1.0, b * 2.0 - 1.0)

    def _make_step(self):
        def loss_fn(params, batch):
            d0 = self._distances(params["lin"], batch["ref"], batch["p0"])
            d1 = self._distances(params["lin"], batch["ref"], batch["p1"])
            prob = self.ranknet.apply({"params": params["rank"]}, d0, d1)
            loss = bce_ranking_loss(prob, batch["judge"])
            return loss, (d0, d1)

        def step(params, opt_state, batch):
            (loss, (d0, d1)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch
            )
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            # clamp_weights (trainer.py:105-108): 1x1 lin kernels >= 0.
            params = dict(params)
            params["lin"] = jax.tree.map(
                lambda k: jnp.maximum(k, 0.0), params["lin"]
            )
            acc = compute_accuracy(d0, d1, batch["judge"])
            return params, opt_state, {"loss_total": loss, "acc_r": acc}

        return step

    def train_step(self, batch: Dict[str, np.ndarray]) -> Dict[str, float]:
        batch = {k: jnp.asarray(v, jnp.float32) for k, v in batch.items()}
        self.params, self.opt_state, metrics = self._step(
            self.params, self.opt_state, batch
        )
        return {k: float(v) for k, v in metrics.items()}

    def evaluate(self, batch: Dict[str, np.ndarray]) -> Dict[str, float]:
        batch = {k: jnp.asarray(v, jnp.float32) for k, v in batch.items()}
        d0 = self._distances(self.params["lin"], batch["ref"], batch["p0"])
        d1 = self._distances(self.params["lin"], batch["ref"], batch["p1"])
        return {
            "acc_r": float(compute_accuracy(d0, d1, batch["judge"])),
            "d0_mean": float(jnp.mean(d0)),
            "d1_mean": float(jnp.mean(d1)),
        }

    def save_lin_weights(self, path: str) -> None:
        """Export the trained lin heads in the reference's bundled layout
        (`lin{i}.model.1.weight`, (1, C, 1, 1) OIHW — lpips/weights/v0.1/
        *.pth); .pth via torch, .npz with the same keys otherwise. Files
        round-trip through models.lpips.load_lin_weights / LPIPSMetric."""
        state = {}
        for name, leaf in self.params["lin"].items():
            kern = np.asarray(leaf["kernel"], np.float32)  # (1, 1, C, 1) HWIO
            state[f"{name}.model.1.weight"] = kern.transpose(3, 2, 0, 1)
        if path.endswith(".npz"):
            np.savez(path, **state)
            return
        import torch

        torch.save({k: torch.from_numpy(v) for k, v in state.items()}, path)
