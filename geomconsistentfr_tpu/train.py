"""Self-supervised GAN training (reference train_*.py:560-693), TPU-native.

Semantics reproduced:
  * one RelightNet forward per step, reused by both discriminator and
    generator phases (:618, :641);
  * discriminator sees composite-into-input fakes and raw inputs, is trained
    with 0.01-weighted BCE, and *steps only every GD_ratio-th batch* while its
    BatchNorm statistics update on every forward (:617-629);
  * generator total = recon + depth + ambient + direction + albedo + g_adv +
    DSSIM with the reference weights (:631-645);
  * two Adam(1e-4) optimizers with torch defaults (:589-590);
  * skip-connection gates open at epochs >8/>10/>12/>14 (:245-284 region);
  * lighting self-estimated from the input with z clamped >= 0 (:357-360).

TPU-native additions (no reference counterpart, SURVEY.md §2.3):
  * shard_map data parallelism over a 1-D `data` mesh axis; gradients and
    masked-loss numerators/denominators are psum-reduced so the update equals
    the reference's single-device global-batch computation;
  * cross-replica BatchNorm (pmean of moments) inside the modules;
  * step-level orbax checkpointing with resume (the reference can only save).
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Any, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax import struct

from geomconsistentfr_tpu.config import PipelineConfig, preset_target_lighting_train
from geomconsistentfr_tpu.losses import (
    discriminator_losses,
    generator_losses,
    masked_composite,
)
from geomconsistentfr_tpu.models.patchgan import PatchGAN
from geomconsistentfr_tpu.models.relightnet import RelightNet
from geomconsistentfr_tpu.parallel.mesh import (
    DATA_AXIS,
    make_mesh,
    shard_batch_spec,
    shard_map_fn,
)
from geomconsistentfr_tpu.render import render
from jax.sharding import PartitionSpec as P

Array = jax.Array


class TrainState(struct.PyTreeNode):
    step: Array
    params_g: Any
    batch_stats_g: Any
    opt_g: Any
    params_d: Any
    batch_stats_d: Any
    opt_d: Any


def make_optimizer(lr: float) -> optax.GradientTransformation:
    # torch.optim.Adam defaults (train_*.py:589-590).
    return optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)


def init_state(
    cfg: PipelineConfig, rng: jax.Array, batch_size: Optional[int] = None
) -> TrainState:
    def build(rng: jax.Array) -> TrainState:
        model = RelightNet(cfg=cfg.model)
        patchgan = PatchGAN()
        b = batch_size or cfg.train.batch_size
        h, w = cfg.render.img_height, cfg.render.img_width
        rng_g, rng_d = jax.random.split(rng)
        dummy = jnp.zeros((b, h, w, 3), jnp.float32)
        vars_g = model.init(rng_g, dummy, train=False)
        vars_d = patchgan.init(rng_d, dummy, train=False)
        tx = make_optimizer(cfg.train.learning_rate)
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params_g=vars_g["params"],
            batch_stats_g=vars_g["batch_stats"],
            opt_g=tx.init(vars_g["params"]),
            params_d=vars_d["params"],
            batch_stats_d=vars_d["batch_stats"],
            opt_d=tx.init(vars_d["params"]),
        )

    if jax.default_backend() == "cpu":
        return build(rng)
    # One jitted dispatch: eager flax init issues hundreds of small remote
    # ops, which costs minutes of pure round-trip latency over the axon
    # tunnel (measured 136 s; the jitted path is seconds once cached).
    return jax.jit(build)(rng)


def decode_batch(batch: Dict[str, Array]) -> Dict[str, Array]:
    """Expand a stored-dtype batch to the f32 training schema (traceable).

    Batch sources serve uint8 for the fields the cache stores as uint8
    (image, masks, albedo — data/celebahq.py FIELDS) so the host->device
    transfer moves 2.8x fewer bytes; the /255 happens on device, inside the
    train step, where XLA fuses it into the first consumers. Values match
    CelebAHQRelightingData.get_batch's host-side `.astype(np.float32)/255.0`
    to within 1 ulp (XLA may rewrite the array divide to reciprocal+mul; an
    exact 256-entry lookup table was measured and rejected — it lowers to a
    generic TPU gather costing ~50 ms/batch-16 vs the divide's ~0).
    Float fields pass through, so f32 sources (SyntheticFaceData) and the
    f32 test batches are a no-op.
    """
    return {
        k: v.astype(jnp.float32) / 255.0 if v.dtype == jnp.uint8 else v
        for k, v in batch.items()
    }


# Standalone (eager/device) form, for callers outside a jit.
_decode_device_batch = jax.jit(decode_batch)

# "not decided yet" sentinel for Trainer's lazy residency cache (None is a
# valid cached decision: it means "stream").
_UNSET = object()


class DeviceResidentBatches:
    """Whole training set resident on device; batches are on-device gathers.

    The streaming path uploads one packed batch per step. On this machine's
    remote-TPU (axon) PJRT plugin every device_put leaks its host staging
    buffer — measured 5.25 MB/step for the f32 synthetic stream and 1.96 for
    raw-u8, flat at zero with no per-step upload (tools/leak_probe.py;
    docs/HOST_LEAK_probe.md) — so a protocol-shape training run
    (700 batches/epoch, reference train_raytracing_...py:579-580) grows
    host RSS without bound. Residency uploads the provider's STORED bytes
    once (uint8 where the cache stores uint8) and per step transfers only
    the int32 batch indices (12 B at batch 3); the u8->f32 decode runs on
    device (decode_batch), so batch VALUES are bit-identical to streaming.

    Single-device meshes only (the DP/grid paths shard batches per process
    and keep the packed streaming upload, which real pods move over NICs,
    not this tunnel).
    """

    def __init__(self, dataset: Dict[str, Array]):
        self._dataset = dataset
        self._gather = jax.jit(
            lambda ds, idx: decode_batch({k: v[idx] for k, v in ds.items()})
        )

    @staticmethod
    def build(data, budget_mb: int) -> Optional["DeviceResidentBatches"]:
        """Upload `data`'s full sample store, or None when it cannot fit /
        the provider has no whole-set access."""
        get = getattr(data, "get_batch_raw", None) or getattr(
            data, "get_batch", None
        )
        n = getattr(data, "num_samples", None)
        if get is None or n is None:
            return None
        probe = get(np.arange(min(int(n), 1)))
        per_sample = sum(v.nbytes for v in probe.values())
        if per_sample * int(n) > budget_mb * (1 << 20):
            return None
        host = get(np.arange(int(n)))
        from geomconsistentfr_tpu.utils.transfer import pack_device_put

        return DeviceResidentBatches(pack_device_put(host))

    def get(self, indices: np.ndarray) -> Dict[str, Array]:
        idx = jnp.asarray(np.ascontiguousarray(indices, np.int32))
        return self._gather(self._dataset, idx)


def _train_step(
    state: TrainState,
    batch: Dict[str, Array],
    *,
    cfg: PipelineConfig,
    use_skips: Tuple[bool, bool, bool, bool],
    axis_name: Optional[str],
    march_fn=None,
) -> Tuple[TrainState, Dict[str, Array]]:
    model = RelightNet(cfg=cfg.model, axis_name=axis_name)
    patchgan = PatchGAN(axis_name=axis_name)
    tx = make_optimizer(cfg.train.learning_rate)
    lcfg = cfg.train.loss
    rcfg = cfg.render

    images = batch["image"]
    face_mask = batch["face_mask"]

    def d_apply(params_d, bs_d, x):
        logits, mutated = patchgan.apply(
            {"params": params_d, "batch_stats": bs_d},
            x,
            train=True,
            mutable=["batch_stats"],
        )
        return logits, mutated["batch_stats"]

    # One fused loss: a single RelightNet forward feeds both phases (the
    # reference reuses its forward across D and G phases, :618/:641).
    # Phase separation is via stop_gradient:
    #   d_loss sees a stop-grad composite (optimizer.zero_grad at :631 discards
    #   the D-phase gradient that torch leaks into the generator), and
    #   g_adv runs the discriminator with stop-grad parameters (the G-phase
    #   gradient torch leaks into D is cleared at :617 next step).
    # D BatchNorm statistics update on all three forwards, in reference order.
    def loss_fn(params_g, params_d):
        net, mutated = model.apply(
            {"params": params_g, "batch_stats": state.batch_stats_g},
            images,
            train=True,
            use_skips=use_skips,
            mutable=["batch_stats"],
        )
        out = render(
            net.albedo, net.depth, net.lighting, face_mask, rcfg,
            march_fn=march_fn,
        )
        bs_g = mutated["batch_stats"]

        composite = masked_composite(out.rendered, images, face_mask)
        composite_sg = jax.lax.stop_gradient(composite)

        fake_sg, bs1 = d_apply(params_d, state.batch_stats_d, composite_sg)
        real_sg, bs2 = d_apply(params_d, bs1, images)
        d_metrics = discriminator_losses(fake_sg, real_sg, lcfg, axis_name)

        params_d_sg = jax.tree.map(jax.lax.stop_gradient, params_d)
        fake_for_g, bs_d_new = d_apply(params_d_sg, bs2, composite)

        g_metrics = generator_losses(
            rendered=out.rendered,
            images=images,
            depth=out.depth,
            depth_gt=batch["depth_gt"],
            depth_mask=batch["depth_mask"],
            albedo=out.albedo,
            albedo_gt=batch["albedo_gt"],
            face_mask=face_mask,
            est_ambient=out.ambient_values,
            est_unit_dir=out.unit_light_direction,
            light_gt=batch["light_gt"],
            fake_logits=fake_for_g,
            cfg=lcfg,
            axis_name=axis_name,
        )
        combined = g_metrics["total"] + d_metrics["discriminator"]
        return combined, ({**g_metrics, **d_metrics}, bs_g, bs_d_new)

    grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)
    (_, (metrics, bs_g_new, bs_d_new)), (g_grads, d_grads) = grad_fn(
        state.params_g, state.params_d
    )
    if axis_name is not None:
        g_grads = jax.lax.pmean(g_grads, axis_name)
        d_grads = jax.lax.pmean(d_grads, axis_name)

    # D parameters update only every GD_ratio-th step; its BN stats and the
    # loss are computed every step (reference :624-629).
    d_updates, opt_d_applied = tx.update(d_grads, state.opt_d, state.params_d)
    apply_d = (state.step % cfg.train.gd_ratio) == 0
    params_d = jax.tree.map(
        lambda p, u: jnp.where(apply_d, p + u, p), state.params_d, d_updates
    )
    opt_d = jax.tree.map(
        lambda new, old: jnp.where(apply_d, new, old), opt_d_applied, state.opt_d
    )

    g_updates, opt_g = tx.update(g_grads, state.opt_g, state.params_g)
    params_g = optax.apply_updates(state.params_g, g_updates)
    new_state = TrainState(
        step=state.step + 1,
        params_g=params_g,
        batch_stats_g=bs_g_new,
        opt_g=opt_g,
        params_d=params_d,
        batch_stats_d=bs_d_new,
        opt_d=opt_d,
    )
    return new_state, metrics


def make_single_device_step(cfg: PipelineConfig):
    """jit'd step for one device (also used by CPU tests)."""

    @partial(jax.jit, static_argnames=("use_skips",))
    def step(state, batch, use_skips):
        return _train_step(
            state, batch, cfg=cfg, use_skips=use_skips, axis_name=None
        )

    return step


def make_data_parallel_step(cfg: PipelineConfig, mesh):
    """shard_map'd step over the `data` mesh axis.

    Params/opt-state replicated, batch sharded on its leading axis. Gradients,
    masked-loss reductions and BN moments are psum/pmean'd inside, so results
    are identical to single-device training on the global batch.
    """

    batch_specs = {
        "image": shard_batch_spec(4),
        "face_mask": shard_batch_spec(3),
        "depth_gt": shard_batch_spec(3),
        "depth_mask": shard_batch_spec(3),
        "albedo_gt": shard_batch_spec(3),
        "light_gt": shard_batch_spec(2),
    }

    def make(use_skips):
        def local_step(state, batch):
            return _train_step(
                state, batch, cfg=cfg, use_skips=use_skips, axis_name=DATA_AXIS
            )

        sharded = shard_map_fn(
            local_step,
            mesh,
            in_specs=(P(), batch_specs),
            out_specs=(P(), P()),
        )
        return jax.jit(sharded)

    cache: Dict[Tuple[bool, ...], Any] = {}

    def step(state, batch, use_skips):
        key = tuple(use_skips)
        if key not in cache:
            cache[key] = make(key)
        return cache[key](state, batch)

    return step


def make_grid_parallel_step(cfg: PipelineConfig, mesh):
    """shard_map'd step over a 2-D ('data', 'samples') mesh.

    The batch shards over the first axis exactly as make_data_parallel_step;
    the second axis additionally shards the shadow march's sample grid
    (ray_march_min_distance_pallas_vjp_sp: pmin-combined forward,
    first-global-winner t* for the replicated single-sample backward). This
    accelerates the REFERENCE TRAINING PROTOCOL itself — batch 3 caps plain
    DP at 3 chips, but the march is ~63-68% of the step (docs/PROFILE.md),
    so a 3xS grid keeps cutting wall-clock at fixed batch size. Everything
    outside the march (CNN fwd/bwd, D, losses, optimizers) runs replicated
    across the samples axis; since its inputs and the post-pmin march output
    are replicated there, gradients and parameter updates stay bit-identical
    across that axis with no extra collectives — loss/grad/BN reductions
    stay on the data axis only.
    """
    from geomconsistentfr_tpu.ops import shadows as shadows_ops
    from geomconsistentfr_tpu.ops.shadows_pallas import (
        ray_march_min_distance_pallas_vjp_sp,
    )

    data_axis, samples_axis = mesh.axis_names
    n_s = mesh.shape[samples_axis]
    # Contiguous increasing slices — required for the first-global-winner
    # t* combine to match torch.min tie-break (see sharded_sample_ts).
    ts_global = jnp.asarray(shadows_ops.sharded_sample_ts(cfg.render, n_s))

    batch_specs = {
        "image": shard_batch_spec(4, data_axis),
        "face_mask": shard_batch_spec(3, data_axis),
        "depth_gt": shard_batch_spec(3, data_axis),
        "depth_mask": shard_batch_spec(3, data_axis),
        "albedo_gt": shard_batch_spec(3, data_axis),
        "light_gt": shard_batch_spec(2, data_axis),
    }

    def make(use_skips):
        def local_step(state, batch, ts_local):
            def march(depth, mask, light_point):
                return ray_march_min_distance_pallas_vjp_sp(
                    depth, mask, light_point, cfg.render, samples_axis,
                    ts_local,
                )

            return _train_step(
                state, batch, cfg=cfg, use_skips=use_skips,
                axis_name=data_axis, march_fn=march,
            )

        sharded = shard_map_fn(
            local_step,
            mesh,
            in_specs=(P(), batch_specs, P(samples_axis)),
            out_specs=(P(), P()),
        )
        return jax.jit(lambda state, batch: sharded(state, batch, ts_global))

    cache: Dict[Tuple[bool, ...], Any] = {}

    def step(state, batch, use_skips):
        key = tuple(use_skips)
        if key not in cache:
            cache[key] = make(key)
        return cache[key](state, batch)

    return step


# ---------------------------------------------------------------------------
# Trainer driver
# ---------------------------------------------------------------------------


class Trainer:
    """Epoch loop: shuffling, GD alternation, metrics, checkpoints, resume."""

    def __init__(
        self,
        cfg: Optional[PipelineConfig] = None,
        data=None,
        mesh=None,
        workdir: str = "runs/train",
        profile: bool = False,
    ):
        self.cfg = cfg or preset_target_lighting_train()
        self.data = data
        self.workdir = workdir
        self.profile = profile
        self.mesh = mesh if mesh is not None else make_mesh()
        n_dev = self.mesh.devices.size
        if len(self.mesh.axis_names) == 2:
            self.step_fn = make_grid_parallel_step(self.cfg, self.mesh)
        elif n_dev > 1:
            self.step_fn = make_data_parallel_step(self.cfg, self.mesh)
        else:
            self.step_fn = make_single_device_step(self.cfg)
        self.metrics_log: list = []
        self._resident_cache: Any = _UNSET

    def _resident(self) -> Optional[DeviceResidentBatches]:
        """Lazily build the device-resident batch source (or None).

        'stream' and multi-device meshes keep the packed streaming upload;
        'device' demands residency and fails loudly when the provider has
        no whole-set access or exceeds the budget; 'auto' falls back to
        streaming silently."""
        tcfg = self.cfg.train
        if tcfg.data_residency == "stream" or self.mesh.devices.size > 1:
            return None
        if self._resident_cache is _UNSET:
            built = DeviceResidentBatches.build(
                self.data, tcfg.device_data_budget_mb
            )
            if built is None and tcfg.data_residency == "device":
                raise ValueError(
                    "data_residency='device' but the provider has no "
                    "whole-set access or exceeds device_data_budget_mb="
                    f"{tcfg.device_data_budget_mb}"
                )
            self._resident_cache = built
        return self._resident_cache

    def init_or_resume(self, rng: Optional[jax.Array] = None) -> TrainState:
        from geomconsistentfr_tpu.utils import checkpoint as ckpt

        latest = ckpt.latest_step_dir(
            os.path.join(self.workdir, self.cfg.train.checkpoint_dir)
        )
        init_rng = (
            rng if rng is not None else jax.random.PRNGKey(self.cfg.train.seed)
        )
        if latest is not None:
            # The restore template only needs structure/shape/dtype — get it
            # from eval_shape (zero device work) instead of materializing a
            # fresh init whose values are immediately overwritten.
            import numpy as np

            shapes = jax.eval_shape(
                lambda r: init_state(self.cfg, r), init_rng
            )
            template = jax.tree.map(
                lambda s: np.zeros(s.shape, s.dtype), shapes
            )
            state = ckpt.restore_variables(latest, template=template)
            # Packed upload: per-leaf transfers cost a tunnel round trip per
            # leaf (measured 296 s for the 865-leaf, 47.7 MB TrainState).
            from geomconsistentfr_tpu.utils.transfer import pack_device_put

            return pack_device_put(state)
        return init_state(self.cfg, init_rng)

    def save(self, state: TrainState) -> str:
        from geomconsistentfr_tpu.utils import checkpoint as ckpt

        step = int(jax.device_get(state.step))
        root = os.path.join(self.workdir, self.cfg.train.checkpoint_dir)
        path = os.path.join(root, f"step_{step:08d}")
        ckpt.save_variables(path, state)
        ckpt.prune_step_dirs(root, self.cfg.train.keep_checkpoints)
        return path

    def _device_prefetch(self, batches, depth: int = 2):
        """Double-buffer host->device transfers ahead of the consuming step.

        Single-device batches go through utils/transfer.pack_device_put: one
        buffer per dtype group instead of one transfer per field. Over the
        axon tunnel each device_put call pays ~60 ms of fixed overhead, so
        the 6-field f32 batch costs ~0.42 s serialized (more than the whole
        0.18 s fast train step at batch 3); packed uint8+f32 is ~0.11 s and
        hides fully behind compute. The DP path keeps per-field sharded puts
        (real pods move batches over NICs, not this tunnel).
        """
        from collections import deque

        if self.mesh.devices.size > 1:
            from geomconsistentfr_tpu.parallel.mesh import device_put_sharded_batch

            def put(b):
                return device_put_sharded_batch(b, self.mesh)
        else:
            from geomconsistentfr_tpu.utils.transfer import pack_device_put

            def put(b):
                return pack_device_put(b)

        queue = deque()
        for b in batches:
            queue.append(put(b))
            if len(queue) >= depth:
                yield _decode_device_batch(queue.popleft())
        while queue:
            yield _decode_device_batch(queue.popleft())

    def run_epoch(
        self,
        state: TrainState,
        epoch: int,
        rng: Optional[np.random.Generator] = None,
        start_batch: int = 0,
    ):
        """One epoch: cfg.train.batches_per_epoch random batches (:606-607).

        The batch order is derived from (seed, epoch), NOT from a generator
        threaded across epochs — so a run resumed at epoch N replays exactly
        the batch stream an uninterrupted run would have seen (the reference
        cannot resume at all, train_*.py:684-685). Passing `rng` explicitly
        overrides this (used by tests that control the stream).

        `start_batch` resumes *inside* an epoch from a step-level checkpoint:
        the epoch's shuffle is re-derived and its first `start_batch` batches
        are skipped (never trained), so restarting from a mid-epoch save
        continues the uninterrupted stream instead of re-training the epoch
        head on an already-advanced state.
        """
        import contextlib
        import itertools

        tcfg = self.cfg.train
        if rng is None:
            rng = np.random.default_rng([tcfg.seed, epoch])
        use_skips = self.cfg.model.skip_gates(epoch)
        sums: Dict[str, float] = {}
        t0 = time.time()
        profile_ctx = contextlib.nullcontext()
        if self.profile:
            from geomconsistentfr_tpu.utils.profiling import trace

            profile_ctx = trace(os.path.join(self.workdir, "profile"))
        # Reference epoch structure when the dataset supports it: shuffled
        # contiguous batch slots, first batches_per_epoch visited
        # (train_*.py:578,593,606); otherwise i.i.d. sampling.
        # Prefer the provider's stored-dtype batches (uint8 images/masks):
        # _decode_device_batch restores the f32 schema on device and the
        # upload moves 2.8x fewer bytes. f32-only providers work unchanged.
        get_batch = getattr(self.data, "get_batch_raw", None) or getattr(
            self.data, "get_batch", None
        )
        if hasattr(self.data, "epoch_batch_indices"):
            index_iter = self.data.epoch_batch_indices(
                rng, tcfg.batch_size, tcfg.batches_per_epoch
            )
        elif hasattr(self.data, "sample_indices") and get_batch is not None:
            # i.i.d. sampling at the INDEX level: sample_indices consumes
            # the rng exactly like sample_batch, so this stream is
            # identical to the legacy batch-level draw.
            index_iter = (
                self.data.sample_indices(rng, tcfg.batch_size)
                for _ in range(tcfg.batches_per_epoch)
            )
        else:
            index_iter = None
        if index_iter is not None:
            # Fast-forward within the epoch at the index level (no IO).
            if start_batch:
                index_iter = itertools.islice(index_iter, start_batch, None)
            resident = self._resident()
            if resident is not None:
                # Device-resident gathers: no per-step payload upload (see
                # DeviceResidentBatches). Dispatch is async, so gathers run
                # ahead of the consuming step like the prefetch queue does.
                batches = map(resident.get, index_iter)
            else:
                # Async device prefetch: start batch k+1's host->device
                # transfer while step k executes (device_put returns
                # immediately).
                batches = self._device_prefetch(
                    get_batch(idx) for idx in index_iter
                )
        else:
            sample_batch = getattr(
                self.data, "sample_batch_raw", self.data.sample_batch
            )
            batches = (
                sample_batch(rng, tcfg.batch_size)
                for _ in range(tcfg.batches_per_epoch)
            )
            # sample_batch consumes the rng per draw; drawing and discarding
            # keeps the resumed stream identical to the uninterrupted one.
            if start_batch:
                batches = itertools.islice(batches, start_batch, None)
            batches = self._device_prefetch(batches)

        # Metrics are collected asynchronously: a blocking per-step fetch
        # costs a ~0.3 s tunnel round trip — more than the step itself.
        # copy_to_host_async starts the tiny scalar copies immediately; the
        # values materialize in one device_get at epoch end. A scalar fetch
        # every _SYNC_EVERY steps bounds how far dispatch runs ahead of the
        # device (block_until_ready is async under axon, so only a fetch
        # gives real backpressure) and surfaces NaNs/errors near their step.
        _SYNC_EVERY = 8
        pending: list = []
        with profile_ctx:
            for j, batch in enumerate(batches):
                pos = start_batch + j + 1  # 1-based position within the epoch
                state, metrics = self.step_fn(state, batch, use_skips)
                if pos % tcfg.log_every_steps == 0:
                    for leaf in jax.tree.leaves(metrics):
                        if hasattr(leaf, "copy_to_host_async"):
                            leaf.copy_to_host_async()
                    pending.append(metrics)
                if (pos - start_batch) % _SYNC_EVERY == 0:
                    float(metrics["total"])
                # Step-level checkpointing (the reference can only save at
                # epoch end and cannot resume at all, train_*.py:684-685).
                if (
                    tcfg.checkpoint_every_steps
                    and pos % tcfg.checkpoint_every_steps == 0
                    and pos < tcfg.batches_per_epoch
                ):
                    self.save(state)
        logged = len(pending)
        for m in jax.device_get(pending):
            for k, v in m.items():
                sums[k] = sums.get(k, 0.0) + float(v)
        elapsed = time.time() - t0
        avg = {k: v / max(logged, 1) for k, v in sums.items()}
        avg["epoch"] = epoch
        avg["seconds"] = elapsed
        self.metrics_log.append(avg)
        self._export_metrics(epoch, avg)
        return state, avg

    def visualize(self, state: TrainState, epoch: int) -> str:
        """Write per-epoch sample renders + an HTML progress gallery.

        Counterpart of the vendored library's training visualizer
        (PerceptualSimilarity/util/visualizer.py + html.py — the reference
        training scripts themselves only print scalars). Renders a fixed
        probe batch (first dataset batch, epoch-independent) through the
        CURRENT generator in eval mode and appends a row per epoch to
        <workdir>/visuals/index.html: input, albedo, depth, shadow weights,
        rendered composite, plus the epoch's mean total loss.
        """
        import imageio.v2 as imageio

        from geomconsistentfr_tpu.metrics.perceptual import write_html_gallery

        if not hasattr(self, "_vis_probe"):
            rng = np.random.default_rng([self.cfg.train.seed, 7123])
            probe = self.data.sample_batch(rng, 1)
            # Raw-dtype sources (uint8 images/masks) expand on host here —
            # the probe is tiny and rendered once per epoch.
            self._vis_probe = {
                k: v.astype(np.float32) / 255.0 if v.dtype == np.uint8 else v
                for k, v in probe.items()
            }
            # Resumed runs keep their earlier gallery rows: rebuild them from
            # the epoch directories already on disk (losses of past epochs
            # are not re-derived).
            self._vis_rows = []
            vis_root = os.path.join(self.workdir, "visuals")
            if os.path.isdir(vis_root):
                for name in sorted(os.listdir(vis_root)):
                    if not name.startswith("epoch_"):
                        continue
                    row = {"epoch": int(name.split("_")[1])}
                    for kind in ("input", "albedo", "depth", "shadow",
                                 "rendered"):
                        p = os.path.join(vis_root, name, f"{kind}.png")
                        if os.path.exists(p):
                            row[kind] = p
                    self._vis_rows.append(row)
            model = RelightNet(cfg=self.cfg.model)
            rcfg = self.cfg.render

            @partial(jax.jit, static_argnums=(2,))
            def vis_fn(variables, batch, use_skips):
                net = model.apply(
                    variables, batch["image"], train=False, use_skips=use_skips
                )
                return render(
                    net.albedo, net.depth, net.lighting, batch["face_mask"],
                    rcfg, target_light=batch["light_gt"],
                )

            self._vis_fn = vis_fn

        probe = self._vis_probe
        variables = {
            "params": state.params_g,
            "batch_stats": state.batch_stats_g,
        }
        use_skips = self.cfg.model.skip_gates(epoch)
        out = self._vis_fn(
            variables,
            {k: jnp.asarray(probe[k]) for k in ("image", "face_mask", "light_gt")},
            use_skips,
        )

        vis_dir = os.path.join(self.workdir, "visuals", f"epoch_{epoch:04d}")
        os.makedirs(vis_dir, exist_ok=True)

        def put(name, arr01):
            arr = np.clip(np.asarray(arr01) * 255.0, 0, 255).astype(np.uint8)
            path = os.path.join(vis_dir, f"{name}.png")
            imageio.imwrite(path, arr)
            return path

        from geomconsistentfr_tpu.utils.io import depth_visualization

        # Same -depth min-max convention as the eval dumps (near = bright).
        depth01 = depth_visualization(
            np.asarray(out.depth[0]), np.asarray(probe["face_mask"][0])
        )
        row = {
            "epoch": epoch,
            "input": put("input", probe["image"][0]),
            "albedo": put("albedo", np.asarray(out.albedo[0])),
            "depth": put("depth", depth01),
            "shadow": put("shadow", np.asarray(out.shadow_mask_weights[0])),
            "rendered": put("rendered", np.asarray(out.rendered[0])),
        }
        if self.metrics_log:
            row["total_loss"] = round(self.metrics_log[-1].get("total", 0.0), 4)
        self._vis_rows.append(row)
        index = os.path.join(self.workdir, "visuals", "index.html")
        write_html_gallery(index, self._vis_rows, title="training progress")
        return index

    def _export_metrics(self, epoch: int, avg: Dict[str, float]) -> None:
        """CSV + reference-compatible .mat export (train_*.py:671-683)."""
        os.makedirs(os.path.join(self.workdir, "losses"), exist_ok=True)
        csv_path = os.path.join(self.workdir, "losses", "metrics.csv")
        write_header = not os.path.exists(csv_path)
        keys = sorted(avg)
        with open(csv_path, "a") as f:
            if write_header:
                f.write(",".join(keys) + "\n")
            f.write(",".join(str(avg[k]) for k in keys) + "\n")
        try:
            import scipy.io

            scipy.io.savemat(
                os.path.join(self.workdir, "losses", f"losses_epoch{epoch}.mat"),
                {k: v for k, v in avg.items()},
            )
        except Exception:
            pass
