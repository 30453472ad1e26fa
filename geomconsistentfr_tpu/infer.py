"""Inference pipelines: single-image relighting, light sweeps, lighting transfer.

Replaces the reference's three test scripts with one jitted API:
  * `Relighter.forward`           — batched relighting with explicit targets
    (test_relight_single_image.py:507-620, test_raytracing_...py:542-608).
  * `Relighter.relight_sweep`     — one network forward + a vmap of the
    renderer over L target lights (the reference reruns the full network for
    each of its 18 eval lightings; here the CNN runs once per image).
  * `Relighter.estimate_lighting` / `transfer_lighting` — the 2-pass protocol
    of test_relight_single_image_lighting_transfer.py:537-545: pass 1 estimates
    (direction, ambient) from a reference portrait, pass 2 relights the input
    with those targets.

All public methods accept/return numpy-compatible arrays; everything heavy is
jit-compiled once per (config, shape).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from geomconsistentfr_tpu.config import PipelineConfig, preset_lighting_transfer
from geomconsistentfr_tpu.models.relightnet import RelightNet
from geomconsistentfr_tpu.render import RenderOutputs, render

Array = jax.Array

FULL_SKIPS = (True, True, True, True)

# Channel layout of the packed uint8 visualization tensor (B, H, W, 12):
# the six per-image outputs of the reference eval dump in its order
# (test_raytracing_...py:603-608), visualization transforms pre-applied.
VISUAL_PACK_LAYOUT = (
    ("rendered_image", 3),
    ("shadow_mask", 1),
    ("albedo", 3),
    ("depth", 1),
    ("shading", 1),
    ("surface_normals", 3),
)


def pack_visuals(outputs: RenderOutputs, masks: Array) -> Array:
    """Fuse the six eval visualizations into one uint8 (B, H, W, 12) tensor.

    Device-side counterpart of utils/io.save_render_outputs's transforms
    (masked rendered/albedo/shading/shadow, per-image min-max of -depth,
    (n+1)/2 normals — reference test_raytracing_...py:590-608). Quantizes
    with floor(clip(x*255)) to match numpy's float->uint8 truncation, so the
    PNGs written from this pack are byte-identical to the float path's.

    Exists because the serving/eval hosts fetch results over a thin link
    (the axon tunnel moves ~8 MB/s): fetching f32 render outputs costs
    ~3.1 MB/image while this pack is 0.77 MB/image — on the 862-image
    protocol that is the difference between fetch-bound and host-bound.
    """
    m1 = masks[..., None]

    d = -outputs.depth
    dmin = jnp.min(d, axis=(1, 2), keepdims=True)
    dmax = jnp.max(d, axis=(1, 2), keepdims=True)
    depth_vis = (d - dmin) / jnp.maximum(dmax - dmin, 1e-12)

    packed = jnp.concatenate(
        [
            outputs.rendered * m1,
            (outputs.shadow_mask_weights * masks)[..., None],
            outputs.albedo * m1,
            (depth_vis * masks)[..., None],
            (outputs.final_shading * masks)[..., None],
            (outputs.surface_normals + 1.0) / 2.0 * m1,
        ],
        axis=-1,
    )
    return jnp.floor(jnp.clip(packed * 255.0, 0.0, 255.0)).astype(jnp.uint8)


class Relighter:
    """High-level inference wrapper around RelightNet + the renderer.

    With `mesh` (a 1-D jax.sharding.Mesh, see parallel.mesh.make_mesh) the
    entry points run multi-device, along the axis picked by `parallel`:

    * `parallel="data"` (throughput): the batch axis is sharded across
      devices via shard_map (the Pallas march kernel requires the
      manual-SPMD path; GSPMD cannot partition it). Batch sizes must be a
      multiple of the mesh size. Applies to forward / forward_visuals /
      estimate_lighting.
    * `parallel="samples"` (latency): the batch (and the tiny CNN) is
      REPLICATED and the shadow march's 160-sample axis is sharded — each
      device marches a slice of sample_ts(cfg) over the full image and the
      partial min distances combine with lax.pmin over ICI. f32 min is
      associative and every post-min transform commutes with it (sqrt/denom
      is monotone; the 1e6 off-face sentinel exceeds any geometrically
      reachable distance; the bias gate is a per-pixel constant identical
      on all devices), so outputs are bit-identical to the single-device
      march. The march is ~99% of serving time (docs/PROFILE.md), so
      single-image latency scales ~linearly with mesh size — the axis to
      use when batch < mesh size (interactive serving, the 18-light sweep).
      Applies to forward / forward_visuals / relight_sweep*.
    * `parallel="grid"` (both): a 2-D mesh (parallel.mesh.make_mesh_grid)
      whose first axis shards the batch and second axis shards the march
      samples — the medium-concurrency serving point where neither pure
      throughput nor pure latency sharding fits. Batch must be a multiple
      of the data-axis size; the sweep entries replicate over the data axis
      (use a 1-D 'samples' mesh for latency-critical sweeps).

    The reference has no multi-device anything (SURVEY §2.3); this is the
    eval/serving counterpart of train.make_data_parallel_step.
    """

    def __init__(
        self,
        cfg: PipelineConfig,
        variables,
        use_skips: Tuple[bool, bool, bool, bool] = FULL_SKIPS,
        mesh=None,
        parallel: str = "data",
    ):
        if parallel not in ("data", "samples", "grid"):
            raise ValueError(f"unknown parallel mode: {parallel!r}")
        self.cfg = cfg
        self.variables = variables
        self.use_skips = use_skips
        self.mesh = mesh
        self.parallel = parallel
        self.model = RelightNet(cfg=cfg.model)

        rcfg = cfg.render

        def _dev01(x):
            # uint8 inputs convert to [0, 1] f32 ON DEVICE: PNG-decoded bytes
            # upload at 1/4 the f32 cost over the host link (the same lesson
            # as pack_visuals, in the other direction). Exact: u8/255 in f32
            # is the identical value the host conversion would produce.
            if x.dtype == jnp.uint8:
                return x.astype(jnp.float32) / 255.0
            return x

        def _forward_core(variables, images, masks, target_light,
                          target_ambient, march_fn=None):
            images, masks = _dev01(images), _dev01(masks)
            net = self.model.apply(
                variables, images, train=False, use_skips=use_skips
            )
            return render(
                net.albedo,
                net.depth,
                net.lighting,
                masks,
                rcfg,
                target_light=target_light,
                target_ambient=target_ambient,
                march_fn=march_fn,
            )

        def _net_only_core(variables, images):
            return self.model.apply(
                variables, _dev01(images), train=False, use_skips=use_skips
            )

        def _forward_visuals_core(variables, images, masks, target_light,
                                  target_ambient, march_fn=None):
            out = _forward_core(variables, images, masks, target_light,
                                target_ambient, march_fn=march_fn)
            return pack_visuals(out, _dev01(masks))

        if mesh is None or parallel in ("samples", "grid"):
            _forward = jax.jit(_forward_core)
            _net_only = jax.jit(_net_only_core)
            _forward_visuals = jax.jit(_forward_visuals_core)
        else:
            from jax.sharding import PartitionSpec as P

            from geomconsistentfr_tpu.parallel.mesh import shard_map_fn

            dp = P(mesh.axis_names[0])
            rep = P()
            _forward = jax.jit(shard_map_fn(
                _forward_core, mesh,
                in_specs=(rep, dp, dp, dp, dp), out_specs=dp,
            ))
            _net_only = jax.jit(shard_map_fn(
                _net_only_core, mesh, in_specs=(rep, dp), out_specs=dp,
            ))
            _forward_visuals = jax.jit(shard_map_fn(
                _forward_visuals_core, mesh,
                in_specs=(rep, dp, dp, dp, dp), out_specs=dp,
            ))

        def _sweep_core(variables, image, mask, lights, ambients,
                        march_fn=None):
            # One network forward; the renderer then runs ONCE with the light
            # axis folded into its batch axis (the reference reruns the full
            # network per light, test_raytracing_...py:587-601).
            image, mask = _dev01(image), _dev01(mask)
            net = self.model.apply(
                variables, image[None], train=False, use_skips=use_skips
            )
            l = lights.shape[0]

            def tile(x):
                return jnp.broadcast_to(x, (l, *x.shape[1:]))

            return render(
                tile(net.albedo),
                tile(net.depth),
                tile(net.lighting),
                jnp.broadcast_to(mask[None], (l, *mask.shape)),
                rcfg,
                target_light=lights,
                target_ambient=ambients,
                march_fn=march_fn,
            )

        _sweep = jax.jit(_sweep_core)

        @jax.jit
        def _sweep_rendered_u8(variables, image, mask, lights, ambients):
            # Masked, quantized renders only (L, H, W, 3) uint8 — the sweep
            # montage needs nothing else, and u8 is 4x cheaper to fetch.
            out = _sweep(variables, image, mask, lights, ambients)
            r = out.rendered * _dev01(mask)[None, ..., None]
            return jnp.floor(jnp.clip(r * 255.0, 0.0, 255.0)).astype(jnp.uint8)

        if mesh is not None and parallel in ("samples", "grid"):
            # Latency parallelism: shard the march's sample grid across the
            # mesh ('samples', 1-D) or across the second axis of a 2-D mesh
            # whose first axis shards the batch ('grid'); pmin-combine over
            # the sample axis (see class doc).
            from jax.sharding import PartitionSpec as P

            from geomconsistentfr_tpu.ops import shadows as shadows_ops
            from geomconsistentfr_tpu.parallel.mesh import shard_map_fn
            from geomconsistentfr_tpu.render import _on_tpu

            if parallel == "grid":
                if len(mesh.axis_names) != 2:
                    raise ValueError(
                        "parallel='grid' needs a 2-D (data, samples) mesh — "
                        "see parallel.mesh.make_mesh_grid"
                    )
                data_axis, axis = mesh.axis_names
                n_sample_shards = mesh.shape[axis]
                batch_spec = P(data_axis)
            else:
                if len(mesh.axis_names) != 1:
                    raise ValueError(
                        "parallel='samples' expects a 1-D mesh; use "
                        "parallel='grid' for a 2-D (data, samples) mesh"
                    )
                axis = mesh.axis_names[0]
                n_sample_shards = mesh.size
                batch_spec = P()
            on_tpu = _on_tpu()
            # Draft tier: render() hands the march_fn the POOLED inputs, so
            # the kernel runs under the scaled config. The t grid is scale-
            # invariant (it parameterises the pixel->border segment), but it
            # is NOT stride-invariant — scaled_render_cfg coarsens t_step by
            # shadow_lowres_t_stride — so the sharded slices must come from
            # the SCALED config (the same grid the unsharded draft march
            # walks), or the sharded path would march the fine grid and the
            # strided-vs-sharded outputs would diverge.
            mcfg = (
                shadows_ops.scaled_render_cfg(rcfg)
                if rcfg.shadow_resolution_scale > 1
                else rcfg
            )
            # Equal contiguous per-device slices (tail pad duplicates the
            # final offset, which cannot change the running min).
            ts_sharded = jnp.asarray(
                shadows_ops.sharded_sample_ts(mcfg, n_sample_shards)
            )

            def _march_sp(depth, mask, light_point, ts_local,
                          return_argmin_t=False):
                if mcfg.use_pallas_shadows and on_tpu:
                    from geomconsistentfr_tpu.ops.shadows_pallas import (
                        ray_march_min_distance_pallas,
                    )

                    local = ray_march_min_distance_pallas(
                        depth, mask, light_point, mcfg, ts=ts_local,
                        return_argmin_t=return_argmin_t,
                    )
                else:
                    local = shadows_ops.ray_march_min_distance_batch(
                        depth, mask, light_point, mcfg, ts=ts_local,
                        return_argmin_t=return_argmin_t,
                    )
                if not return_argmin_t:
                    return jax.lax.pmin(local, axis)
                # First-global-winner t* combine (same construction as
                # shadows_pallas._vjp_fwd_sp): devices not achieving the
                # global min are strictly greater, and contiguous increasing
                # ts slices make the smallest winning t the first winner.
                local_min, t_local = local
                global_min = jax.lax.pmin(local_min, axis)
                t_star = jax.lax.pmin(
                    jnp.where(local_min == global_min, t_local, jnp.inf), axis
                )
                return global_min, t_star

            want_refine = (
                rcfg.shadow_resolution_scale > 1
                and rcfg.shadow_refine_halfwidth > 0
            )

            def _refine_replicated(d, m, lp, t_map):
                # Draft boundary refine under sample/grid parallelism: every
                # device evaluates the full window, replicated. Offset-
                # sharding would buy nothing — the Pallas step grid pads to
                # a multiple of 8, so 8/ndev offsets still run 8 kernel
                # steps — and replicated outputs are identical on every
                # device (deterministic ops), so no combine is needed.
                if rcfg.use_pallas_shadows and on_tpu:
                    from geomconsistentfr_tpu.ops.shadows_pallas import (
                        refine_min_distance_pallas,
                    )

                    return refine_min_distance_pallas(d, m, lp, t_map, rcfg)
                return shadows_ops.refine_min_distance_batch(
                    d, m, lp, t_map, rcfg
                )

            def _sp_core(core):
                def wrapped(variables, *args):
                    *rest, ts_local = args

                    def march(d, m, lp, return_argmin_t=False):
                        return _march_sp(d, m, lp, ts_local, return_argmin_t)

                    if want_refine:
                        march.refine_fn = _refine_replicated
                    return core(variables, *rest, march_fn=march)

                return wrapped

            rep, sp = P(), P(axis)

            def _sp_entry(core, arg_spec, out_spec):
                mapped = shard_map_fn(
                    _sp_core(core), mesh,
                    in_specs=(rep,) + arg_spec + (sp,), out_specs=out_spec,
                )
                return jax.jit(lambda *a: mapped(*a, ts_sharded))

            # Batched entries shard the batch over the data axis in 'grid'
            # mode (batch_spec = P(data)); in 'samples' mode the batch is
            # replicated (batch_spec = P()).
            _forward = _sp_entry(
                _forward_core, (batch_spec,) * 4, batch_spec
            )
            _forward_visuals = _sp_entry(
                _forward_visuals_core, (batch_spec,) * 4, batch_spec
            )
            # The single-image sweep replicates its inputs on every axis and
            # shards only the march samples. On a 2-D grid mesh the data-axis
            # rows do redundant (identical) work — sweeps at latency-critical
            # sizes should use a 1-D 'samples' mesh instead.
            _sweep = _sp_entry(_sweep_core, (rep,) * 4, rep)
            # _sweep_rendered_u8 closes over the local `_sweep` name (late
            # binding) and therefore routes through the sample-parallel
            # sweep automatically.

        self._forward = _forward
        self._net_only = _net_only
        self._sweep = _sweep
        self._forward_visuals = _forward_visuals
        self._sweep_rendered_u8 = _sweep_rendered_u8

    # ------------------------------------------------------------------

    @staticmethod
    def _as_input(x):
        """jnp array preserving uint8 (device-side /255) else float32."""
        x = jnp.asarray(x)
        return x if x.dtype == jnp.uint8 else x.astype(jnp.float32)

    def _check_batch(self, b: int) -> None:
        if self.parallel == "samples" or self.mesh is None:
            return  # no mesh, or batch replicated: any size works
        # 'data': the whole mesh shards the batch; 'grid': its first axis.
        n = (
            self.mesh.shape[self.mesh.axis_names[0]]
            if self.parallel == "grid"
            else self.mesh.size
        )
        if b % n:
            what = (
                f"the grid mesh's batch-axis size {n}"
                if self.parallel == "grid"
                else f"the mesh size {n}"
            )
            raise ValueError(
                f"batch size {b} must be a multiple of {what} "
                f"(pad the tail batch, as run_inference does)"
            )

    def forward(
        self,
        images,
        masks,
        target_light=None,
        target_ambient=None,
    ) -> RenderOutputs:
        """Relight a batch. images (B,H,W,3), masks (B,H,W), target_light (B,3)."""
        images = self._as_input(images)
        masks = self._as_input(masks)
        b = images.shape[0]
        self._check_batch(b)
        if target_light is None:
            target_light = jnp.zeros((b, 3), jnp.float32)
        if target_ambient is None:
            target_ambient = jnp.zeros((b,), jnp.float32)
        return self._forward(
            self.variables,
            images,
            masks,
            jnp.asarray(target_light, jnp.float32),
            jnp.asarray(target_ambient, jnp.float32),
        )

    def forward_visuals(
        self,
        images,
        masks,
        target_light=None,
        target_ambient=None,
    ) -> Array:
        """Relight a batch and return the packed uint8 visualization tensor.

        Same inputs as `forward`; returns a device (B, H, W, 12) uint8 array
        (layout VISUAL_PACK_LAYOUT) — 4x cheaper to fetch than the f32
        RenderOutputs, for dump-to-PNG pipelines like the 862-image protocol.
        """
        images = self._as_input(images)
        masks = self._as_input(masks)
        b = images.shape[0]
        self._check_batch(b)
        if target_light is None:
            target_light = jnp.zeros((b, 3), jnp.float32)
        if target_ambient is None:
            target_ambient = jnp.zeros((b,), jnp.float32)
        return self._forward_visuals(
            self.variables,
            images,
            masks,
            jnp.asarray(target_light, jnp.float32),
            jnp.asarray(target_ambient, jnp.float32),
        )

    def relight_sweep(self, image, mask, lights, ambients=None) -> RenderOutputs:
        """One image, L target lights -> RenderOutputs with leading axis L."""
        lights = jnp.asarray(lights, jnp.float32)
        if ambients is None:
            ambients = jnp.full((lights.shape[0],), 0.5, jnp.float32)
        return self._sweep(
            self.variables,
            self._as_input(image),
            self._as_input(mask),
            lights,
            jnp.asarray(ambients, jnp.float32),
        )

    def relight_sweep_rendered_u8(self, image, mask, lights, ambients=None) -> Array:
        """Sweep returning only masked uint8 renders (L, H, W, 3) — the cheap
        fetch for montage/dump flows."""
        lights = jnp.asarray(lights, jnp.float32)
        if ambients is None:
            ambients = jnp.full((lights.shape[0],), 0.5, jnp.float32)
        return self._sweep_rendered_u8(
            self.variables,
            self._as_input(image),
            self._as_input(mask),
            lights,
            jnp.asarray(ambients, jnp.float32),
        )

    def estimate_lighting(self, images) -> tuple[np.ndarray, np.ndarray]:
        """Estimated (unit direction (B,3), ambient (B,)) from portraits.

        Applies the config's z clamp (0.16 for the transfer preset,
        test_..._lighting_transfer.py:332-334).
        """
        from geomconsistentfr_tpu.render import estimated_light

        images = self._as_input(images)
        # _net_only is an unsharded plain jit except in 'data' mode (grid /
        # samples modes shard only the march, which the net forward skips),
        # so only 'data' constrains the batch here.
        if self.parallel == "data":
            self._check_batch(images.shape[0])
        net = self._net_only(self.variables, images)
        unit, ambient = estimated_light(net.lighting, self.cfg.render)
        return np.asarray(unit), np.asarray(ambient)

    def transfer_lighting(self, input_images, reference_images, masks) -> RenderOutputs:
        """2-pass lighting transfer: estimate from `reference`, render `input`."""
        unit, ambient = self.estimate_lighting(reference_images)
        return self.forward(
            input_images, masks, target_light=unit, target_ambient=ambient
        )


def load_relighter(
    checkpoint_path: str,
    cfg: Optional[PipelineConfig] = None,
    use_skips: Tuple[bool, bool, bool, bool] = FULL_SKIPS,
    mesh=None,
    parallel: str = "data",
) -> Relighter:
    """Build a Relighter from a reference .pth or an orbax checkpoint dir."""
    import os

    if cfg is None:
        cfg = preset_lighting_transfer()
    if os.path.isdir(checkpoint_path):
        from geomconsistentfr_tpu.utils.checkpoint import restore_variables

        variables = restore_variables(checkpoint_path)
    else:
        from geomconsistentfr_tpu.convert import load_relightnet_variables

        variables = load_relightnet_variables(checkpoint_path)

    # Transfer-variant weights (1x1 bias-free shortcuts) embed exactly into
    # the target architecture; auto-convert when the config asks for 'target'
    # but the checkpoint is transfer-shaped (the reference's own target
    # checkpoint is a missing blob upstream).
    shortcut = variables["params"].get("conv_shortcut_h1_out", {})
    ckpt_is_transfer = (
        "kernel" in shortcut and tuple(shortcut["kernel"].shape[:2]) == (1, 1)
    )
    if cfg.model.variant == "target" and ckpt_is_transfer:
        from geomconsistentfr_tpu.convert import transfer_to_target_variant

        variables = transfer_to_target_variant(variables)
    # Packed upload: per-leaf transfers pay a tunnel round trip per leaf
    # (391 checkpoint tensors ~= 2 min of pure latency at CLI startup).
    from geomconsistentfr_tpu.utils.transfer import pack_device_put

    variables = pack_device_put(variables)
    return Relighter(
        cfg, variables, use_skips=use_skips, mesh=mesh, parallel=parallel
    )
