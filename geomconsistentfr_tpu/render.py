"""Differentiable renderer: network outputs -> relit image.

Composes the geometry, shading and shadow ops into the reference's rendering
semantics (test_relight_single_image.py:326-505):
  1. surface normals from (depth + depth_offset) via intrinsics, y negated (:326-327)
  2. 3D point map (xx, yy, depth) on the centred pixel grid (:329)
  3. point light at light_distance * unit_direction (:332-336)
  4. clamped Lambertian directional term (:337-346)
  5. ray-marched min distance -> soft shadow weights (:348-499)
  6. final shading blend and albedo composite (:499-503)

The light source / ambient source are configured by RenderConfig
(lighting_mode / ambient_mode / z_clamp_min), covering all five reference
entry points; see config.py provenance notes.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from geomconsistentfr_tpu.config import RenderConfig
from geomconsistentfr_tpu.ops import shadows as shadows_ops
from geomconsistentfr_tpu.ops.geometry import (
    depth_to_normals,
    l2_normalize,
    pixel_grid_centered,
)
from geomconsistentfr_tpu.ops.shading import (
    composite,
    directional_shading,
    shadow_weights,
)

Array = jax.Array


# Shared backend probe (ops.shadows.on_tpu); kept under the old name for the
# call sites that import it from here.
_on_tpu = shadows_ops.on_tpu


class RenderOutputs(NamedTuple):
    """Superset of all tensors the reference forwards return (:505, :514, :524)."""

    albedo: Array                        # (B, H, W, 3)
    depth: Array                         # (B, H, W)
    shadow_mask_weights: Array           # (B, H, W)
    ambient_light: Array                 # (B, H, W) ambient-only shading map
    full_shading: Array                  # (B, H, W)
    rendered: Array                      # (B, H, W, 3)
    unit_light_direction: Array          # (B, 3) light used for rendering
    ambient_values: Array                # (B,) ambient used for rendering
    final_shading: Array                 # (B, H, W)
    surface_normals: Array               # (B, H, W, 3)
    estimated_unit_light_direction: Array  # (B, 3) head estimate (z clamped)
    estimated_ambient: Array             # (B,) head ambient estimate
    min_distance: Array                  # (B, H, W) ray-march output


def estimated_light(lighting: Array, cfg: RenderConfig) -> tuple[Array, Array]:
    """Split + post-process the raw lighting head output (B, 4).

    Returns (unit_direction (B,3), ambient (B,)). The z component is clamped at
    cfg.z_clamp_min before normalisation (train_*.py:358-360 clamp at 0;
    transfer test clamps at 0.16, test_..._lighting_transfer.py:332-334).
    """
    ambient = lighting[:, 0]
    direction = lighting[:, 1:4]
    z = jnp.maximum(direction[:, 2], cfg.z_clamp_min)
    direction = jnp.concatenate([direction[:, 0:2], z[:, None]], axis=-1)
    return l2_normalize(direction, axis=-1), ambient


def render(
    albedo: Array,
    depth: Array,
    lighting: Array,
    mask: Array,
    cfg: RenderConfig,
    target_light: Optional[Array] = None,
    target_ambient: Optional[Array] = None,
    march_fn=None,
) -> RenderOutputs:
    """Render a relit image from network outputs.

    Args:
      albedo: (B, H, W, 3) in [0, 1].
      depth: (B, H, W), already scaled by depth_scale.
      lighting: (B, 4) raw lighting-head output [ambient, lx, ly, lz].
      mask: (B, H, W) face mask (exact zeros veto shadow samples).
      cfg: static renderer constants.
      target_light: (B, 3) target light direction (need not be unit).
      target_ambient: (B,) target ambient intensity.
      march_fn: optional override of the shadow-march dispatch,
        (depth (B,H,W), mask, light_point (B,3)) -> min_distance (B,H,W).
        Used by the sample-parallel mesh path (infer.py), which marches a
        per-device slice of the sample grid and pmin-combines. It receives
        the MARCH-resolution inputs: at shadow_resolution_scale > 1 (draft
        tier) these are the pooled/scaled tensors, and the march_fn must
        close over the correspondingly scaled RenderConfig
        (ops/shadows.scaled_render_cfg); the t grid itself is
        scale-invariant, so sharded sample slices work unchanged. When the
        draft boundary refine is on (shadow_refine_halfwidth > 0 at
        scale > 1), render() instead calls
        march_fn(depth, mask, light_point, return_argmin_t=True) and
        expects (min_distance, t_star) with a first-global-winner t*
        combine, plus a `refine_fn` attribute on the march_fn —
        (full-res depth, mask, light_point, t_map) -> refined min — so
        the sharded path can also shard the refine window (infer.py
        builds both).
    """
    b, h, w = depth.shape
    f = cfg.focal_length
    cx, cy = cfg.half_w, cfg.half_h

    est_unit, est_ambient = estimated_light(lighting, cfg)

    if cfg.lighting_mode == "target":
        if target_light is None:
            raise ValueError("lighting_mode='target' requires target_light")
        unit_dir = l2_normalize(target_light, axis=-1)
    elif cfg.lighting_mode == "self_estimated":
        unit_dir = est_unit
    else:
        raise ValueError(f"unknown lighting_mode: {cfg.lighting_mode}")

    if cfg.ambient_mode == "estimated":
        ambient = est_ambient
    elif cfg.ambient_mode == "estimated_minus_0.1":
        ambient = est_ambient - 0.1
    elif cfg.ambient_mode == "target":
        if target_ambient is None:
            raise ValueError("ambient_mode='target' requires target_ambient")
        ambient = target_ambient
    else:
        raise ValueError(f"unknown ambient_mode: {cfg.ambient_mode}")

    # Normals (y negated, reference :327; renormalisation at :338 is a no-op
    # on already-unit normals).
    normals = depth_to_normals(depth + cfg.depth_offset, f, f, cx, cy)
    normals = normals * jnp.asarray([1.0, -1.0, 1.0], dtype=normals.dtype)

    xx, yy = pixel_grid_centered(h, w, dtype=depth.dtype)
    points_3d = jnp.stack(
        [jnp.broadcast_to(xx, depth.shape), jnp.broadcast_to(yy, depth.shape), depth],
        axis=-1,
    )

    light_point = cfg.light_distance * unit_dir  # (B, 3)
    directional = directional_shading(
        normals, points_3d, light_point, cfg.directional_intensity
    )
    ambient_map = jnp.broadcast_to(ambient[:, None, None], depth.shape)
    full_shading = ambient_map + directional

    # Draft mode (RenderConfig.shadow_resolution_scale > 1): march at
    # reduced resolution under the exact scene-scaling identity — see
    # ops/shadows.scale_march_inputs. A custom march_fn (sample/grid
    # parallelism) receives the scaled inputs and must close over the
    # scaled config; its pmin combine stays exact because the t grid is
    # scale-invariant.
    scale = cfg.shadow_resolution_scale
    refine = scale > 1 and cfg.shadow_refine_halfwidth > 0
    if scale > 1:
        m_depth, m_mask, m_light, m_cfg = shadows_ops.scale_march_inputs(
            depth, mask, light_point, cfg
        )
    else:
        m_depth, m_mask, m_light, m_cfg = depth, mask, light_point, cfg

    t_star = None
    on_pallas = cfg.use_pallas_shadows and _on_tpu()
    if march_fn is not None:
        if refine:
            min_distance, t_star = march_fn(
                m_depth, m_mask, m_light, return_argmin_t=True
            )
        else:
            min_distance = march_fn(m_depth, m_mask, m_light)
    elif on_pallas:
        from geomconsistentfr_tpu.ops.shadows_pallas import (
            ray_march_min_distance_pallas,
            ray_march_min_distance_pallas_vjp,
        )

        if refine:
            # Serving-only path (draft tier): no custom VJP needed.
            min_distance, t_star = ray_march_min_distance_pallas(
                m_depth, m_mask, m_light, m_cfg, return_argmin_t=True
            )
        else:
            min_distance = ray_march_min_distance_pallas_vjp(
                m_depth, m_mask, m_light, m_cfg
            )
    else:
        if refine:
            min_distance, t_star = shadows_ops.ray_march_min_distance_batch(
                m_depth, m_mask, m_light, m_cfg, return_argmin_t=True
            )
        else:
            min_distance = shadows_ops.ray_march_min_distance_batch(
                m_depth, m_mask, m_light, m_cfg
            )
    if scale > 1:
        if refine:
            # Boundary refine: re-march the 2k-offset window around the
            # NN-upsampled low-res argmin t* at FULL resolution — see
            # ops/shadows.refine_min_distance. Recovers the low-res
            # shadow-boundary placement (~90% of draft's visible error).
            t_map = shadows_ops.upsample_tstar_nn(t_star, cfg)
            refine_fn = getattr(march_fn, "refine_fn", None)
            if refine_fn is not None:
                min_distance = refine_fn(depth, mask, light_point, t_map)
            elif on_pallas:
                from geomconsistentfr_tpu.ops.shadows_pallas import (
                    refine_min_distance_pallas,
                )

                min_distance = refine_min_distance_pallas(
                    depth, mask, light_point, t_map, cfg
                )
            else:
                min_distance = shadows_ops.refine_min_distance_batch(
                    depth, mask, light_point, t_map, cfg
                )
        else:
            min_distance = shadows_ops.upscale_min_distance(min_distance, cfg)
    weights = shadow_weights(min_distance)
    final_shading, rendered = composite(albedo, full_shading, ambient_map, weights)

    return RenderOutputs(
        albedo=albedo,
        depth=depth,
        shadow_mask_weights=weights,
        ambient_light=ambient_map,
        full_shading=full_shading,
        rendered=rendered,
        unit_light_direction=unit_dir,
        ambient_values=ambient,
        final_shading=final_shading,
        surface_normals=normals,
        estimated_unit_light_direction=est_unit,
        estimated_ambient=est_ambient,
        min_distance=min_distance,
    )
