"""Lambertian shading, shadow weighting and compositing.

Reproduces the reference renderer tail (test_relight_single_image.py:332-346,
498-503): point light at `light_distance * unit_direction`, per-pixel incident
direction, clamped Lambertian term scaled by `directional_intensity`, soft
shadow weight w(d) = 1 - 4*sigmoid(d)*(1-sigmoid(d)) applied between full
shading and ambient, and the final albedo*shading composite.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from geomconsistentfr_tpu.ops.geometry import l2_normalize

Array = jax.Array


def directional_shading(
    normals: Array,
    points_3d: Array,
    light_point: Array,
    directional_intensity: float,
) -> Array:
    """Clamped Lambertian term.

    Args:
      normals: (..., H, W, 3) unit surface normals.
      points_3d: (..., H, W, 3) camera-frame surface points.
      light_point: (..., 3) point-light position (broadcast over H, W).
    Returns:
      (..., H, W) `directional_intensity * max(0, n . normalize(L - p))`.
    """
    incident = l2_normalize(light_point[..., None, None, :] - points_3d, axis=-1)
    ndotl = jnp.sum(normals * incident, axis=-1)
    return directional_intensity * jnp.maximum(ndotl, 0.0)


def shadow_weights(min_distance: Array) -> Array:
    """Soft shadow weight w = 1 - 4*e^{-d}/(1+e^{-d})^2 (reference :498).

    w -> 0 as d -> 0 (fully shadowed), w -> 1 as d -> inf (fully lit).
    """
    e = jnp.exp(-min_distance)
    return 1.0 - 4.0 * e / jnp.square(1.0 + e)


def composite(
    albedo: Array,
    full_shading: Array,
    ambient: Array,
    weights: Array,
) -> tuple[Array, Array]:
    """Blend shadowed shading and multiply onto albedo.

    Args:
      albedo: (..., H, W, 3).
      full_shading: (..., H, W) ambient + directional.
      ambient: (..., H, W) ambient-only shading.
      weights: (..., H, W) shadow weights in [0, 1].
    Returns:
      (final_shading (..., H, W), rendered (..., H, W, 3)).
    """
    final_shading = weights * full_shading + (1.0 - weights) * ambient
    rendered = albedo * final_shading[..., None]
    return final_shading, rendered
