"""geomconsistentfr_tpu: TPU-native face relighting with geometrically consistent shadows.

A ground-up JAX/Flax/Pallas framework with the capabilities of the CVPR 2022
"Face Relighting with Geometrically Consistent Shadows" reference implementation
(single-image face relighting via shared-encoder / dual-decoder hourglass CNN with
a lighting head and a differentiable renderer whose hard cast shadows are computed
by ray-marching every pixel's ray toward a point light across the estimated depth map).

Designed TPU-first:
  * NHWC layouts, XLA-friendly static shapes, branchless renderer (no host sync).
  * `vmap` over target lights, `pjit`/shard_map data parallelism over a device mesh.
  * Pallas fused kernel for the shadow ray-march hot loop.
"""

__version__ = "0.1.0"

from geomconsistentfr_tpu import config  # noqa: F401
