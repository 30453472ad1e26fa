"""Ray-marched hard cast shadows (the reference's core novelty), TPU-native.

For every pixel, march along the 2D segment from the pixel toward the point
light (clipped at the image border), sample the estimated depth map with
bilinear interpolation at `num_sample_points` parametric offsets, and take the
minimum 3D point-to-line distance between each depth sample and the pixel->light
ray. Small minimum distance => an occluder crosses the ray => shadow.

Reference: test_relight_single_image.py:348-503. The reference implements the
border clipping as host-side Python branching on the light position (9 cases,
forcing a GPU->CPU sync per image, :357-437) and loops over batch items in
Python. Here the endpoint solve is closed-form and branchless, so the whole
march jits, vmaps over (batch, lights), and differentiates.

Parity notes (quirks preserved as spec):
  * slopes use a +1e-4 denominator guard (:355), the horizontal-border solve
    divides by (slope + 1e-4) (:372), and the in-bounds test for the corner
    cases uses the *unclamped* candidate x (:374).
  * endpoints clamp to x in [-W/2, W/2-1], y in [1-H/2, H/2] (:439-442).
  * mask veto uses banker's-rounded sample indices (:449-454, :488-490);
    bilinear depth lookup uses coordinates shifted by -1e-4 so floor/ceil always
    straddle (:460-471); the sample's xy in the distance computation keeps that
    -1e-4 shift (:473-476).
  * both point-to-line sqrt terms carry a +1e-4 regulariser (:485-486).
  * off-face samples contribute distance 1e6 (:488-490).
  * optional +5.0 bias when the light xy is inside a gate region (:495-496).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from geomconsistentfr_tpu.config import RenderConfig
from geomconsistentfr_tpu.ops.geometry import pixel_grid_centered

Array = jax.Array

_OFF_FACE_DISTANCE = 1.0e6
_EPS = 1e-4


def sample_ts(cfg: RenderConfig) -> np.ndarray:
    """The parametric march offsets t (float64 arange, reference :445)."""
    ts = np.arange(cfg.t_start, cfg.t_stop, cfg.t_step)
    assert ts.shape[0] == cfg.num_sample_points, (
        f"t grid size {ts.shape[0]} != num_sample_points {cfg.num_sample_points}"
    )
    return ts


def sharded_sample_ts(cfg: RenderConfig, n_shards: int) -> np.ndarray:
    """sample_ts padded to equal contiguous increasing per-shard slices.

    The single source of the sample-parallel slicing invariant: shard i takes
    rows [i*chunk, (i+1)*chunk) of the returned float32 array, so slices are
    CONTIGUOUS and INCREASING — the first-global-winner t* combine in
    shadows_pallas._vjp_fwd_sp relies on exactly this ordering to reproduce
    torch.min's first-index tie-break. The tail pad duplicates the final
    offset, which cannot change a running min.
    """
    ts = sample_ts(cfg).astype(np.float32)
    chunk = -(-ts.shape[0] // n_shards)
    if n_shards * chunk > ts.shape[0]:
        ts = np.concatenate(
            [ts, np.repeat(ts[-1:], n_shards * chunk - ts.shape[0])]
        )
    return ts


def on_tpu() -> bool:
    """True when the default jax backend is a TPU (shared path dispatch)."""
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def border_endpoints(
    xx: Array, yy: Array, light_x: Array, light_y: Array, cfg: RenderConfig
) -> tuple[Array, Array]:
    """March endpoints: intersection of each pixel->light 2D line with the border.

    Branchless replacement for the reference's 9-way host-side case analysis
    (:363-437). Returns per-pixel endpoint (ex, ey) in centred coordinates,
    clamped per reference :439-442.
    """
    left = -cfg.half_w
    right = cfg.img_width - cfg.half_w - 1.0
    bottom = 1.0 - cfg.half_h
    top = cfg.half_h

    slopes = (light_y - yy) / (light_x - xx + _EPS)
    intercepts = light_y - slopes * light_x

    zx_neg = light_x < left
    zx_pos = light_x > right
    zx_mid = jnp.logical_not(jnp.logical_or(zx_neg, zx_pos))
    zy_neg = light_y < bottom
    zy_pos = light_y > top
    zy_mid = jnp.logical_not(jnp.logical_or(zy_neg, zy_pos))

    # Vertical border candidate (x fixed at the near border).
    xv = jnp.where(zx_neg, left, right)
    ex_v = jnp.broadcast_to(xv, xx.shape)
    ey_v = slopes * xv + intercepts

    # Horizontal border candidate (y fixed at the near border).
    yh = jnp.where(zy_neg, bottom, top)
    ex_h = (yh - intercepts) / (slopes + _EPS)
    ey_h = jnp.broadcast_to(yh, yy.shape)

    # Corner zones: prefer the horizontal candidate when its (unclamped) x lies
    # within the image's x extent, else the vertical one (:374-375).
    inter = jnp.logical_and(ex_h >= left, ex_h <= right)
    ex_c = jnp.where(inter, ex_h, ex_v)
    ey_c = jnp.where(inter, ey_h, ey_v)

    inside = jnp.logical_and(zx_mid, zy_mid)
    ex = jnp.where(
        inside, light_x, jnp.where(zy_mid, ex_v, jnp.where(zx_mid, ex_h, ex_c))
    )
    ey = jnp.where(
        inside, light_y, jnp.where(zy_mid, ey_v, jnp.where(zx_mid, ey_h, ey_c))
    )

    ex = jnp.clip(ex, left, right)
    ey = jnp.clip(ey, bottom, top)
    return ex, ey


def _bias_gate(light_x: Array, light_y: Array, cfg: RenderConfig) -> Array:
    """Scalar predicate for the +5.0 min-distance bias (:495-496 / transfer :503-504)."""
    if cfg.shadow_bias_gate == "none":
        return jnp.asarray(False)
    if cfg.shadow_bias_gate == "inside_image":
        lo_x, hi_x = -cfg.half_w, cfg.img_width - cfg.half_w - 1.0
        lo_y, hi_y = 1.0 - cfg.half_h, cfg.half_h
    elif cfg.shadow_bias_gate == "wide":
        lo_x, hi_x = -4.0 * cfg.img_width, 4.0 * cfg.img_width
        lo_y, hi_y = 4.0 * (1.0 - cfg.img_height), 4.0 * cfg.img_height
    else:
        raise ValueError(f"unknown shadow_bias_gate: {cfg.shadow_bias_gate}")
    return (
        (light_x >= lo_x) & (light_x <= hi_x) & (light_y >= lo_y) & (light_y <= hi_y)
    )


def sample_distance_at(
    depth: Array,
    mask: Array,
    light_point: Array,
    t: Array,
    cfg: RenderConfig,
) -> Array:
    """Point-to-line distance of the depth sample at parametric offset t.

    Args:
      depth, mask: (H, W); light_point: (3,); t: scalar or (H, W) per-pixel
        offset along each pixel's ray (the march evaluates min over a t grid;
        this evaluates ONE t — used by the Pallas kernel's backward pass at
        the argmin offset, where d(min_s f_s)/dx = d f_{s*}/dx).
    Returns:
      (H, W) distances (off-face samples -> 1e6). Excludes the bias gate
      (an additive constant with zero gradient).
    """
    h, w = cfg.img_height, cfg.img_width
    dtype = depth.dtype
    xx, yy = pixel_grid_centered(h, w, dtype=dtype)
    light_x, light_y = light_point[0], light_point[1]
    ex, ey = border_endpoints(xx, yy, light_x, light_y, cfg)
    bc_x = light_x - xx
    bc_y = light_y - yy
    bc_z = light_point[2] - depth
    denominator = jnp.sqrt(bc_x * bc_x + bc_y * bc_y + bc_z * bc_z + _EPS)

    def flat_take(values, iy, ix):
        iy = jnp.clip(iy, 0, h - 1)
        ix = jnp.clip(ix, 0, w - 1)
        return jnp.take(values.reshape(-1), iy * w + ix, axis=0)

    t2 = jnp.broadcast_to(jnp.asarray(t, dtype), (h, w))
    sx = xx + t2 * (ex - xx)
    sy = yy + t2 * (ey - yy)

    ix_r = (jnp.round(sx) + cfg.half_w).astype(jnp.int32)
    iy_r = (cfg.half_h - jnp.round(sy)).astype(jnp.int32)
    sample_mask = flat_take(mask, iy_r, ix_r)

    xt = sx + cfg.half_w - _EPS
    yt = (cfg.half_h - sy) - _EPS
    x0 = jnp.floor(xt)
    x1 = jnp.ceil(xt)
    y0 = jnp.floor(yt)
    y1 = jnp.ceil(yt)
    d_ul = flat_take(depth, y0.astype(jnp.int32), x0.astype(jnp.int32))
    d_ur = flat_take(depth, y0.astype(jnp.int32), x1.astype(jnp.int32))
    d_ll = flat_take(depth, y1.astype(jnp.int32), x0.astype(jnp.int32))
    d_lr = flat_take(depth, y1.astype(jnp.int32), x1.astype(jnp.int32))
    interp_u = d_ul * (x1 - xt) + d_ur * (xt - x0)
    interp_l = d_ll * (x1 - xt) + d_lr * (xt - x0)
    d_interp = interp_u * (y1 - yt) + interp_l * (yt - y0)

    ba_x = (xt - cfg.half_w) - xx
    ba_y = (cfg.half_h - yt) - yy
    ba_z = d_interp - depth
    cross_x = ba_y * bc_z - ba_z * bc_y
    cross_y = ba_z * bc_x - ba_x * bc_z
    cross_z = ba_x * bc_y - ba_y * bc_x
    numerator = jnp.sqrt(
        cross_x * cross_x + cross_y * cross_y + cross_z * cross_z + _EPS
    )
    distances = numerator / denominator
    return jnp.where(sample_mask == 0, _OFF_FACE_DISTANCE, distances)


def sample_distance_at_matmul(
    depth: Array,
    mask: Array,
    light_point: Array,
    t: Array,
    cfg: RenderConfig,
    precision=None,
) -> Array:
    """`sample_distance_at`, reformulated gather-free (two-hot matmuls).

    Value-identical to `sample_distance_at` (up to measure-zero integral
    shifted coordinates, where the clamped-hat form matches the f64 math
    *better* than the reference's zero-weight f32 corner — see module parity
    notes). The payoff is the VJP: the bilinear lookup's transpose becomes a
    matmul instead of an XLA scatter, which is the fast path on TPU. Used by
    the Pallas kernel's backward (argmin-sample gradient).
    """
    h, w = cfg.img_height, cfg.img_width
    dtype = depth.dtype
    xx, yy = pixel_grid_centered(h, w, dtype=dtype)
    light_x, light_y = light_point[0], light_point[1]
    ex, ey = border_endpoints(xx, yy, light_x, light_y, cfg)
    bc_x = light_x - xx
    bc_y = light_y - yy
    bc_z = light_point[2] - depth
    denominator = jnp.sqrt(bc_x * bc_x + bc_y * bc_y + bc_z * bc_z + _EPS)

    t2 = jnp.broadcast_to(jnp.asarray(t, dtype), (h, w))
    sx = xx + t2 * (ex - xx)
    sy = yy + t2 * (ey - yy)

    p = h * w
    cls_w = jnp.arange(w, dtype=dtype)
    cls_h = jnp.arange(h, dtype=dtype)

    # Banker's-rounded indices for the mask veto (:449-454), one-hot matmul.
    xr = jnp.clip(jnp.round(sx) + cfg.half_w, 0, w - 1).reshape(p, 1)
    yr = jnp.clip(cfg.half_h - jnp.round(sy), 0, h - 1).reshape(p, 1)
    indicator_t = jnp.swapaxes((mask != 0).astype(dtype), -1, -2)
    if precision is None:
        precision = jax.lax.Precision.HIGHEST
    onehot_x = (cls_w[None, :] == xr).astype(dtype)
    # 1.0 x {0,1} products are exact at any precision.
    mrows = jax.lax.dot_general(
        onehot_x,
        indicator_t,
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.DEFAULT,
    )
    on_face = jnp.sum(
        mrows * (cls_h[None, :] == yr).astype(dtype), axis=1
    ).reshape(h, w)

    # Bilinear depth lookup at -1e-4-shifted coordinates (:457-471) as a
    # clamped-hat two-hot matmul over x, then a hat-weighted lane reduce
    # over y (exactly the Pallas forward's algebra).
    xt = sx + cfg.half_w - _EPS
    yt = (cfg.half_h - sy) - _EPS
    xtc = jnp.clip(xt, 0.0, w - 1.0).reshape(p, 1)
    ytc = jnp.clip(yt, 0.0, h - 1.0).reshape(p, 1)
    hat_x = jnp.maximum(0.0, 1.0 - jnp.abs(cls_w[None, :] - xtc))
    b = jax.lax.dot_general(
        hat_x,
        jnp.swapaxes(depth, -1, -2),
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=precision,
    )
    hat_y = jnp.maximum(0.0, 1.0 - jnp.abs(cls_h[None, :] - ytc))
    d_interp = jnp.sum(b * hat_y, axis=1).reshape(h, w)

    # Sample 3D point keeps the shifted xy (:473-476).
    ba_x = (xt - cfg.half_w) - xx
    ba_y = (cfg.half_h - yt) - yy
    ba_z = d_interp - depth
    cross_x = ba_y * bc_z - ba_z * bc_y
    cross_y = ba_z * bc_x - ba_x * bc_z
    cross_z = ba_x * bc_y - ba_y * bc_x
    numerator = jnp.sqrt(
        cross_x * cross_x + cross_y * cross_y + cross_z * cross_z + _EPS
    )
    distances = numerator / denominator
    return jnp.where(on_face == 0, _OFF_FACE_DISTANCE, distances)


def cull_live_rows(mask: Array) -> Array:
    """(H, W) mask -> (H,) bool: row belongs to an 8-row group with any face.

    The cull granularity is a FIXED 8-row-aligned group (one sublane tile),
    independent of kernel slab tiling, so the culled pixel set is identical
    across the pure-XLA path and the Pallas kernel at any slab size.
    """
    h = mask.shape[0]
    row_any = (mask != 0).any(axis=1)
    pad = (-h) % 8
    if pad:
        row_any = jnp.concatenate(
            [row_any, jnp.zeros((pad,), row_any.dtype)]
        )
    group_any = row_any.reshape(-1, 8).any(axis=1)
    return jnp.repeat(group_any, 8)[:h]


def cull_live_blocks(mask: Array, col_chunk: int) -> Array:
    """(H, W) mask -> (H, W) bool: pixel's (8-row x C-col) block has any face.

    The column-aware cull unit (RenderConfig.shadow_col_chunk). Blocks are
    FIXED 8-row-aligned x C-column-aligned, independent of kernel slab/chunk
    tiling, so the culled pixel set is identical across the pure-XLA path
    and the Pallas kernel. col_chunk >= W degrades to cull_live_rows'
    row-group semantics (one block per group).
    """
    h, w = mask.shape
    c = min(col_chunk, w)
    assert w % c == 0, (w, col_chunk)
    row_pad = (-h) % 8
    on = mask != 0
    if row_pad:
        on = jnp.concatenate([on, jnp.zeros((row_pad, w), on.dtype)])
    block_any = on.reshape(-1, 8, w // c, c).any(axis=(1, 3))
    return jnp.repeat(jnp.repeat(block_any, 8, axis=0)[:h], c, axis=1)


def _cull_live(mask: Array, cfg: RenderConfig) -> Array:
    """(H, W) bool liveness under the configured cull granularity."""
    if cfg.shadow_col_chunk:
        return cull_live_blocks(mask, cfg.shadow_col_chunk)
    return jnp.broadcast_to(cull_live_rows(mask)[:, None], mask.shape)


def ray_march_min_distance(
    depth: Array,
    mask: Array,
    light_point: Array,
    cfg: RenderConfig,
    ts: Optional[Array] = None,
    return_argmin_t: bool = False,
) -> Array:
    """Minimum 3D point-to-line distance per pixel (single image, single light).

    Args:
      depth: (H, W) estimated depth (already scaled by depth_scale).
      mask: (H, W) face mask; exactly-zero entries veto samples.
      light_point: (3,) point-light position `light_distance * unit_direction`
        in centred image coordinates.
      cfg: renderer constants (static).
      ts: optional override of the sample offsets (1-D, any length). Used by
        the sample-parallel mesh path (infer.py), which gives each device a
        slice of sample_ts(cfg) and pmin-combines the partial results —
        f32 min is associative, so the combined output is bit-identical to
        the full march. Values may be traced; the length must be static.
      return_argmin_t: also return the winning offset t* per pixel
        (first-minimal-sample tie-break, matching torch.min), used by the
        sample-sharded training backward.
    Returns:
      (H, W) minimum distance, plus `shadow_bias` when the gate predicate
      holds; with return_argmin_t, a (min_distance, t_star) pair.
    """
    h, w = cfg.img_height, cfg.img_width
    assert depth.shape == (h, w), depth.shape
    dtype = depth.dtype

    xx, yy = pixel_grid_centered(h, w, dtype=dtype)
    light_x, light_y = light_point[0], light_point[1]

    ex, ey = border_endpoints(xx, yy, light_x, light_y, cfg)
    diff_x = ex - xx
    diff_y = ey - yy

    # BC = light - pixel point; constant across march steps (:481-486).
    bc_x = light_x - xx
    bc_y = light_y - yy
    bc_z = light_point[2] - depth
    denominator = jnp.sqrt(bc_x * bc_x + bc_y * bc_y + bc_z * bc_z + _EPS)

    depth_flat = depth.reshape(-1)
    mask_flat = mask.reshape(-1)

    def flat_take(values: Array, iy: Array, ix: Array) -> Array:
        iy = jnp.clip(iy, 0, h - 1)
        ix = jnp.clip(ix, 0, w - 1)
        return jnp.take(values, iy * w + ix, axis=0)

    if ts is None:
        ts = sample_ts(cfg)
    chunk = max(1, min(cfg.march_chunk, ts.shape[0]))
    pad = (-ts.shape[0]) % chunk
    if pad:
        # Duplicate the final t; duplicates cannot change the running min.
        xp = np if isinstance(ts, np.ndarray) else jnp
        ts = xp.concatenate([ts, xp.repeat(ts[-1:], pad)])
    t_chunks = jnp.asarray(ts, dtype=dtype).reshape(-1, chunk)

    def step(carry_min: Array, t_chunk: Array) -> tuple[Array, None]:
        t = t_chunk[:, None, None]                     # (C, 1, 1)
        sx = xx[None] + t * diff_x[None]               # (C, H, W) centred coords
        sy = yy[None] + t * diff_y[None]

        # Banker's-rounded indices for the mask veto (:449-454).
        ix_r = (jnp.round(sx) + cfg.half_w).astype(jnp.int32)
        iy_r = (cfg.half_h - jnp.round(sy)).astype(jnp.int32)
        sample_mask = flat_take(mask_flat, iy_r, ix_r)

        # Bilinear depth lookup at coordinates shifted by -1e-4 (:457-471).
        xt = sx + cfg.half_w - _EPS
        yt = (cfg.half_h - sy) - _EPS
        x0 = jnp.floor(xt)
        x1 = jnp.ceil(xt)
        y0 = jnp.floor(yt)
        y1 = jnp.ceil(yt)
        ix0 = x0.astype(jnp.int32)
        ix1 = x1.astype(jnp.int32)
        iy0 = y0.astype(jnp.int32)
        iy1 = y1.astype(jnp.int32)
        d_ul = flat_take(depth_flat, iy0, ix0)
        d_ur = flat_take(depth_flat, iy0, ix1)
        d_ll = flat_take(depth_flat, iy1, ix0)
        d_lr = flat_take(depth_flat, iy1, ix1)
        wx0 = x1 - xt
        wx1 = xt - x0
        interp_u = d_ul * wx0 + d_ur * wx1
        interp_l = d_ll * wx0 + d_lr * wx1
        d_interp = interp_u * (y1 - yt) + interp_l * (yt - y0)

        # Sample 3D point keeps the -1e-4-shifted xy (:473-476).
        ba_x = (xt - cfg.half_w) - xx[None]
        ba_y = (cfg.half_h - yt) - yy[None]
        ba_z = d_interp - depth[None]

        cross_x = ba_y * bc_z[None] - ba_z * bc_y[None]
        cross_y = ba_z * bc_x[None] - ba_x * bc_z[None]
        cross_z = ba_x * bc_y[None] - ba_y * bc_x[None]
        numerator = jnp.sqrt(
            cross_x * cross_x + cross_y * cross_y + cross_z * cross_z + _EPS
        )
        distances = numerator / denominator[None]
        distances = jnp.where(sample_mask == 0, _OFF_FACE_DISTANCE, distances)
        if not return_argmin_t:
            return jnp.minimum(carry_min, jnp.min(distances, axis=0)), None
        # First-winner tie-break (torch.min semantics): argmin picks the
        # first minimal index within the chunk; strict < keeps the earlier
        # chunk's winner. Duplicated pad offsets therefore never displace
        # the original winner.
        carry_min, carry_t = carry_min
        chunk_min = jnp.min(distances, axis=0)
        chunk_t = t_chunk[jnp.argmin(distances, axis=0)]
        better = chunk_min < carry_min
        return (
            jnp.where(better, chunk_min, carry_min),
            jnp.where(better, chunk_t.astype(dtype), carry_t),
        ), None

    init = jnp.full((h, w), jnp.inf, dtype=dtype)
    if return_argmin_t:
        init = (init, jnp.zeros((h, w), dtype=dtype))
    carry_out, _ = jax.lax.scan(step, init, t_chunks)
    if return_argmin_t:
        min_distance, t_star = carry_out
    else:
        min_distance = carry_out

    if cfg.shadow_mask_cull:
        # Semantic reference for the Pallas kernel's slab skip: pixels in
        # fully-off-face 8-row-aligned groups read the all-vetoed sentinel
        # (see RenderConfig.shadow_mask_cull for the exactness argument).
        # This path selects rather than skips — it is the oracle, not the
        # optimisation.
        live = _cull_live(mask, cfg)
        min_distance = jnp.where(
            live, min_distance, jnp.asarray(_OFF_FACE_DISTANCE, dtype)
        )
        if return_argmin_t:
            t_star = jnp.where(live, t_star, t_chunks[0, 0].astype(dtype))

    if cfg.shadow_bias_gate != "none":
        gate = _bias_gate(light_x, light_y, cfg)
        min_distance = min_distance + jnp.where(gate, cfg.shadow_bias, 0.0).astype(dtype)
    if return_argmin_t:
        return min_distance, t_star
    return min_distance


def ray_march_min_distance_batch(
    depths: Array,
    masks: Array,
    light_points: Array,
    cfg: RenderConfig,
    ts: Optional[Array] = None,
    return_argmin_t: bool = False,
) -> Array:
    """vmap over the batch axis: (B,H,W), (B,H,W), (B,3) -> (B,H,W)."""
    return jax.vmap(
        partial(ray_march_min_distance, return_argmin_t=return_argmin_t),
        in_axes=(0, 0, 0, None, None),
    )(depths, masks, light_points, cfg, ts)


def ray_march_min_distance_lights(
    depth: Array, mask: Array, light_points: Array, cfg: RenderConfig
) -> Array:
    """vmap over a sweep of lights: (H,W), (H,W), (L,3) -> (L,H,W)."""
    return jax.vmap(ray_march_min_distance, in_axes=(None, None, 0, None))(
        depth, mask, light_points, cfg
    )


# ---------------------------------------------------------------------------
# Draft-mode (reduced-resolution) march: RenderConfig.shadow_resolution_scale
# ---------------------------------------------------------------------------
#
# Scene-scaling identity: shrinking EVERY coordinate of the scene by 1/s —
# the pixel grid, the depth values and the light point — shrinks every
# point-to-line distance by exactly 1/s (the march's parametric t grid is
# scale-invariant: t parameterises the pixel->border segment). So a march on
# an s x s mean-pooled depth map at depth/s and light/s, upsampled and
# multiplied back by s, differs from the full march ONLY through the spatial
# sampling of the depth/mask fields and the interpolation of the min-distance
# field. No reference counterpart (the reference always marches at full
# resolution); this is the 'draft' serving tier's turbo. Training never
# enables it, but the ops themselves (pool / resize) carry exact JAX
# gradients, so the path stays differentiable.
#
# Grid alignment (exact, verified in tests/test_shadows_draft.py): the s x s
# mean-pool centres sit at full-resolution coordinates s*i + (s-1)/2, which
# is precisely where jax.image.resize's half-pixel-centres bilinear
# convention places the low-res samples on upsampling — pooling and resizing
# a linear field round-trips exactly. The pooled grid's CENTRED coordinates
# are offset by (s-1)/(2s) from the scaled scene, so the scaled light is
# shifted by that constant (minus in x, plus in the flipped y) to land on
# the same physical point.


def scaled_render_cfg(cfg: RenderConfig) -> RenderConfig:
    """The RenderConfig the inner (low-resolution) march runs under."""
    import dataclasses

    s = cfg.shadow_resolution_scale
    r = cfg.shadow_lowres_t_stride
    t_step = cfg.t_step * r
    # arange-length, not a division: the reference grid itself is an
    # arange(t_start, t_stop, t_step) (sample_ts) and the strided grid is
    # exactly its every-r-th element.
    n = int(np.arange(cfg.t_start, cfg.t_stop, t_step).shape[0])
    return dataclasses.replace(
        cfg,
        img_height=cfg.img_height // s,
        img_width=cfg.img_width // s,
        # (d_low + bias/s) * s = d_full + bias: the gate bias rides the
        # rescale. (The gate REGION derives from the scaled image bounds,
        # which tracks the full-resolution region to within one pixel.)
        shadow_bias=cfg.shadow_bias / s,
        shadow_resolution_scale=1,
        t_step=t_step,
        num_sample_points=n,
        shadow_lowres_t_stride=1,
    )


def scale_march_inputs(
    depth: Array, mask: Array, light_point: Array, cfg: RenderConfig
) -> tuple[Array, Array, Array, RenderConfig]:
    """Pool (depth, mask) and scale the light for the draft-mode march.

    Args:
      depth: (B, H, W) depth in scene units.
      mask: (B, H, W) face mask (!= 0 means on-face).
      light_point: (B, 3) light position in centred pixel coords.
    Returns:
      (depth/s pooled (B, H/s, W/s), majority-pooled {0,1} mask,
       scaled+aligned light (B, 3), the scaled RenderConfig).
    """
    s = cfg.shadow_resolution_scale
    b, h, w = depth.shape
    blocks = depth.reshape(b, h // s, s, w // s, s)
    on = (mask != 0).astype(depth.dtype).reshape(b, h // s, s, w // s, s)
    on_count = on.sum(axis=(2, 4))
    # Mask-weighted depth pooling: a majority-on-face texel averages only
    # its on-face pixels, so the CNN's arbitrary off-face depth (the masked
    # training losses never supervise it) cannot pull the pooled occluder
    # surface along the silhouette. All-off blocks keep the plain mean
    # (their samples are mask-vetoed; the value only feeds boundary
    # interpolation taps, like off-face pixels do at full resolution).
    face_mean = (blocks * on).sum(axis=(2, 4)) / jnp.maximum(on_count, 1.0)
    depth_h = jnp.where(on_count > 0, face_mean, blocks.mean(axis=(2, 4))) / s
    mask_h = (on_count >= (s * s) / 2.0).astype(depth.dtype)
    off = (s - 1.0) / (2.0 * s)
    light_h = jnp.stack(
        [
            light_point[:, 0] / s - off,   # xx = col - W/2 (left-to-right)
            light_point[:, 1] / s + off,   # yy = H/2 - row (flipped)
            light_point[:, 2] / s,
        ],
        axis=-1,
    )
    return depth_h, mask_h, light_h, scaled_render_cfg(cfg)


def upscale_min_distance(min_h: Array, cfg: RenderConfig) -> Array:
    """(B, H/s, W/s) low-res min distances -> (B, H, W) full-scale ones.

    The off-face sentinel (1e6, plus the gate bias where gated) is capped
    before interpolation and restored after the rescale, so interior
    off-face pixels read exactly 1e6 like the full-resolution path; within
    ~s px of the face boundary the blend with the sentinel saturates the
    pixel to "lit" (the shadow weight there is draft-approximate anyway).
    """
    s = cfg.shadow_resolution_scale
    b = min_h.shape[0]
    out = jax.image.resize(
        jnp.minimum(min_h, _OFF_FACE_DISTANCE),
        (b, cfg.img_height, cfg.img_width),
        method="bilinear",
    ) * float(s)
    return jnp.minimum(out, _OFF_FACE_DISTANCE)


# ---------------------------------------------------------------------------
# Draft-mode boundary refine (RenderConfig.shadow_refine_halfwidth)
# ---------------------------------------------------------------------------
#
# Pure upsampling of the low-resolution min-distance field places shadow
# boundaries with ~s px error, and ~90% of the draft tier's visible error
# lives in that boundary band (measured on the golden fixtures). The refine
# pass re-evaluates the distance at FULL resolution, but only on the 2k+1
# march offsets around the low-res march's per-pixel argmin t* — cost
# ~ (2k+1)/num_sample_points of a full march. t* is upsampled NEAREST-
# NEIGHBOUR: it is discontinuous across shadow boundaries (occluder t on one
# side, unrelated t on the other), and bilinear averaging centres the refine
# window at a t where no occluder exists (measured: 39.2 dB visible on the
# corner-light fixture vs 52.2 dB with NN, worse than no refine at all).
# No reference counterpart (the reference always marches full-resolution);
# draft output is certified against the >= 40 dB visible-parity bar instead.


def upsample_tstar_nn(t_star: Array, cfg: RenderConfig) -> Array:
    """(B, H/s, W/s) low-res argmin offsets -> (B, H, W) nearest-neighbour.

    Each low-res texel is the mean-pool of an s x s full-resolution block
    (scale_march_inputs), so repeating assigns every full-res pixel its own
    block's t* exactly.
    """
    s = cfg.shadow_resolution_scale
    return jnp.repeat(jnp.repeat(t_star, s, axis=1), s, axis=2)


def refine_offsets(cfg: RenderConfig) -> np.ndarray:
    """The refine window's relative offsets j*t_step, j in [-k, k-1] (f32).

    2k offsets, not the symmetric 2k+1: the Pallas step grid pads to a
    multiple of 8 (SMEM sublane constraint), so a 9-step window would run
    16 steps; dropping the +k edge costs < 0.01 dB on every fixture
    (window-shape sweep, round 4) and keeps the step count pad-free.
    """
    k = cfg.shadow_refine_halfwidth
    return (np.arange(-k, k) * cfg.t_step).astype(np.float32)


def refine_min_distance(
    depth: Array,
    mask: Array,
    light_point: Array,
    t_map: Array,
    cfg: RenderConfig,
    offsets: Optional[Array] = None,
) -> Array:
    """Windowed full-resolution re-march around per-pixel offsets t_map.

    Single image: depth/mask/t_map (H, W), light_point (3,). Returns the min
    of sample_distance_at over {clip(t_map + off, t_range) : off in offsets}
    plus the gate bias, with the cull sentinel applied (same 8-row groups as
    the march). `offsets` overrides the [-k, k]*t_step window — the sample-
    parallel path hands each device a slice and pmin-combines (exact: f32
    min is associative and every device applies the same bias/sentinel).
    """
    ts = sample_ts(cfg)
    tlo, thi = float(ts[0]), float(ts[-1])
    if offsets is None:
        offsets = refine_offsets(cfg)
    dtype = depth.dtype

    def step(carry: Array, off: Array) -> tuple[Array, None]:
        t = jnp.clip(t_map + off, tlo, thi)
        d = sample_distance_at(depth, mask, light_point, t, cfg)
        return jnp.minimum(carry, d), None

    best, _ = jax.lax.scan(
        step,
        jnp.full(depth.shape, _OFF_FACE_DISTANCE, dtype),
        jnp.asarray(offsets, dtype),
    )
    if cfg.shadow_mask_cull:
        live = _cull_live(mask, cfg)
        best = jnp.where(live, best, jnp.asarray(_OFF_FACE_DISTANCE, dtype))
    if cfg.shadow_bias_gate != "none":
        gate = _bias_gate(light_point[0], light_point[1], cfg)
        best = best + jnp.where(gate, cfg.shadow_bias, 0.0).astype(dtype)
    return best


def refine_min_distance_batch(
    depths: Array,
    masks: Array,
    light_points: Array,
    t_maps: Array,
    cfg: RenderConfig,
    offsets: Optional[Array] = None,
) -> Array:
    """vmap over the batch: (B,H,W) x3 + (B,3) -> (B,H,W)."""
    return jax.vmap(
        lambda d, m, lp, t: refine_min_distance(d, m, lp, t, cfg, offsets)
    )(depths, masks, light_points, t_maps)
