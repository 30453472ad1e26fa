"""Fused Pallas TPU kernel for the shadow ray-march.

Semantics identical to ops/shadows.ray_march_min_distance (reference
test_relight_single_image.py:348-503); see that module for the parity notes.

Why a kernel: XLA lowers the bilinear depth lookups to generic gathers, which
dominate end-to-end time (~620 ms per image-light at 160 samples x 65k
pixels). TPUs have no arbitrary 2D vector gather, but they have a huge MXU —
so the kernel reformulates the lookup as structured matmuls:

  * x-axis: the two bilinear taps (x0, x1 = ceil) with weights (wx0, wx1)
    become a "two-hot" weight matrix Wx (P, W); one MXU matmul
    B = Wx @ depth^T yields the x-interpolated depth at EVERY image row per
    sample: B[p, r] = wx0 * depth[r, x0_p] + wx1 * depth[r, x1_p].
  * y-axis: the two row taps (y0, y1) become a two-hot mask over B's lane
    axis; the weighted lane reduction runs either as a VPU cross-lane sum
    or as a ones-vector MXU matvec (RenderConfig.shadow_reduce).
  * mask veto: a one-hot matmul over the 0/1 face indicator gathers
    indicator[yr, xr] exactly (a single 1.0 x {0,1} product per output);
    RenderConfig.shadow_mask_gather='hat' folds it into a widened depth
    matmul instead (approximate at half-integer knife edges).

All tensors stay in VMEM; reshapes only collapse/split sublane-major dims
(free relayouts). Grid = (batch, row-tiles); the sample steps run in a
fori_loop carrying the running min (the training path additionally carries
the winning sample's compact int32 index; the wrapper recovers the exact
f32 t* from the sample table outside the kernel). Matmul precision is
configurable via RenderConfig.shadow_matmul_precision: 'highest' (true
f32, bit-close parity) or 'default' (bf16 passes, faster, ~1e-3 relative
depth error); tiling via shadow_tile_rows/shadow_slab_rows.

RenderConfig.shadow_step_pack=2 (draft-tier turbo) fuses two march steps
per loop iteration: one (SUB, W, 2W) x-tap hat build, one (SUB, W, 4H)
y-tap build and ONE block-diagonal (2W, 4H)-operand matmul gather depth
AND indicator for BOTH steps — lane-packing for sub-128-wide marches
(the 64^2 low-res draft march half-fills every (8, 128) vreg and MXU
tile; the pack fills them).
"""

from __future__ import annotations

import functools
import os
import types

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from geomconsistentfr_tpu.config import RenderConfig
from geomconsistentfr_tpu.ops import shadows as shadows_ref

Array = jax.Array

_EPS = 1e-4
_OFF_FACE = 1.0e6
# Sentinel for the carried norm^2 (any real sample's norm^2 stays far below).
_OFF_FACE_N2 = 1.0e30


def _march_kernel(
    ts_ref,           # (S, 1) f32 SMEM: sample offsets — ABSOLUTE t values
                      # for the march, RELATIVE window offsets in refine mode
    light_ref,        # (B, 3) f32 SMEM: light points (indexed by program_id 0)
    *rest_refs,       # [rowany_ref (cull)], operand_t, depth_tile,
                      # [tmap_tile (refine)],
                      # [indicator_t_ref (onehot mode)], out_ref,
                      # [tstar_ref (training)]
    cfg: RenderConfig,
    tile_rows: int,
    precision,
    unroll: int,
    mask_mode: str,
    want_tstar: bool,
    cull: bool,
    refine_t_range: tuple[float, float] | None = None,
    step_pack: int = 1,
    col_chunk: int = 0,
):
    # Refine mode (refine_t_range set): each step evaluates the PER-PIXEL
    # offset clip(tmap + ts[s], t_range) instead of the shared scalar ts[s].
    # Structurally free: every coordinate downstream (sx/sy, the hat builds,
    # the veto) is already per-pixel; only the t broadcast changes shape.
    refine = refine_t_range is not None
    mask_hat = mask_mode == "hat"
    # Pack=2 fuses the indicator into its block-diagonal operand (like hat
    # mode's widened operand); no separate indicator input then.
    fused_operand = mask_hat or step_pack == 2
    rest = list(rest_refs)
    # Cull-mode liveness flags, i32 SMEM. Row cull (col_chunk == 0):
    # (B, H8) per-row any-face flags (8-padded). Column cull: (B, G * NC)
    # per-(8-row-group, column-chunk) any-face flags, flat-indexed
    # [img, g * NC + c].
    rowany_ref = rest.pop(0) if cull else None
    operand_t_ref = rest.pop(0)   # (1, W, H) depth^T — or (1, W, 2H)
                                  # [depth^T|indicator^T] in hat mode — or
                                  # (1, 2W, 4H) block-diag in pack=2 mode
    depth_tile_ref = rest.pop(0)  # (1, TILE, W) f32 VMEM: this tile's rows
    tmap_tile_ref = rest.pop(0) if refine else None  # (1, TILE, W) f32 VMEM
    indicator_t_ref = None if fused_operand else rest.pop(0)
    out_ref = rest.pop(0)
    tstar_ref = rest.pop(0) if want_tstar else None
    assert not (refine and want_tstar), "refine emits no argmin"
    assert step_pack in (1, 2)
    assert step_pack == 1 or (mask_mode == "bilinear" and not refine)
    h, w = cfg.img_height, cfg.img_width
    tr = tile_rows
    img = pl.program_id(0)
    row0 = pl.program_id(1) * tr

    lx = light_ref[img, 0]
    ly = light_ref[img, 1]
    lz = light_ref[img, 2]

    operand_t = operand_t_ref[0]      # (W, H), (W, 2H) or (2W, 4H)
    indicator_t = None if fused_operand else indicator_t_ref[0]  # (W, H)

    # 'high' precision: ~f32-accurate gather via a manual bf16 split —
    # W @ D ≈ Whi@Dhi + Whi@Dlo + Wlo@Dhi, three single-pass bf16 matmuls
    # (relative error ~2^-18, far below the parity budget) instead of
    # HIGHEST's ~6 passes. Operand split happens once per grid cell.
    if precision == "high":
        op_hi_f32 = operand_t.astype(jnp.bfloat16).astype(jnp.float32)
        op_hi = op_hi_f32.astype(jnp.bfloat16)
        op_lo = (operand_t - op_hi_f32).astype(jnp.bfloat16)

    def gather_dot(wx2d):
        """(P, W) f32 weights @ operand -> (P, H or 2H) f32."""
        if precision == "high":
            whi_f32 = wx2d.astype(jnp.bfloat16).astype(jnp.float32)
            whi = whi_f32.astype(jnp.bfloat16)
            wlo = (wx2d - whi_f32).astype(jnp.bfloat16)

            def d(a, b):
                return jax.lax.dot_general(
                    a,
                    b,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT,
                )

            return d(whi, op_hi) + d(whi, op_lo) + d(wlo, op_hi)
        return jax.lax.dot_general(
            wx2d,
            operand_t,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )

    # The per-step temporaries are (SUB, W, W); the tile is processed in
    # independent row slabs to stay inside the 16 MB VMEM budget. Each slab
    # computes its own coordinates/endpoints, runs its own step loop, and
    # stores through a static ref slice — no cross-slab vector slicing or
    # concatenation (Mosaic rejects sublane slices of live vectors here).
    slab = cfg.shadow_slab_rows
    if slab == 0:
        # auto: 8-row slabs measure fastest on v5e and compile within VMEM —
        # except the strict TRAINING kernel (HIGHEST matmuls + the second
        # argmin-t* output), which exceeds the VMEM budget under current
        # toolchains; it gets 4-row slabs (0.313 s/step at batch 3 on the
        # current toolchain — re-confirmed slab 8 still fails to compile).
        strict_training = want_tstar and precision == jax.lax.Precision.HIGHEST
        slab = 4 if strict_training else 8
    sub = min(slab, tr)
    assert tr % sub == 0, (tr, sub)
    n_sub = tr // sub
    # Column-chunk width: the pixel set of one cull/processing unit is
    # (sub rows x cw columns). Tap-class (lane) extents stay the FULL image
    # width/height — a pixel's ray crosses the whole image regardless of
    # which column chunk it lives in — so vregs and MXU tiles stay filled;
    # only the matmul M extent (pixels) shrinks.
    cw = col_chunk if 0 < col_chunk < w else w
    n_chunk = w // cw

    left = -w / 2.0
    right = w - w / 2.0 - 1.0
    bottom = 1.0 - h / 2.0
    top = h / 2.0




    def hat(cls, coord):
        # max(0, 1 - |cls - coord|): the bilinear tap weights in one closed
        # form. Exactly equals the reference's floor/ceil two-tap weights for
        # non-integer coords (always the case after the -1e-4 shift), and the
        # clamp reproduces the clipped-edge taps.
        return jnp.maximum(0.0, 1.0 - jnp.abs(cls - coord[..., None]))

    ones_h = jnp.ones((h, 1), jnp.float32)

    if cfg.shadow_bias_gate == "inside_image":
        lo_x, hi_x = -cfg.half_w, cfg.img_width - cfg.half_w - 1.0
        lo_y, hi_y = 1.0 - cfg.half_h, cfg.half_h
        gate = (lx >= lo_x) & (lx <= hi_x) & (ly >= lo_y) & (ly <= hi_y)
    elif cfg.shadow_bias_gate == "wide":
        lo_x, hi_x = -4.0 * cfg.img_width, 4.0 * cfg.img_width
        lo_y, hi_y = 4.0 * (1.0 - cfg.img_height), 4.0 * cfg.img_height
        gate = (lx >= lo_x) & (lx <= hi_x) & (ly >= lo_y) & (ly <= hi_y)
    elif cfg.shadow_bias_gate == "none":
        gate = None
    else:
        raise ValueError(cfg.shadow_bias_gate)

    n_loop = ts_ref.shape[0] // step_pack

    def unit_live(k, c):
        """Scalar i32: any face in this (slab, column-chunk) cull unit?

        Group membership is computed from FIXED 8-row-aligned boundaries
        (matching shadows.cull_live_rows / cull_live_blocks), so the culled
        pixel set does not depend on slab tiling; a 4-row slab reads its
        parent group's flags. Row mode ORs per-row flags; column mode reads
        per-(group, chunk) flags at [img, g * NC + c].
        """
        lo = (k * sub // 8) * 8
        hi = -((k * sub + sub) // -8) * 8
        if col_chunk == 0:
            flag = rowany_ref[img, row0 + lo]
            for i in range(lo + 1, hi):
                flag = flag | rowany_ref[img, row0 + i]
            return flag
        g0 = (row0 + lo) // 8
        flag = rowany_ref[img, g0 * n_chunk + c]
        for gi in range(1, (hi - lo) // 8):
            flag = flag | rowany_ref[img, (g0 + gi) * n_chunk + c]
        return flag




    def machinery(cw):
        """Width-parameterized per-unit machinery.

        One instantiation per distinct unit width: `cw` (the column-chunk
        width) always; additionally the full width `w` when the dual-path
        dispatch below wants the pre-chunking schedule for dense slabs.
        Tap-class (lane) extents stay the FULL image width/height — a
        pixel's ray crosses the whole image regardless of which column
        chunk it lives in — so vregs and MXU tiles stay filled; only the
        gather matmul's M extent (pixels) shrinks with cw.
        """
        cls_wf = jax.lax.broadcasted_iota(jnp.int32, (sub, cw, w), 2).astype(jnp.float32)
        cls_hf = jax.lax.broadcasted_iota(jnp.int32, (sub, cw, h), 2).astype(jnp.float32)
        if step_pack == 2:
            # Packed-pair tap classes (loop-invariant): lanes [0, W) carry step
            # s0's x taps, [W, 2W) step s1's; the y classes repeat [0, H) four
            # times for the [b0 | m0 | b1 | m1] packed reduction layout.
            ix2 = jax.lax.broadcasted_iota(jnp.int32, (sub, cw, 2 * w), 2)
            seg_x2 = ix2 >= w
            cls_x2 = (ix2 - jnp.where(seg_x2, w, 0)).astype(jnp.float32)
            iy4 = jax.lax.broadcasted_iota(jnp.int32, (sub, cw, 4 * h), 2)
            seg_y4 = iy4 >= 2 * h
            cls_y4 = jnp.remainder(iy4, h).astype(jnp.float32)
            jsel = jax.lax.broadcasted_iota(jnp.int32, (4 * h, 1), 0)
            sel_cols = [
                ((jsel >= k * h) & (jsel < (k + 1) * h)).astype(jnp.float32)
                for k in range(4)
            ]


        def reduce_h(x3, w3, exact_products: bool):
            """sum(x3 * w3, axis=-1): (SUB, CW, H) -> (SUB, CW).

            'mxu' mode: one elementwise pass + a ones-matvec on the MXU instead
            of ~8 cross-lane VPU passes. exact_products marks 1.0 x {0,1}
            selections that are exact at any matmul precision. 'auto' (measured
            on v5e): MXU for exact products and for fast (bf16) mode; for 'high'
            a bf16x2 SPLIT matvec (prod = hi + lo, two DEFAULT passes — the MXU
            accumulates f32, so the result tracks the f32 sum to ~2^-17 relative,
            inside the tier's error budget) replaces the ~7-pass cross-lane sum;
            VPU only for strict f32 values — a HIGHEST-precision matvec costs
            more than the cross-lane sum it replaces.
            """
            mode = cfg.shadow_reduce
            prod = x3 * w3

            def matvec(a, mv_precision):
                out = jax.lax.dot_general(
                    a.reshape(sub * cw, h),
                    ones_h.astype(a.dtype),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=mv_precision,
                )
                return out.reshape(sub, cw, 1)[:, :, 0]

            if mode == "auto":
                if exact_products or precision == jax.lax.Precision.DEFAULT:
                    use = "mxu"
                elif precision == "high":
                    use = "mxu_split"
                else:
                    use = "vpu"
            else:
                use = mode
            if use == "vpu":
                return jnp.sum(prod, axis=2)
            if use == "mxu_split":
                hi_f32 = prod.astype(jnp.bfloat16).astype(jnp.float32)
                hi = hi_f32.astype(jnp.bfloat16)
                lo = (prod - hi_f32).astype(jnp.bfloat16)
                d = jax.lax.Precision.DEFAULT
                return matvec(hi, d) + matvec(lo, d)
            red_precision = (
                jax.lax.Precision.HIGHEST if precision == "high" else precision
            )
            return matvec(
                prod,
                jax.lax.Precision.DEFAULT if exact_products else red_precision,
            )


        def slab_consts(k, c=0):
            """Per-(slab, column-chunk) pixel coordinates, endpoints, BC terms."""
            rows = (
                jax.lax.broadcasted_iota(jnp.int32, (sub, cw), 0).astype(jnp.float32)
                + (row0 + k * sub).astype(jnp.float32)
            )
            cols = (
                jax.lax.broadcasted_iota(jnp.int32, (sub, cw), 1).astype(jnp.float32)
                + float(c * cw)
            )
            xx = cols - w / 2.0
            yy = h / 2.0 - rows
            depth_px = depth_tile_ref[
                0, k * sub : (k + 1) * sub, c * cw : (c + 1) * cw
            ]

            # Branchless border endpoints (reference 9-case analysis, :363-442).
            slopes = (ly - yy) / (lx - xx + _EPS)
            intercepts = ly - slopes * lx
            zx_neg = lx < left
            zx_pos = lx > right
            zx_mid = jnp.logical_not(jnp.logical_or(zx_neg, zx_pos))
            zy_neg = ly < bottom
            zy_pos = ly > top
            zy_mid = jnp.logical_not(jnp.logical_or(zy_neg, zy_pos))

            xv = jnp.where(zx_neg, left, right)
            ex_v = jnp.broadcast_to(xv, xx.shape)
            ey_v = slopes * xv + intercepts
            yh = jnp.where(zy_neg, bottom, top)
            ex_h = (yh - intercepts) / (slopes + _EPS)
            ey_h = jnp.broadcast_to(yh, yy.shape)
            inter = jnp.logical_and(ex_h >= left, ex_h <= right)
            ex_c = jnp.where(inter, ex_h, ex_v)
            ey_c = jnp.where(inter, ey_h, ey_v)
            inside = jnp.logical_and(zx_mid, zy_mid)
            ex = jnp.where(
                inside, lx, jnp.where(zy_mid, ex_v, jnp.where(zx_mid, ex_h, ex_c))
            )
            ey = jnp.where(
                inside, ly, jnp.where(zy_mid, ey_v, jnp.where(zx_mid, ey_h, ey_c))
            )
            ex = jnp.clip(ex, left, right)
            ey = jnp.clip(ey, bottom, top)

            bc_z = lz - depth_px
            consts = {
                "xx": xx,
                "yy": yy,
                "depth_px": depth_px,
                "diff_x": ex - xx,
                "diff_y": ey - yy,
                "bc_x": lx - xx,
                "bc_y": ly - yy,
                "bc_z": bc_z,
                "denom": jnp.sqrt(
                    (lx - xx) ** 2 + (ly - yy) ** 2 + bc_z * bc_z + _EPS
                ),
            }
            if refine:
                consts["tmap"] = tmap_tile_ref[
                    0, k * sub : (k + 1) * sub, c * cw : (c + 1) * cw
                ]
            return consts

        def step_t(c, s):
            """Step s's parametric offset: scalar (march) or per-pixel (refine)."""
            t = ts_ref[s, 0]
            if refine:
                t = jnp.clip(c["tmap"] + t, refine_t_range[0], refine_t_range[1])
            return t

        def sample_n2(c, t):
            """Cross-product norm^2 of one march sample for one slab."""
            xx, yy = c["xx"], c["yy"]
            sx = xx + t * c["diff_x"]
            sy = yy + t * c["diff_y"]

            # Rounded row index for the mask veto (:449-454).
            yr = jnp.clip(h / 2.0 - jnp.round(sy), 0, h - 1)

            # Bilinear coordinates, -1e-4 shifted (:457-471).
            xt = sx + w / 2.0 - _EPS
            yt = (h / 2.0 - sy) - _EPS
            xtc = jnp.clip(xt, 0.0, w - 1.0)
            ytc = jnp.clip(yt, 0.0, h - 1.0)

            # Hat x-weights -> MXU: B[p, r] = x-interpolated depth at row r.
            # (y-weights are built AFTER the gather matmuls, at their use sites:
            # hoisting the 2 MB hat_y across a matmul extends its VMEM live
            # range enough to tip the strict mode over the VMEM budget.)
            # (Idea measured and REJECTED: quantizing xtc to 1/256 px makes the
            # hat weights exactly bf16-representable — no operand rounding in
            # the fast matmul — but breaks the interpret-mode invariant that
            # the default-precision kernel is bit-identical to the reference
            # under exact arithmetic, for a fraction-of-a-dB gain on a tier
            # already 10 dB above the parity bar.)
            wx = hat(cls_wf, xtc).reshape(sub * cw, w)

            def indicator_rows(weights2d, exact: bool):
                """(P, W) weights @ indicator^T: indicator gathered per row."""
                return jax.lax.dot_general(
                    weights2d,
                    indicator_t,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    # 1.0 x {0,1} one-hot products are exact at any precision;
                    # hat-weighted gathers follow the kernel's precision mode.
                    precision=jax.lax.Precision.DEFAULT if exact else (
                        jax.lax.Precision.HIGHEST
                        if precision == "high"
                        else precision
                    ),
                ).reshape(sub, cw, h)

            def onehot_x_rows():
                # Mask veto x-gather: one-hot at the banker's-rounded x
                # (:449-454), exact at any matmul precision.
                xr = jnp.clip(jnp.round(sx) + w / 2.0, 0, w - 1)
                ind_onehot = jnp.where(
                    cls_wf == xr[..., None], 1.0, 0.0
                ).reshape(sub * cw, w)
                return indicator_rows(ind_onehot, exact=True)

            if mask_mode == "hat":
                # One widened matmul gathers depth AND the hat-interpolated
                # indicator; thresholding the indicator at 0.5 selects the
                # nearest tap's value (the taps are {0,1} and the two hat
                # weights sum to 1). The depth interp is bit-identical to
                # onehot mode (same shifted weights); the veto differs from
                # the reference's banker's-rounded gather only at samples
                # whose position lands within 1e-4 of a half-integer —
                # including the systematic exact-half hits from integer
                # pixel-to-border spans, ~0.3% of pixels on random masks
                # (see RenderConfig.shadow_mask_gather).
                bw = gather_dot(wx).reshape(sub, cw, 2 * h)
                b = bw[:, :, :h]
                d_interp = reduce_h(b, hat(cls_hf, ytc), exact_products=False)
                onehot_yr = jnp.where(cls_hf == yr[..., None], 1.0, 0.0)
                vsel = reduce_h(bw[:, :, h:], onehot_yr, exact_products=True)
                on_face = jnp.where(vsel > 0.5, 1.0, 0.0)
            elif mask_mode == "onehot":
                b = gather_dot(wx).reshape(sub, cw, h)
                d_interp = reduce_h(b, hat(cls_hf, ytc), exact_products=False)
                # Exact veto: one-hot gathers on BOTH axes (bit-matches the
                # reference's rounded-coordinate indicator lookup).
                onehot_yr = jnp.where(cls_hf == yr[..., None], 1.0, 0.0)
                on_face = reduce_h(onehot_x_rows(), onehot_yr, exact_products=True)
            elif mask_mode == "hat_y":
                # Exact one-hot x gather; the y tap is selected by REUSING the
                # depth lookup's hat_y weights (two taps summing to 1 -> the
                # >0.5 threshold picks the nearest row of the -1e-4-shifted
                # coordinate). Drops the onehot_y build: 2 fewer VPU passes
                # per step than 'onehot'. Veto differs from the reference's
                # banker's-rounded row only within 1e-4 of half-integer sample
                # rows (same knife-edge class as 'hat').
                b = gather_dot(wx).reshape(sub, cw, h)
                mrows = onehot_x_rows()
                hat_y = hat(cls_hf, ytc)
                d_interp = reduce_h(b, hat_y, exact_products=False)
                vsel = reduce_h(mrows, hat_y, exact_products=True)
                on_face = jnp.where(vsel > 0.5, 1.0, 0.0)
            elif mask_mode == "bilinear":
                # Fast-mode approximation: veto = thresholded BILINEAR interp
                # of the indicator at the shifted sample position, reusing BOTH
                # hat builds (4 fewer VPU passes per step than 'onehot'; one
                # extra hat-weighted MXU matmul). Unlike the other modes this
                # is not a nearest-corner gather: within the ~half-pixel band
                # where bilinear(indicator) crosses 0.5 on a different side
                # than the rounded-corner lookup, the veto flips. Off-face
                # regions still veto exactly (all four taps 0), on-face
                # interiors never veto (all four taps 1).
                b = gather_dot(wx).reshape(sub, cw, h)
                mrows = indicator_rows(wx, exact=False)
                hat_y = hat(cls_hf, ytc)
                d_interp = reduce_h(b, hat_y, exact_products=False)
                vsel = reduce_h(mrows, hat_y, exact_products=True)
                on_face = jnp.where(vsel > 0.5, 1.0, 0.0)
            else:
                raise ValueError(f"unknown mask_mode: {mask_mode}")

            # 3D point-to-line distance (:478-487); sample xy keeps the
            # shift. The per-pixel denominator is constant across steps and
            # sqrt is monotone, so the loop carries the raw cross-product
            # norm^2 and the final sqrt(.+eps)/denom happens once outside —
            # identical values, two fewer VPU passes per step.
            ba_x = (xt - w / 2.0) - xx
            ba_y = (h / 2.0 - yt) - yy
            ba_z = d_interp - c["depth_px"]
            cx = ba_y * c["bc_z"] - ba_z * c["bc_y"]
            cy = ba_z * c["bc_x"] - ba_x * c["bc_z"]
            cz = ba_x * c["bc_y"] - ba_y * c["bc_x"]
            n2 = cx * cx + cy * cy + cz * cz
            return jnp.where(on_face == 0.0, _OFF_FACE_N2, n2)

        def sample_pair_n2(c, t0, t1):
            """Two march samples with lane-packed builds and ONE gather matmul.

            Draft-tier turbo (shadow_step_pack=2): at the 64^2 low-res march
            every (SUB, W, W)/(SUB, W, H) tap array half-fills its (8, 128)
            vregs and MXU tiles. Packing both steps' x taps into one
            (SUB, W, 2W) hat build, both steps' y taps into one (SUB, W, 4H)
            build and gathering depth AND indicator for BOTH steps through one
            block-diagonal (2W, 4H) matmul fills them. The extra contraction
            terms are exact zeros (a step's tap lanes only meet its own
            operand rows; hat weights vanish outside [coord-1, coord+1]); the
            only numeric difference from two sample_n2 calls is f32 summation
            ORDER inside the longer dots (measured <= 6e-6 absolute in
            interpret mode, no sentinel/argmin disagreements —
            tests/test_shadows_pack.py).
            """
            xx, yy = c["xx"], c["yy"]
            per_step = []
            for t in (t0, t1):
                sx = xx + t * c["diff_x"]
                sy = yy + t * c["diff_y"]
                xt = sx + w / 2.0 - _EPS
                yt = (h / 2.0 - sy) - _EPS
                per_step.append(
                    (xt, yt, jnp.clip(xt, 0.0, w - 1.0), jnp.clip(yt, 0.0, h - 1.0))
                )
            cx2 = jnp.where(
                seg_x2, per_step[1][2][..., None], per_step[0][2][..., None]
            )
            wx2 = jnp.maximum(0.0, 1.0 - jnp.abs(cls_x2 - cx2))
            cy4 = jnp.where(
                seg_y4, per_step[1][3][..., None], per_step[0][3][..., None]
            )
            hat_y4 = jnp.maximum(0.0, 1.0 - jnp.abs(cls_y4 - cy4))
            # [b0 | m0 | b1 | m1]: one fully-packed gather for both steps.
            bw = gather_dot(wx2.reshape(sub * cw, 2 * w)).reshape(sub, cw, 4 * h)
            prod = (bw * hat_y4).reshape(sub * cw, 4 * h)

            def matvec(sel):
                out = jax.lax.dot_general(
                    prod,
                    sel,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT,
                )
                return out.reshape(sub, cw, 1)[:, :, 0]

            reduced = [matvec(s) for s in sel_cols]
            outs = []
            for k, (xt, yt, _xtc, _ytc) in enumerate(per_step):
                d_interp = reduced[2 * k]
                on_face = jnp.where(reduced[2 * k + 1] > 0.5, 1.0, 0.0)
                ba_x = (xt - w / 2.0) - xx
                ba_y = (h / 2.0 - yt) - yy
                ba_z = d_interp - c["depth_px"]
                ccx = ba_y * c["bc_z"] - ba_z * c["bc_y"]
                ccy = ba_z * c["bc_x"] - ba_x * c["bc_z"]
                ccz = ba_x * c["bc_y"] - ba_y * c["bc_x"]
                n2 = ccx * ccx + ccy * ccy + ccz * ccz
                outs.append(jnp.where(on_face == 0.0, _OFF_FACE_N2, n2))
            return outs

        def step_samples(c, i):
            """Loop iteration i's [(sample index, norm^2)] under the pack."""
            if step_pack == 1:
                return [(i, sample_n2(c, step_t(c, i)))]
            return list(
                zip(
                    (2 * i, 2 * i + 1),
                    sample_pair_n2(c, ts_ref[2 * i, 0], ts_ref[2 * i + 1, 0]),
                )
            )

        def store_slab(k, c, min_n2, s_star, denom, live=None):
            min_d = jnp.sqrt(min_n2 + _EPS) / denom
            # Off-face sentinel: reproduce the exact 1e6 constant (:490).
            min_d = jnp.where(min_n2 >= _OFF_FACE_N2, _OFF_FACE, min_d)
            if live is not None:
                # Culled unit: the all-vetoed sentinel, independent of whether
                # the step loop was skipped (trip count 0) or ran (interleave
                # mode only forces outputs).
                min_d = jnp.where(live > 0, min_d, _OFF_FACE)
                if s_star is not None:
                    s_star = jnp.where(live > 0, s_star, 0)
            if gate is not None:
                min_d = min_d + jnp.where(gate, cfg.shadow_bias, 0.0).astype(
                    min_d.dtype
                )
            out_ref[0, k * sub : (k + 1) * sub, c * cw : (c + 1) * cw] = min_d
            if tstar_ref is not None:
                tstar_ref[
                    0, k * sub : (k + 1) * sub, c * cw : (c + 1) * cw
                ] = s_star

        # The argmin carry is the compact int32 SAMPLE INDEX, not the f32 t value
        # (the wrapper looks t up in the sample_ts table afterwards — exact, the
        # stored t is the identical f32 constant). The int chain (iota compare +
        # select) is also cheaper for Mosaic to schedule than carrying a second
        # f32 plane through the min loop.
        init_min = jnp.full((sub, cw), jnp.inf, jnp.float32)
        init_t = jnp.zeros((sub, cw), jnp.int32)

        def run_and_store(k, c):
            cst = slab_consts(k, c)

            def step(i, carry):
                for sidx, n2 in step_samples(cst, i):
                    if tstar_ref is None:
                        carry = jnp.minimum(carry, n2)
                    else:
                        min_acc, sbest = carry
                        carry = (
                            jnp.minimum(min_acc, n2),
                            jnp.where(n2 < min_acc, sidx, sbest),
                        )
                return carry

            init = init_min if tstar_ref is None else (init_min, init_t)
            final = jax.lax.fori_loop(0, n_loop, step, init, unroll=unroll)
            if tstar_ref is None:
                store_slab(k, c, final, None, cst["denom"])
            else:
                store_slab(k, c, final[0], final[1], cst["denom"])

        def store_sentinel(k, c):
            # init carry (inf / index 0) -> store_slab's sentinel
            # substitution emits the all-vetoed 1e6 (+ gate bias).
            cst = slab_consts(k, c)
            if tstar_ref is None:
                store_slab(k, c, init_min, None, cst["denom"])
            else:
                store_slab(k, c, init_min, init_t, cst["denom"])

        return types.SimpleNamespace(
            slab_consts=slab_consts,
            step_samples=step_samples,
            store_slab=store_slab,
            init_min=init_min,
            init_t=init_t,
            run_and_store=run_and_store,
            store_sentinel=store_sentinel,
        )

    # ---------------- dispatch over (row slab, column chunk) units --------
    M = machinery(cw)

    if cfg.shadow_slab_interleave and n_sub > 1:
        # All slabs advance inside ONE step loop: the per-slab dependency
        # chains (build -> matmul -> reduce -> chain) are independent, so
        # Mosaic can overlap one slab's VPU builds with another's MXU work.
        # The shared loop marches FULL-width rows (chunking buys nothing
        # here — culled units cannot skip a shared loop); with column
        # culling only the forced-sentinel granularity changes, via a
        # per-lane liveness mask built from the block flags.
        MF = M if n_chunk == 1 else machinery(w)
        consts = [MF.slab_consts(k, 0) for k in range(n_sub)]

        def step_all(i, carry):
            out = []
            for k in range(n_sub):
                acc = carry[k]
                for sidx, n2 in MF.step_samples(consts[k], i):
                    if tstar_ref is None:
                        acc = jnp.minimum(acc, n2)
                    else:
                        min_acc, sbest = acc
                        acc = (jnp.minimum(min_acc, n2),
                               jnp.where(n2 < min_acc, sidx, sbest))
                out.append(acc)
            return tuple(out)

        init = tuple(
            MF.init_min if tstar_ref is None else (MF.init_min, MF.init_t)
            for _ in range(n_sub)
        )
        finals = jax.lax.fori_loop(0, n_loop, step_all, init,
                                   unroll=unroll)

        def slab_live_mask(k):
            """(SUB, W) i32: per-pixel block liveness for forced stores."""
            lane_chunk = (
                jax.lax.broadcasted_iota(jnp.int32, (sub, w), 1) // cw
            )
            m = jnp.zeros((sub, w), jnp.int32)
            for c in range(n_chunk):
                m = jnp.where(lane_chunk == c, unit_live(k, c), m)
            return m

        for k in range(n_sub):
            if not cull:
                live = None
            elif n_chunk == 1:
                live = unit_live(k, 0)
            else:
                live = slab_live_mask(k)
            if tstar_ref is None:
                MF.store_slab(k, 0, finals[k], None, consts[k]["denom"],
                              live)
            else:
                MF.store_slab(
                    k, 0, finals[k][0], finals[k][1], consts[k]["denom"],
                    live,
                )
    else:
        # Dual path: dense slabs (every chunk live — e.g. random masks, or
        # interior face rows with no margin) run the PRE-CHUNKING full-width
        # schedule, so the column cull costs exactly zero when it cannot
        # fire; slabs with at least one dead block run per-chunk loops and
        # skip the dead ones. All pl.when predicates are flat scalars (no
        # nesting) with disjoint store slices.
        dual = cull and n_chunk > 1
        MF = machinery(w) if dual else None
        for k in range(n_sub):
            if not cull:
                for c in range(n_chunk):
                    M.run_and_store(k, c)
                continue
            if not dual:
                live = unit_live(k, 0)
                pl.when(live > 0)(functools.partial(M.run_and_store, k, 0))
                pl.when(live == 0)(
                    functools.partial(M.store_sentinel, k, 0)
                )
                continue
            flags = [unit_live(k, c) for c in range(n_chunk)]
            all_live = flags[0]
            for f in flags[1:]:
                all_live = all_live & f
            dense = all_live > 0
            pl.when(dense)(functools.partial(MF.run_and_store, k, 0))
            for c, f in enumerate(flags):
                pl.when(jnp.logical_and(jnp.logical_not(dense), f > 0))(
                    functools.partial(M.run_and_store, k, c)
                )
                pl.when(jnp.logical_and(jnp.logical_not(dense), f == 0))(
                    functools.partial(M.store_sentinel, k, c)
                )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def ray_march_min_distance_pallas_vjp(
    depth: Array, mask: Array, light_point: Array, cfg: RenderConfig
) -> Array:
    """Differentiable wrapper: Pallas forward, pure-JAX-recompute backward.

    The reference march is differentiable through depth (bilinear samples,
    min-selection, BC z-term) and the light point; torch backprops through the
    same graph. Pallas kernels have no AD rule, so the VJP recomputes the
    march with ops/shadows (whose XLA gathers transpose to scatters) — exact
    gradients, used by the training path. The forward stays fused.
    """
    return ray_march_min_distance_pallas(depth, mask, light_point, cfg)


def _vjp_fwd(depth, mask, light_point, cfg):
    out, t_star = ray_march_min_distance_pallas(
        depth, mask, light_point, cfg, return_argmin_t=True
    )
    return out, (depth, mask, light_point, t_star)


def _vjp_bwd(cfg, residuals, g):
    # d(min_s f_s)/dx = d f_{s*}/dx: differentiate ONLY the winning sample
    # (t* recorded by the forward kernel) — 1/num_sample_points of the
    # march's work, exact a.e. (ties are measure-zero). The chain through
    # the border endpoints (light gradient) is included, matching the
    # reference autograd. The evaluator is the matmul (gather-free) form,
    # whose depth-gradient transposes to a matmul rather than an XLA
    # scatter — the fast path on TPU.
    depth, mask, light_point, t_star = residuals

    # Escape hatch for on-chip A/B measurement: the gather/scatter form.
    if os.environ.get("GCFR_SHADOW_BWD") == "gather":
        evaluator = shadows_ref.sample_distance_at
    else:
        import functools as _ft

        evaluator = _ft.partial(
            shadows_ref.sample_distance_at_matmul,
            precision=(
                jax.lax.Precision.DEFAULT
                if cfg.shadow_matmul_precision == "default"
                else jax.lax.Precision.HIGHEST
            ),
        )

    def winning_distance(d, l):
        return jax.vmap(
            lambda dd, mm, ll, tt: evaluator(dd, mm, ll, tt, cfg)
        )(d, mask, l, t_star)

    _, pullback = jax.vjp(winning_distance, depth, light_point)
    d_depth, d_light = pullback(g)
    return d_depth, jnp.zeros_like(mask), d_light


ray_march_min_distance_pallas_vjp.defvjp(_vjp_fwd, _vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def ray_march_min_distance_pallas_vjp_sp(
    depth: Array,
    mask: Array,
    light_point: Array,
    cfg: RenderConfig,
    axis_name: str,
    ts_local: Array,
) -> Array:
    """Sample-sharded differentiable march for multi-chip TRAINING.

    Inside a shard_map whose `axis_name` axis shards the sample grid, each
    device marches its `ts_local` slice; the forward combines partial min
    distances with pmin (exact — f32 min is associative). The backward's
    winning offset t* combines with first-global-winner semantics: among
    devices achieving the global min, the SMALLEST t wins, which equals the
    reference's torch.min first-index tie-break PROVIDED the devices hold
    contiguous increasing slices of sample_ts(cfg) (how train.py and
    infer.py slice them). The backward itself then runs replicated (same
    residuals on every device), so gradients are identical across the
    sample axis with no further collective.
    """
    out, _ = _vjp_fwd_sp(depth, mask, light_point, cfg, axis_name, ts_local)
    return out


def _vjp_fwd_sp(depth, mask, light_point, cfg, axis_name, ts_local):
    # Same path dispatch as render(): the Pallas kernel on TPU, the pure-XLA
    # march elsewhere (CPU mesh tests); both emit first-winner t*.
    if cfg.use_pallas_shadows and shadows_ref.on_tpu():
        local_min, t_star_local = ray_march_min_distance_pallas(
            depth, mask, light_point, cfg, return_argmin_t=True, ts=ts_local
        )
    else:
        local_min, t_star_local = shadows_ref.ray_march_min_distance_batch(
            depth, mask, light_point, cfg, ts=ts_local, return_argmin_t=True
        )
    global_min = jax.lax.pmin(local_min, axis_name)
    # Devices not achieving the global min are strictly greater (the pmin
    # result IS one of the local values, so the equality test is exact).
    t_candidate = jnp.where(local_min == global_min, t_star_local, jnp.inf)
    t_star = jax.lax.pmin(t_candidate, axis_name)
    return global_min, (depth, mask, light_point, t_star, ts_local)


def _vjp_bwd_sp(cfg, axis_name, residuals, g):
    # The cotangent g and every residual are replicated across the sample
    # axis (the forward output is post-pmin), so the single-winning-sample
    # backward runs identically on every device — reuse the single-device
    # rule and emit a zero cotangent for the (non-differentiated) ts slice.
    depth, mask, light_point, t_star, ts_local = residuals
    d_depth, d_mask, d_light = _vjp_bwd(
        cfg, (depth, mask, light_point, t_star), g
    )
    return d_depth, d_mask, d_light, jnp.zeros_like(ts_local)


ray_march_min_distance_pallas_vjp_sp.defvjp(_vjp_fwd_sp, _vjp_bwd_sp)


def ray_march_min_distance_pallas(
    depth: Array,
    mask: Array,
    light_point: Array,
    cfg: RenderConfig,
    tile_rows: int | None = None,
    interpret: bool = False,
    return_argmin_t: bool = False,
    ts=None,
):
    """(B,H,W), (B,H,W), (B,3) -> (B,H,W) min distances, fused on TPU.

    With return_argmin_t also returns the winning parametric offset t* per
    pixel (used by the backward pass).

    `ts` optionally overrides the sample offsets (1-D f32, any static
    length, values may be traced). The sample-parallel mesh path gives each
    device a slice of sample_ts(cfg) and pmin-combines the partial min
    distances — exact, since f32 min is associative. With return_argmin_t
    the returned index addresses the GIVEN ts array, not sample_ts(cfg)."""
    return _march_pallas_call(
        depth, mask, light_point, cfg, tile_rows, interpret,
        return_argmin_t, ts, tmap=None,
    )


def refine_min_distance_pallas(
    depth: Array,
    mask: Array,
    light_point: Array,
    t_map: Array,
    cfg: RenderConfig,
    offsets=None,
    tile_rows: int | None = None,
    interpret: bool = False,
) -> Array:
    """Fused draft-tier boundary refine: per-pixel windowed re-march.

    Same kernel machinery as the march, but each step evaluates the
    PER-PIXEL offset clip(t_map + offsets[s], t range) instead of a shared
    scalar — the hat builds and veto are per-pixel already, so only the t
    broadcast changes. t_map is the NN-upsampled low-res argmin t*
    (ops/shadows.upsample_tstar_nn); semantics match
    ops/shadows.refine_min_distance_batch. `offsets` (1-D f32, may be
    traced) overrides the [-k, k]*t_step window for the sample-parallel
    pmin combine.
    """
    if offsets is None:
        offsets = shadows_ref.refine_offsets(cfg)
    return _march_pallas_call(
        depth, mask, light_point, cfg, tile_rows, interpret,
        False, offsets, tmap=t_map,
    )


def _march_pallas_call(
    depth: Array,
    mask: Array,
    light_point: Array,
    cfg: RenderConfig,
    tile_rows: int | None,
    interpret: bool,
    return_argmin_t: bool,
    ts,
    tmap: Array | None,
):
    b, h, w = depth.shape
    assert (h, w) == (cfg.img_height, cfg.img_width), (depth.shape, cfg)
    if tile_rows is None:
        tile_rows = min(cfg.shadow_tile_rows, h)
    assert h % tile_rows == 0
    n_tiles = h // tile_rows

    if ts is None:
        ts = shadows_ref.sample_ts(cfg).astype(np.float32)
    # Pad the step grid to a sublane multiple (odd SMEM extents crash the
    # compiler); duplicated trailing offsets cannot change the running min
    # (nor the argmin index: the strict `<` keeps the first winner).
    pad = (-ts.shape[0]) % 8
    if pad:
        xp = np if isinstance(ts, np.ndarray) else jnp
        ts = xp.concatenate([ts, xp.repeat(ts[-1:], pad)])
    ts = jnp.asarray(ts, jnp.float32).reshape(-1, 1)
    depth = depth.astype(jnp.float32)
    depth_t = jnp.swapaxes(depth, -1, -2)
    indicator_t = jnp.swapaxes((mask != 0).astype(jnp.float32), -1, -2)
    light2d = light_point.astype(jnp.float32).reshape(b, 3)

    # Mosaic's block pipeline prefetches the next batch block; at batch 1 the
    # lookahead slice overruns the operand (observed XLA Array::Slice check
    # failure). Pad the batched inputs with one dummy image; the grid still
    # only visits the real batch.
    def pad_batch(x):
        return jnp.concatenate([x, jnp.zeros_like(x[:1])], axis=0)

    depth_t = pad_batch(depth_t)
    depth_in = pad_batch(depth)
    indicator_t = pad_batch(indicator_t)
    light2d = jnp.concatenate([light2d, jnp.zeros((1, 3), jnp.float32)], axis=0)

    cull = bool(cfg.shadow_mask_cull)
    # Effective column-chunk width: values >= W degrade to the row cull
    # (one chunk per slab — the kernel's unit grid is then identical to the
    # pre-column-cull one, e.g. the draft tier's 64-wide low-res march at
    # the default chunk 64).
    col_chunk = (
        cfg.shadow_col_chunk if 0 < cfg.shadow_col_chunk < w else 0
    )
    rowany_in = None
    if cull:
        if tile_rows % 8:
            raise ValueError(
                "shadow_mask_cull needs 8-row-aligned tiles "
                f"(tile_rows={tile_rows})"
            )
        hpad = (-h) % 8
        if col_chunk:
            # Per-(8-row-group, column-chunk) any-face flags, flat
            # (B, G * NC) i32 in SMEM (one read per unit per parent group).
            on = mask != 0
            if hpad:
                on = jnp.concatenate(
                    [on, jnp.zeros((b, hpad, w), on.dtype)], axis=1
                )
            block_any = on.reshape(
                b, -1, 8, w // col_chunk, col_chunk
            ).any(axis=(2, 4))
            rowany_in = pad_batch(
                block_any.reshape(b, -1).astype(jnp.int32)
            )
        else:
            # Per-row any-face flags, 8-padded so the kernel's group reads
            # stay in bounds; i32 scalars in SMEM (one OR-tree per slab).
            row_any = (mask != 0).any(axis=2)
            if hpad:
                row_any = jnp.concatenate(
                    [row_any, jnp.zeros((b, hpad), row_any.dtype)], axis=1
                )
            rowany_in = pad_batch(row_any.astype(jnp.int32))

    precision = {
        "highest": jax.lax.Precision.HIGHEST,
        "high": "high",  # manual bf16x3 split inside the kernel
        "default": jax.lax.Precision.DEFAULT,
    }[cfg.shadow_matmul_precision]
    mask_mode = cfg.shadow_mask_gather
    if mask_mode == "auto":
        # Strict/high precision keep the exact two-axis one-hot veto. The
        # fast (bf16) serving mode reuses both hat builds for the veto
        # ('bilinear'): the march is VPU-build-bound and this drops 4 of
        # ~14 per-step VPU passes. Measured on v5e (batch 16, 256^2, 160
        # samples): onehot 49.5 ms/img, hat_y 44.7, bilinear 38.3; golden
        # 00104 parity 50.3 / 50.2 / 50.1 dB respectively — the boundary-
        # band veto flips are invisible next to the fast mode's own bf16
        # interp noise. 'hat'/'hat_y' remain opt-in (measured for 'high':
        # hat_y's bf16-threshold veto deviates on ~0.2% of pixels — far
        # outside that tier's parity budget, so it stays fast-mode-only).
        mask_mode = (
            "bilinear" if precision == jax.lax.Precision.DEFAULT else "onehot"
        )
    if mask_mode not in ("onehot", "hat", "hat_y", "bilinear"):
        raise ValueError(f"unknown shadow_mask_gather: {mask_mode}")
    mask_hat = mask_mode == "hat"
    # The refine window is a handful of full-resolution steps (lanes already
    # packed, odd step counts common) — keep it unpacked.
    step_pack = cfg.shadow_step_pack if tmap is None else 1
    if step_pack == 2:
        if mask_mode != "bilinear":
            raise ValueError(
                "shadow_step_pack=2 packs the bilinear-veto dataflow; "
                f"resolved mask gather is {mask_mode!r} (use the fast/draft "
                "precision modes)"
            )
        if precision != jax.lax.Precision.DEFAULT:
            raise ValueError(
                "shadow_step_pack=2 is a fast-mode (bf16 matmul) packing; "
                f"shadow_matmul_precision resolved to {precision!r}"
            )
    if tmap is not None:
        assert not return_argmin_t, "refine emits no argmin"
        full_ts = shadows_ref.sample_ts(cfg)
        refine_t_range = (float(full_ts[0]), float(full_ts[-1]))
    else:
        refine_t_range = None
    kernel = functools.partial(
        _march_kernel,
        cfg=cfg,
        tile_rows=tile_rows,
        precision=precision,
        unroll=cfg.shadow_unroll,
        mask_mode=mask_mode,
        want_tstar=return_argmin_t,
        cull=cull,
        refine_t_range=refine_t_range,
        step_pack=step_pack,
        col_chunk=col_chunk,
    )

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    tile_block = pl.BlockSpec(
        (1, tile_rows, w), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
    )
    if step_pack == 2:
        # Block-diagonal pair operand: rows [0, W) serve step s0's taps with
        # [depth^T | indicator^T] in its output half, rows [W, 2W) serve
        # step s1's in the other half. The zero blocks are exact at any
        # matmul precision, so the packed gather is bit-identical to two
        # separate ones in exact arithmetic.
        zd = jnp.zeros_like(depth_t)
        zi = jnp.zeros_like(indicator_t)
        operand_t = jnp.concatenate(
            [
                jnp.concatenate([depth_t, indicator_t, zd, zi], axis=-1),
                jnp.concatenate([zd, zi, depth_t, indicator_t], axis=-1),
            ],
            axis=-2,
        )  # (B, 2W, 4H)
        inputs = [jnp.asarray(ts), light2d, operand_t, depth_in]
        in_specs = [
            smem,
            smem,
            pl.BlockSpec((1, 2 * w, 4 * h), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            tile_block,
        ]
    elif mask_hat:
        # Widened operand: the single hat matmul gathers depth and indicator.
        operand_t = jnp.concatenate([depth_t, indicator_t], axis=-1)  # (B, W, 2H)
        inputs = [jnp.asarray(ts), light2d, operand_t, depth_in]
        in_specs = [
            smem,
            smem,
            pl.BlockSpec((1, w, 2 * h), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            tile_block,
        ]
    else:
        inputs = [jnp.asarray(ts), light2d, depth_t, depth_in, indicator_t]
        in_specs = [
            smem,
            smem,
            pl.BlockSpec((1, w, h), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            tile_block,
            pl.BlockSpec((1, w, h), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ]
    if tmap is not None:
        # Per-pixel t centres ride the same tile pipeline as the depth rows
        # (slot right after depth_in — the kernel pops refs in this order).
        inputs.insert(4, pad_batch(tmap.astype(jnp.float32)))
        in_specs.insert(4, tile_block)
    if cull:
        inputs.insert(2, rowany_in)
        in_specs.insert(2, smem)

    # The argmin offset t* is only produced for the training path; inference
    # skips its carry/select/store entirely. The kernel emits the compact
    # int32 sample INDEX; the f32 t value is recovered here from the sample
    # table (exact — the same f32 constant the kernel read from SMEM).
    out_shapes = [jax.ShapeDtypeStruct((b + 1, h, w), jnp.float32)]
    if return_argmin_t:
        out_shapes.append(jax.ShapeDtypeStruct((b + 1, h, w), jnp.int32))
    # Outputs are padded by one image as well (same pipeline-lookahead
    # workaround as the inputs); the grid never visits the pad.
    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shapes),
        grid=(b, n_tiles),
        in_specs=in_specs,
        out_specs=tuple(tile_block for _ in range(len(out_shapes))),
        interpret=interpret,
        # Mosaic's default scoped-VMEM cap is a conservative 16 MB; the
        # strict+argmin kernel at 8-row slabs needs ~17.2 MB of scoped
        # stack (HIGHEST-precision matmul operand expansions), well within
        # v5e's physical 128 MB VMEM. Grid cells are independent
        # (batch x row-tiles), so both dimensions are parallel.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
            dimension_semantics=("parallel", "parallel"),
        ),
    )(*inputs)
    if return_argmin_t:
        t_star = jnp.asarray(ts[:, 0])[outs[1][:b]]
        return outs[0][:b], t_star
    return outs[0][:b]
