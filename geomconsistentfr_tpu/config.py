"""Single source of truth for every behavioural constant of the framework.

The reference hard-codes these constants inline in five monolithic scripts; this
module lifts them into frozen (hashable, jit-static-arg friendly) dataclasses and
provides one preset per reference entry point.

Reference provenance (paths relative to the reference repo):
  * image size / lr / intensities / distances / sample counts:
      test_relight_single_image.py:15-22,
      test_relight_single_image_lighting_transfer.py:15-22
  * depth offset for normals: test_relight_single_image.py:326 (+1610) vs
      test_relight_single_image_lighting_transfer.py:325 (+1410)
  * focal length: test_relight_single_image.py:570 (1570) vs
      test_relight_single_image_lighting_transfer.py:530 (700)
  * ambient handling: test_relight_single_image.py:342 (est-0.1),
      test_raytracing_relighting_CelebAHQ_DSSIM_8x.py:341-342 (est),
      test_relight_single_image_lighting_transfer.py:348 (target arg),
      train_*.py:367 (est)
  * lighting source: train_*.py:357-364 (self-estimated, z clamped >= 0),
      test scripts (external target); transfer test additionally returns the
      estimate with z clamped >= 0.16 (test_..._lighting_transfer.py:332-334)
  * +5.0 shadow "kill switch": test_relight_single_image.py:495-496
      (light inside image) vs test_..._lighting_transfer.py:503-504 (4x bounds);
      absent in both train scripts
  * training shape: train_raytracing_relighting_CelebAHQ_DSSIM_8x.py:41-49,579-580
  * loss weights: train_raytracing_relighting_CelebAHQ_DSSIM_8x.py:621-645
  * skip-connection gate epochs: train_*.py:245-284 region (epoch > 8/10/12/14)
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

# ---------------------------------------------------------------------------
# Renderer
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Differentiable renderer constants (Lambertian shading + ray-marched shadows)."""

    img_height: int = 256
    img_width: int = 256

    # Lambertian term.
    directional_intensity: float = 0.5    # 0.41 for the lighting-transfer test
    light_distance: float = 4013.0

    # Ray-march sampling: t in [t_start, t_stop) with step t_step.
    num_sample_points: int = 160          # 159 for the lighting-transfer test
    t_start: float = 0.025                # 0.03 for the lighting-transfer test
    t_stop: float = 0.825
    t_step: float = 0.005

    # Depth head output is multiplied by this ("allow network to estimate
    # smaller values", train_*.py:349-350).
    depth_scale: float = 100.0
    # Offset added to depth before surface-normal estimation.
    depth_offset: float = 1610.0          # 1410 for the lighting-transfer test

    # Camera intrinsics (principal point is the image centre).
    focal_length: float = 1570.0          # 700 for the lighting-transfer test

    # Where the ambient intensity comes from:
    #   'estimated'            SL head output channel 0
    #   'estimated_minus_0.1'  SL head output channel 0 minus 0.1
    #   'target'               caller-provided target ambient argument
    ambient_mode: str = "estimated"

    # Where the rendering light direction comes from:
    #   'target'          caller-provided target light direction
    #   'self_estimated'  SL head output channels 1:4 (z clamped at z_clamp_min)
    lighting_mode: str = "target"

    # Clamp applied to the *estimated* light z component before normalisation.
    # train scripts clamp at 0.0; the transfer test clamps its returned estimate
    # at 0.16 (it renders with the target light, so the clamp only affects the
    # estimate handed to pass 2).
    z_clamp_min: float = 0.0

    # The "+5.0 to min distance" shadow kill switch.
    #   'none'          (training)
    #   'inside_image'  light xy inside [-W/2, W/2-1] x [1-H/2, H/2]
    #   'wide'          light xy inside [-4W, 4W] x [4(1-H), 4H]
    shadow_bias_gate: str = "none"
    shadow_bias: float = 5.0

    # Number of ray-march steps evaluated per lax.scan iteration in the pure-JAX
    # path (performance knob only; does not change semantics).
    march_chunk: int = 32

    # Use the fused Pallas kernel for the shadow march when running on TPU.
    use_pallas_shadows: bool = True

    # MXU precision inside the Pallas shadow kernel's gather-matmuls:
    # 'highest' = true float32 (bit-close parity), 'high' = manual bf16x3
    # split (~2^-18 relative error, ~half the strict cost; Mosaic has no
    # lax.Precision.HIGH so the kernel splits operands itself), 'default' =
    # fast single-pass bf16 (~1e-3 relative depth-sample error; shadow
    # weights saturate, so the rendered-image impact is far below the
    # 40 dB north-star budget).
    shadow_matmul_precision: str = "highest"

    # Pallas shadow kernel tiling (performance knobs only; semantics fixed):
    # rows of the image per grid cell, and rows per in-kernel slab (the
    # (slab*W, W) gather-matmul's M extent is slab_rows*W — larger slabs mean
    # fewer, bigger matmuls but more live VMEM). slab_rows=0 selects
    # automatically (8, the largest that compiles within VMEM on v5e).
    shadow_tile_rows: int = 8
    shadow_slab_rows: int = 0

    # Unroll factor of the in-kernel march step loop (perf knob only).
    shadow_unroll: int = 1

    # Advance all row slabs inside one step loop (independent dependency
    # chains per iteration -> more VPU/MXU overlap) instead of finishing
    # each slab's loop before the next. Perf knob only; bit-identical.
    shadow_slab_interleave: bool = False

    # March steps fused per kernel loop iteration (1 or 2). At 2, both
    # steps' x-tap hat builds share one (SUB, W, 2W)-lane array, both
    # steps' y-taps share one (SUB, W, 4H) array, and ONE block-diagonal
    # matmul (2W, 4H operand = [[depth^T|ind^T|0|0],[0|0|depth^T|ind^T]])
    # gathers depth AND indicator for BOTH steps. Pure lane-packing for
    # sub-128-wide marches (the draft tier's 64^2 low-res march half-fills
    # every (8,128) vreg and MXU tile; pack=2 fills them). The extra
    # contraction terms are exact zeros; the only numeric difference from
    # pack=1 is f32 summation order in the longer dots (<= 6e-6 absolute
    # measured in interpret mode, no sentinel/argmin disagreements).
    # Requires the 'bilinear' mask gather (the fast/draft mode). 1
    # everywhere except the draft tier once qualified on chip.
    shadow_step_pack: int = 1

    # How the kernel gathers the face-mask veto per march sample:
    #   'onehot'   exact one-hot matmuls on both axes at the banker's-rounded
    #              coordinate (bit-matches the reference veto);
    #   'hat'      reuse the depth lookup's hat weights on a widened
    #              [depth | indicator] operand and threshold the interpolated
    #              indicator at 0.5 — one matmul instead of two and two fewer
    #              VPU builds per step. Selects the nearest x tap of the
    #              -1e-4-shifted coordinate, which can differ from the
    #              reference's rounded coordinate within 1e-4 of half-integer
    #              sample positions (measure-zero band; fast-mode only).
    #   'hat_y'    exact one-hot x gather; the y tap reuses the depth
    #              lookup's hat_y weights (threshold 0.5 = nearest row of the
    #              shifted coordinate). Two fewer VPU builds per step than
    #              'onehot' with the same knife-edge-only deviation as 'hat'.
    #   'bilinear' threshold the full BILINEAR-interpolated indicator at 0.5,
    #              reusing both hat builds (four fewer VPU passes per step,
    #              one extra hat matmul). NOT a nearest-corner gather: the
    #              veto can flip inside the half-pixel band along the mask
    #              boundary (measured: no visible golden-parity impact,
    #              50.1 dB vs the exact fast path's 50.3 dB on 00104).
    #   'auto'     'onehot' for strict/high precision (exactness first);
    #              'bilinear' for the fast bf16 mode (the march is VPU-
    #              build-bound; v5e: 49.5 -> 38.3 ms/img, TODO.md).
    shadow_mask_gather: str = "auto"

    # How the kernel's per-step (SUB, W, H) -> (SUB, W) weighted reductions
    # run: 'vpu' = lane-axis jnp.sum (~8 cross-lane passes), 'mxu' = ones-
    # vector matvec on the MXU (one elementwise pass + a nearly-free
    # matmul; bit-identical in f32, used at HIGHEST precision in strict
    # mode). 'auto' picks the faster measured option per tier: MXU for
    # exact {0,1} products and for fast bf16 mode, VPU for strict (a
    # HIGHEST matvec costs more than the cross-lane sum), and for 'high' a
    # bf16x2-split matvec (prod = hi + lo, two DEFAULT passes, f32 MXU
    # accumulation -> ~2^-17 relative error, inside that tier's budget).
    shadow_reduce: str = "auto"

    # Mask-aware march culling: 8-row-aligned pixel groups whose face mask
    # is entirely zero skip the march and store the all-vetoed sentinel
    # (1e6, plus the gate bias where gated) instead. EXACT for every
    # reference-visible surface — the eval dump multiplies all six outputs
    # by the mask (test_raytracing_...py:601-608), the single-image test
    # pastes through the mask, training losses are mask-normalised and the
    # composite discards off-face renders — because culled pixels are a
    # subset of mask==0 pixels and their loss cotangents are exactly zero.
    # Only the RAW min-distance/shadow-weight arrays change, at pixels
    # whose whole 8-row group is off-face (their rays can cross the face,
    # so the uncull'd march may assign them a real distance nothing ever
    # consumes). The precision tiers enable this; the bare default stays
    # off so raw arrays match the reference everywhere.
    shadow_mask_cull: bool = False

    # Column-aware cull granularity (lane-dimension extension of
    # shadow_mask_cull; no effect unless the cull is on). With a chunk
    # width C > 0, the cull unit shrinks from a full 8-row group to an
    # (8-row x C-column) block: the kernel processes each slab as
    # independent C-wide column chunks, and chunks whose block is entirely
    # off-face skip the march (same exactness argument — culled pixels are
    # a subset of mask==0 pixels, which nothing reference-visible ever
    # reads). On the bundled FFHQ face masks the left/right margins inside
    # on-face row bands are ~25-30% of all blocks at C=64 — work the row
    # cull cannot skip. The per-step temporaries become (SUB, C, W)-shaped:
    # the lane (tap-class) axis stays full, so vregs and MXU tiles stay
    # filled; only the matmul M extent shrinks. 0 = row-granular cull
    # (the pre-round-5 behaviour). Values >= img_width degrade to 0.
    shadow_col_chunk: int = 0

    # Draft-mode shadow march resolution divisor (serving turbo; the 'draft'
    # precision tier sets 2). The march runs on an s x s mean-pooled depth
    # map with depth, light and the pixel grid all scaled by 1/s, and the
    # min-distance field is bilinearly upsampled and multiplied back by s.
    # The scene-scaling identity is exact (shrinking every coordinate by 1/s
    # shrinks every point-to-line distance by exactly 1/s); the only
    # approximation is the spatial sampling of the depth/mask fields
    # (occluder edges move by <= s/2 px) and the interpolation of the
    # min-distance field across shadow boundaries. 1 = reference-exact
    # semantics (strict/high/fast tiers). Deviates from the reference by
    # construction — never used by training or the parity-certification
    # suite.
    shadow_resolution_scale: int = 1

    # Draft-mode boundary refine: with shadow_resolution_scale > 1 and a
    # halfwidth k > 0, the low-resolution march also records its argmin
    # offset t* per pixel; t* is nearest-neighbour-upsampled (NEVER
    # bilinearly — t* is discontinuous across shadow boundaries, and
    # averaging it centres the window where no occluder is: measured
    # 39.2 dB vs 52.2 dB visible on the corner-light fixture) and the
    # min distance is re-evaluated at FULL resolution over the 2k offsets
    # t* + j*t_step, j in [-k, k-1] (pad-free in the 8-step-aligned
    # kernel; the dropped +k edge costs < 0.01 dB). Cost
    # ~ 2k/num_sample_points of a full-resolution march; fixes the
    # half-resolution shadow-boundary placement, which is where ~90% of
    # the draft tier's visible error lives. 0 = plain bilinear upsample of
    # the min-distance field (no refine).
    shadow_refine_halfwidth: int = 0

    # Low-resolution march t-grid stride (draft mode only, needs the
    # boundary refine): with stride r > 1 the LOW-RES march samples every
    # r-th offset of the reference t grid (t_step * r, ~num_sample_points/r
    # steps) while the full-resolution refine window keeps the exact t_step
    # — the strided argmin t* errs by at most t_step*r/2, which the
    # halfwidth-k window re-searches as long as k >= r (the shipping k=4
    # covers r<=4 with margin). Cuts the low-res march cost ~r-fold; the
    # refine and everything downstream are unchanged. 1 = the full grid.
    shadow_lowres_t_stride: int = 1

    def __post_init__(self):
        # The shadow kernels' one-hot mask veto matches round(s) + half_w
        # against integer column indices, which is only exact when half_w /
        # half_h are integral; odd sizes would silently veto every sample
        # (constant 1e6 distance, zero gradient) instead of erroring. The
        # reference's int-cast gather form does not share this constraint,
        # so reject odd sizes loudly here.
        if self.img_height % 2 or self.img_width % 2:
            raise ValueError(
                "img_height and img_width must be even (the shadow veto "
                f"needs integral half-extents); got {self.img_height}x"
                f"{self.img_width}"
            )
        if self.shadow_resolution_scale not in (1, 2, 4):
            raise ValueError(
                "shadow_resolution_scale must be 1, 2 or 4; got "
                f"{self.shadow_resolution_scale}"
            )
        s = 2 * self.shadow_resolution_scale
        if self.shadow_resolution_scale > 1 and (
            self.img_height % s or self.img_width % s
        ):
            raise ValueError(
                "img dims must stay even after the draft-march downscale; "
                f"got {self.img_height}x{self.img_width} at scale "
                f"{self.shadow_resolution_scale}"
            )
        if self.shadow_lowres_t_stride > 1 and (
            self.shadow_resolution_scale == 1
            or self.shadow_refine_halfwidth < self.shadow_lowres_t_stride
        ):
            raise ValueError(
                "shadow_lowres_t_stride > 1 needs the draft-mode march "
                "(shadow_resolution_scale > 1) AND a refine window that "
                "covers the strided argmin error (shadow_refine_halfwidth "
                f">= stride); got stride {self.shadow_lowres_t_stride}, "
                f"scale {self.shadow_resolution_scale}, halfwidth "
                f"{self.shadow_refine_halfwidth}"
            )
        if self.shadow_col_chunk:
            if self.shadow_col_chunk % 8:
                raise ValueError(
                    "shadow_col_chunk must be a multiple of 8 (sublane "
                    f"granularity); got {self.shadow_col_chunk}"
                )
            eff = min(self.shadow_col_chunk, self.img_width)
            if self.img_width % eff:
                raise ValueError(
                    "shadow_col_chunk must divide img_width; got chunk "
                    f"{self.shadow_col_chunk} for width {self.img_width}"
                )
        if self.shadow_step_pack not in (1, 2):
            raise ValueError(
                f"shadow_step_pack must be 1 or 2; got {self.shadow_step_pack}"
            )
        if self.shadow_step_pack == 2 and self.shadow_mask_gather not in (
            "auto", "bilinear"
        ):
            raise ValueError(
                "shadow_step_pack=2 packs the bilinear-veto dataflow; use "
                f"shadow_mask_gather='bilinear' (got "
                f"{self.shadow_mask_gather!r})"
            )

    @property
    def half_w(self) -> float:
        return self.img_width / 2.0

    @property
    def half_h(self) -> float:
        return self.img_height / 2.0


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """RelightNet architecture configuration.

    The two reference variants differ only in the residual projection shortcuts:
      'target'    3x3 shortcuts with bias (train_raytracing_...py:63-69 etc.)
      'transfer'  1x1 bias-free shortcuts (train_lighting_transfer.py:63-69 etc.)
    """

    variant: str = "target"  # 'target' | 'transfer'

    in_channels: int = 3
    base_channels: int = 16
    encoder_channels: Tuple[int, ...] = (16, 32, 64, 155)
    identity_channels: int = 128   # first 128 channels of the bottleneck
    lighting_channels: int = 27    # remaining 27 channels feed the lighting head
    lighting_hidden: int = 128     # linear_SL1 width
    lighting_out: int = 4          # [ambient, lx, ly, lz]

    bn_momentum: float = 0.1       # torch BatchNorm2d default
    bn_eps: float = 1e-5
    leaky_slope: float = 0.2

    # XLA dot/conv precision: 'default' uses fast (bfloat16-pass) MXU kernels,
    # 'highest' forces true float32 accumulation (use for parity testing; ~3x
    # slower on TPU). The bundled-checkpoint relight PSNR vs the PyTorch
    # reference exceeds 50 dB even at 'default'.
    conv_precision: str = "default"

    # Activation dtype for the CNN compute path: 'float32' (parity) or
    # 'bfloat16' (fast serving — halves HBM traffic for the activation
    # tensors between convs). Parameters are always stored in float32 and
    # BatchNorm moments/running stats are always computed in float32; only
    # the inter-layer activations are narrowed. Model outputs (albedo,
    # depth, lighting) are returned as float32 either way.
    compute_dtype: str = "float32"

    # Encoder skip connections into the decoders are enabled once the training
    # epoch exceeds these thresholds (stage order: deepest first).
    skip_gate_epochs: Tuple[int, int, int, int] = (8, 10, 12, 14)

    def skip_gates(self, epoch: int) -> Tuple[bool, bool, bool, bool]:
        return tuple(epoch > e for e in self.skip_gate_epochs)  # type: ignore[return-value]


@dataclasses.dataclass(frozen=True)
class PatchGANConfig:
    """70x70-style PatchGAN discriminator (train_*.py:15-35)."""

    channels: Tuple[int, ...] = (64, 128, 256, 512)
    kernel: int = 4
    leaky_slope: float = 0.2
    bn_momentum: float = 0.1
    bn_eps: float = 1e-5


# ---------------------------------------------------------------------------
# Training
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Loss weights (train_raytracing_relighting_CelebAHQ_DSSIM_8x.py:621-645)."""

    reconstruction: float = 20.0
    depth: float = 1.0
    ambient: float = 2.5
    direction: float = 1.0
    albedo: float = 5.0
    gan: float = 0.01
    dssim: float = 8.0
    ambient_target: float = 0.5  # pseudo-GT ambient (train_*.py:541)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 3               # per-replica batch (reference global batch)
    learning_rate: float = 1e-4
    max_epochs: int = 1000
    batches_per_epoch: int = 700
    gd_ratio: int = 5                 # discriminator updated every gd_ratio-th step
    dataset_size: int = 29890
    seed: int = 0
    loss: LossConfig = dataclasses.field(default_factory=LossConfig)
    # Cross-replica BatchNorm statistics under data parallelism (pmean of
    # moments) so multi-chip training matches single-device semantics.
    sync_batch_norm: bool = True
    checkpoint_every_steps: int = 700
    checkpoint_dir: str = "checkpoints"
    # Retention: keep only the newest N step_* checkpoints (<= 0 keeps all;
    # the reference saves every epoch forever, train_raytracing_...py:684-685).
    keep_checkpoints: int = 3
    log_every_steps: int = 1
    # Where training batches live. 'device' uploads the WHOLE training set
    # to device memory once and assembles batches with on-device gathers
    # driven by tiny int32 index uploads (12 B/step); 'stream' keeps the
    # per-step packed host->device upload; 'auto' picks 'device' on a
    # single-device mesh when the stored dataset fits device_data_budget_mb
    # (batch values are identical either way — same index stream, same
    # stored bytes, same on-device u8->f32 decode). Residency exists for
    # throughput (no host batch assembly) AND because this machine's
    # remote-TPU (axon) PJRT plugin leaks every device_put's host staging
    # buffer: a protocol-shape streaming soak leaked 5.25 MB/step to 79 GB
    # RSS in 65 min, while the resident path is flat (tools/leak_probe.py,
    # docs/HOST_LEAK_probe.md).
    data_residency: str = "auto"
    device_data_budget_mb: int = 2048


# ---------------------------------------------------------------------------
# Pipeline (model + renderer + training)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    render: RenderConfig = dataclasses.field(default_factory=RenderConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)


# ---------------------------------------------------------------------------
# Presets: one per reference entry point
# ---------------------------------------------------------------------------


def preset_target_lighting_train() -> PipelineConfig:
    """train_raytracing_relighting_CelebAHQ_DSSIM_8x.py"""
    return PipelineConfig(
        model=ModelConfig(variant="target"),
        render=RenderConfig(
            ambient_mode="estimated",
            lighting_mode="self_estimated",
            z_clamp_min=0.0,
            shadow_bias_gate="none",
        ),
    )


def preset_transfer_train() -> PipelineConfig:
    """train_lighting_transfer.py (same renderer as target training)."""
    return PipelineConfig(
        model=ModelConfig(variant="transfer"),
        render=RenderConfig(
            ambient_mode="estimated",
            lighting_mode="self_estimated",
            z_clamp_min=0.0,
            shadow_bias_gate="none",
        ),
    )


def preset_single_image() -> PipelineConfig:
    """test_relight_single_image.py (target-lighting single-image inference)."""
    return PipelineConfig(
        model=ModelConfig(variant="target"),
        render=RenderConfig(
            ambient_mode="estimated_minus_0.1",
            lighting_mode="target",
            shadow_bias_gate="inside_image",
        ),
    )


def preset_multipie_eval() -> PipelineConfig:
    """test_raytracing_relighting_CelebAHQ_DSSIM_8x.py (862-image benchmark sweep).

    Note: this script keeps the estimated ambient with NO -0.1 offset
    (test_raytracing_...py:341-342) and has no +5.0 gate in its shadow loop.
    """
    return PipelineConfig(
        model=ModelConfig(variant="target"),
        render=RenderConfig(
            ambient_mode="estimated",
            lighting_mode="target",
            shadow_bias_gate="inside_image",
        ),
    )


def preset_lighting_transfer() -> PipelineConfig:
    """test_relight_single_image_lighting_transfer.py (2-pass lighting transfer)."""
    return PipelineConfig(
        model=ModelConfig(variant="transfer"),
        render=RenderConfig(
            directional_intensity=0.41,
            num_sample_points=159,
            t_start=0.03,
            depth_offset=1410.0,
            focal_length=700.0,
            ambient_mode="target",
            lighting_mode="target",
            z_clamp_min=0.16,
            shadow_bias_gate="wide",
        ),
    )


PRESETS = {
    "target_lighting_train": preset_target_lighting_train,
    "transfer_train": preset_transfer_train,
    "single_image": preset_single_image,
    "multipie_eval": preset_multipie_eval,
    "lighting_transfer": preset_lighting_transfer,
}


# ---------------------------------------------------------------------------
# Precision tiers (serving knob shared by CLI / server / bench)
# ---------------------------------------------------------------------------

# One serving-precision axis instead of scattered flag combinations:
#   'strict'  float32 CNN activations + true-f32 shadow matmuls (HIGHEST).
#             Bit-close parity; the mode the parity suite certifies.
#   'high'    float32 CNN activations + the bf16x3-split shadow matmuls
#             (~2^-18 relative gather error — parity-grade at a fraction of
#             the strict march cost; see docs/BENCH_r04_high.json).
#   'fast'    bfloat16 CNN activations + single-pass bf16 shadow matmuls
#             and the bilinear mask veto (max throughput; golden parity
#             >= 46 dB on every bundled fixture, >= 50 dB on the
#             transfer-path ones — docs/PARITY_matrix.json).
#   'draft'   'fast' plus the shadow march at QUARTER resolution
#             (RenderConfig.shadow_resolution_scale=4: ~64x fewer march
#             FLOPs via the exact scene-scaling identity) with a full-
#             resolution boundary refine (shadow_refine_halfwidth=4: the
#             low-res argmin t* is NN-upsampled and re-marched over 8
#             fine offsets, ~8/160 of a full march — recovers the shadow-
#             boundary placement that pure upsampling loses), and the
#             low-res march striding every 2nd t-grid offset
#             (shadow_lowres_t_stride=2 — the halfwidth-4 refine window
#             re-searches the strided argmin's ±t_step error exactly),
#             and the low-res march lane-packed two t-steps per vreg
#             (shadow_step_pack=2: the 64-wide march half-fills (8,128)
#             vregs/MXU tiles; packing fills them — 328.1 img/s vs 308.6
#             at bit-identical parity cells, docs/BENCH_draft4_sp2.json).
#             On chip: worst bundled fixture 45.78 dB face-visible
#             (docs/BENCH_draft4.json) — parity IDENTICAL to the
#             unstrided scale-4 march (45.75 dB) at +33% throughput, and
#             the same parity class as the former scale-2 tier (46.6 dB)
#             at >3x its throughput; scale 2 / stride 1 / pack 1 stay
#             reachable via config overrides. Stride 4 measured 377 img/s
#             but drops the worst fixture 1.1 dB (44.6 dB,
#             docs/BENCH_draft4_ts4_rejected.json) — rejected for the
#             default, available via config. Preview/thumbnail serving;
#             the only tier that changes WHICH computation runs rather
#             than just its arithmetic precision.
PRECISION_TIERS = ("strict", "high", "fast", "draft")


def apply_precision_tier(cfg: "PipelineConfig", tier: str) -> "PipelineConfig":
    """Return cfg with the given serving-precision tier applied."""
    if tier not in PRECISION_TIERS:
        raise ValueError(f"unknown precision tier: {tier!r} (use one of {PRECISION_TIERS})")
    shadow = {
        "strict": "highest", "high": "high", "fast": "default",
        "draft": "default",
    }[tier]
    compute = "float32" if tier in ("strict", "high") else "bfloat16"
    scale = 4 if tier == "draft" else 1
    return dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, compute_dtype=compute),
        render=dataclasses.replace(
            cfg.render,
            shadow_matmul_precision=shadow,
            shadow_resolution_scale=scale,
            shadow_refine_halfwidth=4 if tier == "draft" else 0,
            shadow_lowres_t_stride=2 if tier == "draft" else 1,
            # Lane-pack the draft tier's 64-wide low-res march: two t-grid
            # steps share each (8,128) vreg / MXU tile (qualified on chip:
            # 328.1 img/s vs 308.6 at bit-identical parity cells,
            # docs/BENCH_draft4_sp2.json).
            shadow_step_pack=2 if tier == "draft" else 1,
            # Exact on every masked surface (see RenderConfig); all tiers
            # skip the march for fully-off-face 8-row groups, and the
            # column-aware cull additionally skips the off-face left/right
            # margins inside on-face row bands. Chunk width 32 tracks the
            # oval mask boundary tighter than 64 at no dense-path cost
            # (on-chip A/B, face mask batch 64: strict 26.2 -> 29.8 img/s,
            # high 38.1 -> 43.5, fast 50.3 -> 53.9, batch-3 train step
            # 0.129 -> 0.118 s; random-mask fast 27.35 == pre-colcull
            # 27.4). The draft tier keeps 64: its 64-wide low-res march
            # measured a wash (351.2 vs 351.7 img/s) and 64 is whole-array
            # for the scaled operand.
            shadow_mask_cull=True,
            shadow_col_chunk=64 if tier == "draft" else 32,
        ),
    )


# ---------------------------------------------------------------------------
# Serialisation (CLI --config files; the reference hard-codes everything)
# ---------------------------------------------------------------------------


def to_dict(cfg: PipelineConfig) -> dict:
    return dataclasses.asdict(cfg)


def from_dict(data: dict, base: Optional[PipelineConfig] = None) -> PipelineConfig:
    """Build a PipelineConfig from (possibly partial) nested dicts.

    Unknown keys raise; tuples are restored for tuple-typed fields.
    """
    base = base or PipelineConfig()

    def merge(dc, overrides: dict):
        fields = {f.name: f for f in dataclasses.fields(dc)}
        kwargs = {}
        for key, value in overrides.items():
            if key not in fields:
                raise KeyError(f"unknown config field: {type(dc).__name__}.{key}")
            current = getattr(dc, key)
            if dataclasses.is_dataclass(current) and isinstance(value, dict):
                kwargs[key] = merge(current, value)
            elif isinstance(current, tuple) and isinstance(value, (list, tuple)):
                kwargs[key] = tuple(value)
            else:
                kwargs[key] = value
        return dataclasses.replace(dc, **kwargs)

    return merge(base, data)


def load_config(path: str, preset: Optional[str] = None) -> PipelineConfig:
    """JSON config file (full or partial overrides on top of a preset)."""
    import json

    with open(path) as f:
        data = json.load(f)
    base = PRESETS[preset]() if preset else PipelineConfig()
    return from_dict(data, base)
