"""Column-aware march culling (RenderConfig.shadow_col_chunk).

Lane-dimension extension of the row cull (test_shadows_cull.py): the cull
unit shrinks from a full 8-row group to an (8-row x C-column) block, so the
left/right off-face margins inside on-face row bands skip the march too
(~25-30% of all blocks on the bundled FFHQ masks at C=64 — work the row
cull cannot touch). Exactness argument identical to the row cull: culled
pixels are a subset of mask==0 pixels, which nothing reference-visible ever
reads (test_raytracing_...py:601-608 eval dump, masked losses, masked
composite).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from geomconsistentfr_tpu.config import RenderConfig, apply_precision_tier
from geomconsistentfr_tpu.ops import shadows as S
from geomconsistentfr_tpu.ops import shadows_pallas as SP

BASE = RenderConfig(
    img_height=64,
    img_width=64,
    num_sample_points=32,
    t_start=0.025,
    t_stop=0.185,
    march_chunk=32,
)
ROW = dataclasses.replace(BASE, shadow_mask_cull=True)
COL = dataclasses.replace(ROW, shadow_col_chunk=16)


def _ellipse_inputs(cfg, b=2, seed=0, chunk=16):
    """Elliptical face masks (real-workload shape: every on-face row band
    has off-face column margins), plus one image shifted sideways so the
    dead-block pattern differs across the batch."""
    rng = np.random.default_rng(seed)
    h, w = cfg.img_height, cfg.img_width
    depth = rng.normal(size=(b, h, w)).astype(np.float32) * 30
    yy, xx = np.mgrid[0:h, 0:w]
    m = (
        ((xx - w / 2) / (0.30 * w)) ** 2 + ((yy - h / 2) / (0.42 * h)) ** 2
        < 1.0
    ).astype(np.float32)
    mask = np.stack([np.roll(m, (5 * i) % w, axis=1) for i in range(b)])
    lights = (
        np.asarray([[0.3, 0.4, 0.866], [-0.6, 0.1, 0.79]], np.float32)[:b]
        * cfg.light_distance
    )
    return jnp.asarray(depth), jnp.asarray(mask), jnp.asarray(lights)


def _live(mask, chunk):
    return np.stack(
        [np.asarray(S.cull_live_blocks(m, chunk)) for m in np.asarray(mask)]
    ).astype(bool)


def test_xla_colcull_semantics():
    depth, mask, lights = _ellipse_inputs(BASE)
    plain = np.asarray(S.ray_march_min_distance_batch(depth, mask, lights, BASE))
    culled = np.asarray(S.ray_march_min_distance_batch(depth, mask, lights, COL))
    live = _live(mask, COL.shadow_col_chunk)
    np.testing.assert_array_equal(culled[live], plain[live])
    assert (culled[~live] == 1.0e6).all()
    # Vacuity guard: the ellipse must produce dead blocks INSIDE live row
    # groups (the blocks only the column cull can reach).
    row_live = np.stack(
        [
            np.broadcast_to(np.asarray(S.cull_live_rows(m))[:, None], m.shape)
            for m in np.asarray(mask)
        ]
    ).astype(bool)
    assert (row_live & ~live).any() and live.any()


def test_stray_pixel_keeps_block_exact():
    """One on-face pixel anywhere in an (8 x C) block disables its cull."""
    depth, mask, lights = _ellipse_inputs(BASE)
    mask = np.array(mask)
    assert mask[0, 9, 3] == 0.0  # corner block is off-face in the ellipse
    mask[:, 9, 3] = 1.0          # block (rows 8..15, cols 0..15) now live
    mask = jnp.asarray(mask)
    plain = np.asarray(S.ray_march_min_distance_batch(depth, mask, lights, BASE))
    culled = np.asarray(S.ray_march_min_distance_batch(depth, mask, lights, COL))
    np.testing.assert_array_equal(
        culled[:, 8:16, 0:16], plain[:, 8:16, 0:16]
    )


def test_cull_live_blocks_degenerates_to_rows():
    _, mask, _ = _ellipse_inputs(BASE, b=1)
    m = mask[0]
    wide = np.asarray(S.cull_live_blocks(m, 4096))
    rows = np.broadcast_to(
        np.asarray(S.cull_live_rows(m))[:, None], wide.shape
    )
    np.testing.assert_array_equal(wide, rows)


@pytest.mark.parametrize(
    "name,overrides",
    [
        ("strict", dict(shadow_matmul_precision="highest")),
        ("fast", dict(shadow_matmul_precision="default")),
        (
            "fast_pack2",
            dict(shadow_matmul_precision="default", shadow_step_pack=2),
        ),
        (
            "strict_slab4",
            dict(shadow_matmul_precision="highest", shadow_slab_rows=4),
        ),
        (
            "interleave",
            dict(
                shadow_matmul_precision="highest",
                shadow_slab_interleave=True,
                shadow_tile_rows=16,
            ),
        ),
    ],
)
def test_pallas_colcull_matches_rowcull_kernel(name, overrides):
    """The column-cull kernel must match the row-cull kernel on every live
    block and emit the sentinel on dead blocks — in every kernel mode
    (precision, step pack, slab size, interleave).

    Live-block comparison is near-bitwise, not exactly bitwise: splitting
    the gather matmul's M extent (pixels) cannot change any dot's VALUE,
    but interpret-mode XLA:CPU retiles the dot at different M and may
    reassociate the K accumulation (observed <= 4e-6 on ~1% of pixels in
    interleave mode; the other modes come out bit-identical). The on-chip
    Mosaic lowering accumulates per output row regardless of M."""
    cfg_col = dataclasses.replace(COL, **overrides)
    cfg_row = dataclasses.replace(cfg_col, shadow_col_chunk=0)
    depth, mask, lights = _ellipse_inputs(cfg_col)
    got = np.asarray(
        SP.ray_march_min_distance_pallas(
            depth, mask, lights, cfg_col, interpret=True
        )
    )
    want = np.asarray(
        SP.ray_march_min_distance_pallas(
            depth, mask, lights, cfg_row, interpret=True
        )
    )
    live = _live(mask, cfg_col.shadow_col_chunk)
    np.testing.assert_allclose(got[live], want[live], rtol=2e-5, atol=2e-6)
    assert (got[~live] == 1.0e6).all()
    assert live.any() and (~live).any()


def test_pallas_colcull_argmin_t():
    depth, mask, lights = _ellipse_inputs(COL, b=1)
    got_c, t_c = SP.ray_march_min_distance_pallas(
        depth, mask, lights, COL, interpret=True, return_argmin_t=True
    )
    got_r, t_r = SP.ray_march_min_distance_pallas(
        depth,
        mask,
        lights,
        dataclasses.replace(COL, shadow_col_chunk=0),
        interpret=True,
        return_argmin_t=True,
    )
    live = _live(mask, COL.shadow_col_chunk)
    np.testing.assert_array_equal(np.asarray(t_c)[live], np.asarray(t_r)[live])
    ts = S.sample_ts(COL)
    assert (np.asarray(t_c)[~live] == np.float32(ts[0])).all()


def test_pallas_colcull_refine():
    cfg_col = dataclasses.replace(
        COL,
        shadow_matmul_precision="default",
        shadow_refine_halfwidth=4,
    )
    cfg_row = dataclasses.replace(cfg_col, shadow_col_chunk=0)
    depth, mask, lights = _ellipse_inputs(cfg_col)
    rng = np.random.default_rng(7)
    tmap = jnp.asarray(
        np.abs(rng.normal(size=depth.shape)).astype(np.float32) * 0.05
    )
    got = np.asarray(
        SP.refine_min_distance_pallas(
            depth, mask, lights, tmap, cfg_col, interpret=True
        )
    )
    want = np.asarray(
        SP.refine_min_distance_pallas(
            depth, mask, lights, tmap, cfg_row, interpret=True
        )
    )
    live = _live(mask, cfg_col.shadow_col_chunk)
    np.testing.assert_array_equal(got[live], want[live])
    assert (got[~live] == 1.0e6).all()


def test_render_masked_outputs_invariant_colcull():
    """End-to-end: the column cull changes NOTHING the pipeline ships."""
    from geomconsistentfr_tpu.losses import masked_composite
    from geomconsistentfr_tpu.render import render

    cfg_off = dataclasses.replace(
        BASE, lighting_mode="self_estimated", ambient_mode="estimated"
    )
    cfg_on = dataclasses.replace(
        cfg_off, shadow_mask_cull=True, shadow_col_chunk=16
    )
    rng = np.random.default_rng(3)
    b, h, w = 2, cfg_on.img_height, cfg_on.img_width
    albedo = jnp.asarray(rng.uniform(size=(b, h, w, 3)).astype(np.float32))
    depth_raw = jnp.asarray(rng.normal(size=(b, h, w)).astype(np.float32) * 20)
    lighting = jnp.asarray(
        np.tile(np.asarray([[0.4, 0.3, 0.4, 0.7]], np.float32), (b, 1))
    )
    _, mask, _ = _ellipse_inputs(cfg_on, b=b)
    images = jnp.asarray(rng.uniform(size=(b, h, w, 3)).astype(np.float32))

    out_off = render(albedo, depth_raw, lighting, mask, cfg_off)
    out_on = render(albedo, depth_raw, lighting, mask, cfg_on)

    m3 = np.asarray(mask)[..., None]
    np.testing.assert_array_equal(
        np.asarray(masked_composite(out_on.rendered, images, mask)),
        np.asarray(masked_composite(out_off.rendered, images, mask)),
    )
    for field in ("rendered", "shadow_mask_weights", "final_shading"):
        a = np.asarray(getattr(out_on, field))
        bfield = np.asarray(getattr(out_off, field))
        m = m3 if a.ndim == 4 else np.asarray(mask)
        np.testing.assert_array_equal(a * m, bfield * m)


def test_config_validation():
    with pytest.raises(ValueError):
        RenderConfig(shadow_col_chunk=12)  # not a multiple of 8
    with pytest.raises(ValueError):
        RenderConfig(shadow_col_chunk=48)  # does not divide 256
    RenderConfig(shadow_col_chunk=64)
    # chunk >= width degrades to the row cull instead of erroring
    RenderConfig(img_height=32, img_width=32, shadow_col_chunk=64)


def test_precision_tiers_enable_colcull():
    from geomconsistentfr_tpu.config import PipelineConfig

    for tier in ("strict", "high", "fast", "draft"):
        cfg = apply_precision_tier(PipelineConfig(), tier)
        # 32 tracks the mask boundary tighter on the full-res tiers
        # (+7-14% on chip); draft's 64-wide low-res march keeps the
        # whole-array chunk (a measured wash). See apply_precision_tier.
        expect = 64 if tier == "draft" else 32
        assert cfg.render.shadow_col_chunk == expect, tier
    assert PipelineConfig().render.shadow_col_chunk == 0


def test_dense_slabs_use_fullwidth_schedule():
    """A mask with every block live must produce BIT-identical output to
    the row-cull kernel in every mode: dense slabs dispatch to the same
    full-width machinery (the dual path's zero-cost-when-it-cannot-fire
    guarantee — e.g. random benchmark masks)."""
    rng = np.random.default_rng(3)
    h, w = BASE.img_height, BASE.img_width
    depth = jnp.asarray(rng.normal(size=(2, h, w)).astype(np.float32) * 30)
    # 90% density i.i.d.: every (8 x 16) block has a face pixel w.h.p.
    mask = jnp.asarray((rng.uniform(size=(2, h, w)) > 0.1).astype(np.float32))
    lights = jnp.asarray(
        np.asarray([[0.3, 0.4, 0.866], [-0.6, 0.1, 0.79]], np.float32)
        * BASE.light_distance
    )
    live = _live(mask, COL.shadow_col_chunk)
    assert live.all(), "fixture must be fully dense for this test"
    for overrides in (
        dict(shadow_matmul_precision="highest"),
        dict(shadow_matmul_precision="default", shadow_step_pack=2),
    ):
        cfg_col = dataclasses.replace(COL, **overrides)
        cfg_row = dataclasses.replace(cfg_col, shadow_col_chunk=0)
        got = np.asarray(
            SP.ray_march_min_distance_pallas(
                depth, mask, lights, cfg_col, interpret=True
            )
        )
        want = np.asarray(
            SP.ray_march_min_distance_pallas(
                depth, mask, lights, cfg_row, interpret=True
            )
        )
        np.testing.assert_array_equal(got, want)
