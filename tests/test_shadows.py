"""Unit tests for the shadow ray-march ops.

`border_endpoints` is verified against a literal numpy transcription of the
reference's 9-way host-side case analysis (test_relight_single_image.py:363-442)
— the structures differ (branchless vs branching), so agreement is a genuine
cross-check. Full-march parity against the reference forward is covered by the
model-level parity test once weights are convertible (tests/test_parity.py).
"""

import numpy as np

import jax
import jax.numpy as jnp

from geomconsistentfr_tpu.config import RenderConfig
from geomconsistentfr_tpu.ops import shadows
from geomconsistentfr_tpu.ops.geometry import pixel_grid_centered


def _reference_endpoints_numpy(xx, yy, light_x, light_y, h, w):
    """Literal transcription of the reference 9-case endpoint logic (numpy)."""
    left, right = -(w / 2.0), w - w / 2.0 - 1.0
    bottom, top = 1.0 - h / 2.0, h / 2.0
    slopes = (light_y - yy) / (light_x - xx + 1e-4)
    intercepts = light_y - slopes * light_x

    def try_x(xval):
        x = np.full_like(xx, xval)
        y = slopes * x + intercepts
        return np.stack([x, y])

    def try_y(yval):
        y = np.full_like(yy, yval)
        x = (y - intercepts) / (slopes + 1e-4)
        return np.stack([x, y])

    def corner(xval, yval):
        ep_x = try_x(xval)
        ep_y = try_y(yval)
        inter = np.logical_and(ep_y[0] >= left, ep_y[0] <= right)
        return ep_y * inter + ep_x * np.logical_not(inter)

    if light_x < left:
        if light_y < bottom:
            end = corner(left, bottom)
        elif light_y <= top:
            end = try_x(left)
        else:
            end = corner(left, top)
    elif light_x <= right:
        if light_y < bottom:
            end = try_y(bottom)
        elif light_y <= top:
            end = np.stack([np.full_like(xx, light_x), np.full_like(yy, light_y)])
        else:
            end = try_y(top)
    else:
        if light_y < bottom:
            end = corner(right, bottom)
        elif light_y <= top:
            end = try_x(right)
        else:
            end = corner(right, top)

    end[0] = np.clip(end[0], left, right)
    end[1] = np.clip(end[1], bottom, top)
    return end[0], end[1]


def test_border_endpoints_matches_reference_case_analysis():
    cfg = RenderConfig(img_height=32, img_width=32)
    xx, yy = pixel_grid_centered(32, 32)
    xx_np, yy_np = np.asarray(xx, np.float64), np.asarray(yy, np.float64)

    rng = np.random.default_rng(3)
    # Cover all 9 zones plus boundary-ish lights.
    lights = [
        (-500.0, -500.0), (-500.0, 0.0), (-500.0, 500.0),
        (0.0, -500.0), (3.0, 7.0), (0.0, 500.0),
        (500.0, -500.0), (500.0, 0.0), (500.0, 500.0),
        (-16.0, 16.0), (15.0, -15.0), (2000.0, 37.0),
    ] + [tuple(rng.uniform(-800, 800, size=2)) for _ in range(20)]

    for lx, ly in lights:
        ex, ey = shadows.border_endpoints(
            xx, yy, jnp.float32(lx), jnp.float32(ly), cfg
        )
        wx, wy = _reference_endpoints_numpy(xx_np, yy_np, lx, ly, 32, 32)
        np.testing.assert_allclose(np.asarray(ex), wx, atol=2e-2, err_msg=f"{lx},{ly} x")
        np.testing.assert_allclose(np.asarray(ey), wy, atol=2e-2, err_msg=f"{lx},{ly} y")


def test_sample_ts_counts():
    assert shadows.sample_ts(RenderConfig()).shape[0] == 160
    assert (
        shadows.sample_ts(
            RenderConfig(num_sample_points=159, t_start=0.03)
        ).shape[0]
        == 159
    )


def test_march_basic_occlusion():
    """A depth sample lying on the pixel->light ray gives ~zero min distance.

    Occlusion in this renderer means a marched depth sample sits ON the 3D
    pixel->light ray. Build a ridge whose height crosses the ray of a pixel at
    x=-20 (light at 45 deg elevation to the right: the ray's z grows ~1 per
    pixel of xy travel, so a ridge of z~30 at xy-distance ~30 intersects it).
    The same ridge at z=5 passes well under the ray -> larger min distance.
    """
    cfg = RenderConfig(img_height=64, img_width=64, shadow_bias_gate="none")
    mask = jnp.ones((64, 64))
    unit = np.array([0.7071, 0.0, 0.7071], np.float32)
    light = jnp.asarray(unit * cfg.light_distance)

    def min_dist(ridge_z):
        depth = np.zeros((64, 64), np.float32)
        depth[:, 42:45] = ridge_z  # centred x = 10..12
        return np.asarray(
            shadows.ray_march_min_distance(jnp.asarray(depth), mask, light, cfg)
        )

    occluded = min_dist(30.0)
    clear = min_dist(5.0)
    # Pixel at centred (-20, 0) -> row 32, col 12.
    assert occluded[32, 12] < 0.3
    assert clear[32, 12] > 0.5
    assert occluded[32, 12] < clear[32, 12]


def test_march_mask_veto_gives_large_distance():
    cfg = RenderConfig(img_height=32, img_width=32, shadow_bias_gate="none")
    depth = jnp.zeros((32, 32))
    mask = jnp.zeros((32, 32))  # everything off-face
    light = jnp.asarray([1000.0, 0.0, 3000.0])
    dist = np.asarray(shadows.ray_march_min_distance(depth, mask, light, cfg))
    assert np.all(dist == 1.0e6)


def test_march_bias_gate():
    cfg = RenderConfig(img_height=32, img_width=32, shadow_bias_gate="inside_image")
    depth = jnp.zeros((32, 32))
    mask = jnp.ones((32, 32))
    inside = np.asarray(
        shadows.ray_march_min_distance(depth, mask, jnp.asarray([0.0, 0.0, 10.0]), cfg)
    )
    outside = np.asarray(
        shadows.ray_march_min_distance(
            depth, mask, jnp.asarray([4000.0, 0.0, 10.0]), cfg
        )
    )
    # The +5.0 bias applies only when the light xy falls inside the image.
    assert inside.min() >= 5.0
    assert outside.min() < 5.0


def test_march_chunk_size_invariance():
    """march_chunk is a scan-width perf knob; results must be identical."""
    import dataclasses

    rng = np.random.default_rng(9)
    depth = jnp.asarray(rng.normal(size=(32, 32)).astype(np.float32) * 20)
    mask = jnp.asarray((rng.uniform(size=(32, 32)) > 0.2).astype(np.float32))
    light = jnp.asarray([900.0, -500.0, 3800.0])
    base = RenderConfig(
        img_height=32, img_width=32, num_sample_points=40, t_stop=0.225
    )
    outs = [
        np.asarray(
            shadows.ray_march_min_distance(
                depth, mask, light, dataclasses.replace(base, march_chunk=c)
            )
        )
        for c in (1, 7, 40, 64)
    ]
    # Not bitwise: XLA picks different FMA contractions per chunk shape, which
    # can flip knife-edge bilinear taps at isolated pixels. Values must agree
    # tightly almost everywhere.
    for other in outs[1:]:
        diff = np.abs(outs[0] - other)
        assert np.quantile(diff, 0.999) < 1e-4
        assert diff.mean() < 1e-5


def test_march_vmap_wrappers():
    cfg = RenderConfig(img_height=16, img_width=16, march_chunk=16)
    rng = np.random.default_rng(0)
    depths = jnp.asarray(rng.normal(size=(2, 16, 16)).astype(np.float32))
    masks = jnp.ones((2, 16, 16))
    lights = jnp.asarray(rng.normal(size=(2, 3)).astype(np.float32)) * 1000.0
    out = shadows.ray_march_min_distance_batch(depths, masks, lights, cfg)
    assert out.shape == (2, 16, 16)
    sweep = shadows.ray_march_min_distance_lights(depths[0], masks[0], lights, cfg)
    assert sweep.shape == (2, 16, 16)
    np.testing.assert_allclose(
        np.asarray(out[0]),
        np.asarray(
            shadows.ray_march_min_distance(depths[0], masks[0], lights[0], cfg)
        ),
    )


class TestMatmulEvaluator:
    """sample_distance_at_matmul == sample_distance_at, values and gradients.

    The matmul form is what the Pallas march's backward differentiates (its
    depth gradient transposes to a matmul instead of a scatter), so it must
    track the gather form bit-for-bit away from measure-zero tie coordinates.
    """

    CFG = RenderConfig(
        img_height=64,
        img_width=64,
        num_sample_points=32,
        t_start=0.025,
        t_stop=0.185,
        march_chunk=32,
    )

    def _inputs(self, seed=3):
        rng = np.random.default_rng(seed)
        depth = jnp.asarray(rng.normal(size=(64, 64)).astype(np.float32) * 30)
        mask = jnp.asarray(
            (rng.uniform(size=(64, 64)) > 0.15).astype(np.float32)
        )
        light = jnp.asarray([0.45, -0.2, 0.87], np.float32) * self.CFG.light_distance
        t = jnp.asarray(
            rng.uniform(0.05, 0.8, size=(64, 64)).astype(np.float32)
        )
        return depth, mask, light, t

    def test_values_match_gather_form(self):
        depth, mask, light, t = self._inputs()
        want = np.asarray(shadows.sample_distance_at(depth, mask, light, t, self.CFG))
        got = np.asarray(
            shadows.sample_distance_at_matmul(depth, mask, light, t, self.CFG)
        )
        big = want >= 1e5
        assert (big == (got >= 1e5)).all()
        np.testing.assert_allclose(got[~big], want[~big], rtol=1e-5, atol=1e-4)

    def test_grads_match_gather_form(self):
        depth, mask, light, t = self._inputs(seed=9)

        def loss(fn, d, l):
            return jnp.sum(jnp.tanh(fn(d, mask, l, t, self.CFG)))

        g_d, g_l = jax.grad(
            lambda d, l: loss(shadows.sample_distance_at, d, l), argnums=(0, 1)
        )(depth, light)
        m_d, m_l = jax.grad(
            lambda d, l: loss(shadows.sample_distance_at_matmul, d, l),
            argnums=(0, 1),
        )(depth, light)
        np.testing.assert_allclose(
            np.asarray(m_d), np.asarray(g_d), rtol=1e-3, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(m_l), np.asarray(g_l), rtol=1e-3, atol=1e-4
        )
