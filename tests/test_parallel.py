"""Sharded inference tests on the virtual 8-device CPU mesh."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from geomconsistentfr_tpu.config import RenderConfig
from geomconsistentfr_tpu.parallel.mesh import make_mesh, shard_batch_spec
from geomconsistentfr_tpu.render import render


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_render_sharded_over_light_axis():
    """A batched render sharded over the leading axis (e.g. the 18-light eval
    sweep split across chips) equals the unsharded computation."""
    cfg = RenderConfig(
        img_height=32, img_width=32, num_sample_points=16, t_stop=0.105,
        march_chunk=16, use_pallas_shadows=False, shadow_bias_gate="none",
        lighting_mode="target", ambient_mode="estimated",
    )
    mesh = make_mesh(jax.devices()[:8])
    rng = np.random.default_rng(0)
    b = 8
    albedo = rng.uniform(size=(b, 32, 32, 3)).astype(np.float32)
    depth = (rng.normal(size=(b, 32, 32)) * 10).astype(np.float32)
    lighting = rng.normal(size=(b, 4)).astype(np.float32)
    mask = np.ones((b, 32, 32), np.float32)
    lights = rng.normal(size=(b, 3)).astype(np.float32)
    lights[:, 2] = np.abs(lights[:, 2]) + 0.3

    def fwd(a, d, li, m, tl):
        return render(a, d, li, m, cfg, target_light=tl).rendered

    want = np.asarray(jax.jit(fwd)(albedo, depth, lighting, mask, lights))

    shardings = [
        NamedSharding(mesh, shard_batch_spec(np.ndim(x)))
        for x in (albedo, depth, lighting, mask, lights)
    ]
    args = [
        jax.device_put(x, s)
        for x, s in zip((albedo, depth, lighting, mask, lights), shardings)
    ]
    got_sharded = jax.jit(fwd)(*args)
    # Really sharded over 8 devices:
    assert len(got_sharded.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(got_sharded), want, atol=1e-5)


def test_relighter_data_parallel_matches_single_device():
    """Mesh-sharded inference (shard_map over the batch axis) returns exactly
    the single-device results; the eval/serving counterpart of DP training."""
    import dataclasses

    import numpy as np
    import pytest

    import jax
    import jax.numpy as jnp

    from geomconsistentfr_tpu.config import preset_single_image
    from geomconsistentfr_tpu.infer import Relighter
    from geomconsistentfr_tpu.models.relightnet import RelightNet
    from geomconsistentfr_tpu.parallel.mesh import make_mesh

    cfg = preset_single_image()
    cfg = dataclasses.replace(
        cfg,
        render=dataclasses.replace(
            cfg.render, img_height=32, img_width=32,
            num_sample_points=8, t_stop=0.065, march_chunk=8,
            use_pallas_shadows=False,
        ),
    )
    model = RelightNet(cfg=cfg.model)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    mesh = make_mesh()
    assert mesh.size > 1, "conftest should provide the virtual 8-device mesh"

    rl1 = Relighter(cfg, variables)
    rln = Relighter(cfg, variables, mesh=mesh)

    rng = np.random.default_rng(5)
    b = mesh.size
    img = rng.uniform(size=(b, 32, 32, 3)).astype(np.float32)
    mask = (rng.uniform(size=(b, 32, 32)) > 0.2).astype(np.float32)
    light = rng.normal(size=(b, 3)).astype(np.float32)
    light /= np.linalg.norm(light, axis=1, keepdims=True)
    amb = np.full((b,), 0.5, np.float32)

    out1 = rl1.forward(img, mask, target_light=light, target_ambient=amb)
    outn = rln.forward(img, mask, target_light=light, target_ambient=amb)
    for f in out1._fields:
        # Per-device batch 1 vs global batch changes XLA fusion/reduction
        # order; measured drift is <=1e-4 (unit-scale fields).
        np.testing.assert_allclose(
            np.asarray(getattr(out1, f)), np.asarray(getattr(outn, f)),
            atol=5e-4, err_msg=f,
        )

    pack1 = np.asarray(rl1.forward_visuals(img, mask, target_light=light,
                                           target_ambient=amb))
    packn = np.asarray(rln.forward_visuals(img, mask, target_light=light,
                                           target_ambient=amb))
    assert np.abs(pack1.astype(int) - packn.astype(int)).max() <= 1

    u1, a1 = rl1.estimate_lighting(img)
    un, an = rln.estimate_lighting(img)
    np.testing.assert_allclose(u1, un, atol=1e-5)
    np.testing.assert_allclose(a1, an, atol=1e-5)

    with pytest.raises(ValueError, match="multiple of the mesh size"):
        rln.forward(img[: b - 1], mask[: b - 1])


def test_relighter_sample_parallel_matches_single_device():
    """Latency-parallel inference: the march's sample axis sharded across the
    mesh (each device marches a slice of sample_ts, pmin combine) must equal
    the single-device forward — f32 min is associative and every post-min
    transform commutes (infer.Relighter doc). Unlike DP, any batch size
    works (the batch is replicated)."""
    import dataclasses

    from geomconsistentfr_tpu.config import preset_single_image
    from geomconsistentfr_tpu.infer import Relighter
    from geomconsistentfr_tpu.models.relightnet import RelightNet
    from geomconsistentfr_tpu.parallel.mesh import make_mesh

    cfg = preset_single_image()
    cfg = dataclasses.replace(
        cfg,
        render=dataclasses.replace(
            cfg.render, img_height=32, img_width=32,
            num_sample_points=12, t_stop=0.085, march_chunk=12,
            use_pallas_shadows=False,
        ),
    )
    model = RelightNet(cfg=cfg.model)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    mesh = make_mesh()
    assert mesh.size > 1, "conftest should provide the virtual 8-device mesh"

    rl1 = Relighter(cfg, variables)
    rln = Relighter(cfg, variables, mesh=mesh, parallel="samples")

    rng = np.random.default_rng(11)
    b = 3  # deliberately NOT a multiple of the mesh size
    img = rng.uniform(size=(b, 32, 32, 3)).astype(np.float32)
    mask = (rng.uniform(size=(b, 32, 32)) > 0.2).astype(np.float32)
    light = rng.normal(size=(b, 3)).astype(np.float32)
    light /= np.linalg.norm(light, axis=1, keepdims=True)
    amb = np.full((b,), 0.5, np.float32)

    out1 = rl1.forward(img, mask, target_light=light, target_ambient=amb)
    outn = rln.forward(img, mask, target_light=light, target_ambient=amb)
    for f in out1._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(out1, f)), np.asarray(getattr(outn, f)),
            atol=5e-4, err_msg=f,
        )
    # The load-bearing equivalence: the sharded march's combined min distance
    # is (near-)exactly the full march's.
    np.testing.assert_allclose(
        np.asarray(out1.min_distance), np.asarray(outn.min_distance),
        atol=1e-5,
    )

    pack1 = np.asarray(rl1.forward_visuals(img, mask, target_light=light,
                                           target_ambient=amb))
    packn = np.asarray(rln.forward_visuals(img, mask, target_light=light,
                                           target_ambient=amb))
    assert np.abs(pack1.astype(int) - packn.astype(int)).max() <= 1

    # The 18-light-sweep analogue also routes through the sharded march.
    lights = rng.normal(size=(5, 3)).astype(np.float32)
    lights[:, 2] = np.abs(lights[:, 2]) + 0.3
    sw1 = rl1.relight_sweep(img[0], mask[0], lights)
    swn = rln.relight_sweep(img[0], mask[0], lights)
    np.testing.assert_allclose(
        np.asarray(sw1.rendered), np.asarray(swn.rendered), atol=5e-4
    )
    u81 = np.asarray(rl1.relight_sweep_rendered_u8(img[0], mask[0], lights))
    u8n = np.asarray(rln.relight_sweep_rendered_u8(img[0], mask[0], lights))
    assert np.abs(u81.astype(int) - u8n.astype(int)).max() <= 1


def test_relighter_grid_parallel_matches_single_device():
    """2-D (data x samples) grid: the batch sharded over the first mesh axis
    and the march's sample grid over the second must reproduce the
    single-device forward; batch must be a multiple of the data-axis size
    only."""
    import dataclasses

    from geomconsistentfr_tpu.config import preset_single_image
    from geomconsistentfr_tpu.infer import Relighter
    from geomconsistentfr_tpu.models.relightnet import RelightNet
    from geomconsistentfr_tpu.parallel.mesh import make_mesh_grid

    cfg = preset_single_image()
    cfg = dataclasses.replace(
        cfg,
        render=dataclasses.replace(
            cfg.render, img_height=32, img_width=32,
            num_sample_points=12, t_stop=0.085, march_chunk=12,
            use_pallas_shadows=False,
        ),
    )
    model = RelightNet(cfg=cfg.model)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    mesh = make_mesh_grid(4, 2)
    assert mesh.shape == {"data": 4, "samples": 2}

    rl1 = Relighter(cfg, variables)
    rlg = Relighter(cfg, variables, mesh=mesh, parallel="grid")

    rng = np.random.default_rng(13)
    b = 4  # = data-axis size; NOT a multiple of the full mesh size (8)
    img = rng.uniform(size=(b, 32, 32, 3)).astype(np.float32)
    mask = (rng.uniform(size=(b, 32, 32)) > 0.2).astype(np.float32)
    light = rng.normal(size=(b, 3)).astype(np.float32)
    light /= np.linalg.norm(light, axis=1, keepdims=True)
    amb = np.full((b,), 0.5, np.float32)

    out1 = rl1.forward(img, mask, target_light=light, target_ambient=amb)
    outg = rlg.forward(img, mask, target_light=light, target_ambient=amb)
    for f in out1._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(out1, f)), np.asarray(getattr(outg, f)),
            atol=5e-4, err_msg=f,
        )

    pack1 = np.asarray(rl1.forward_visuals(img, mask, target_light=light,
                                           target_ambient=amb))
    packg = np.asarray(rlg.forward_visuals(img, mask, target_light=light,
                                           target_ambient=amb))
    assert np.abs(pack1.astype(int) - packg.astype(int)).max() <= 1

    # Sweep routes through the grid relighter too (data axis replicated).
    lights = rng.normal(size=(5, 3)).astype(np.float32)
    lights[:, 2] = np.abs(lights[:, 2]) + 0.3
    sw1 = rl1.relight_sweep(img[0], mask[0], lights)
    swg = rlg.relight_sweep(img[0], mask[0], lights)
    np.testing.assert_allclose(
        np.asarray(sw1.rendered), np.asarray(swg.rendered), atol=5e-4
    )

    # Batch constraint is the DATA-axis size (4), not the mesh size (8).
    with pytest.raises(ValueError, match="batch-axis size 4"):
        rlg.forward(img[:3], mask[:3])
    # estimate_lighting runs through an UNSHARDED net forward in grid mode,
    # so it must accept any batch size (regression: the divisibility check
    # used to reject non-multiples needlessly).
    u3, a3 = rlg.estimate_lighting(img[:3])
    u3_1, a3_1 = rl1.estimate_lighting(img[:3])
    np.testing.assert_allclose(u3, u3_1, atol=1e-5)
    np.testing.assert_allclose(a3, a3_1, atol=1e-5)
    # And a 1-D mesh is rejected for grid mode.
    from geomconsistentfr_tpu.parallel.mesh import make_mesh

    with pytest.raises(ValueError, match="2-D"):
        Relighter(cfg, variables, mesh=make_mesh(), parallel="grid")


def test_relighter_draft_sample_parallel_matches_single_device():
    """Draft tier x sample parallelism: the two fastest serving features
    compose. render() hands the sample-sharded march the pooled inputs and
    the march closes over the scaled config; pmin stays exact at any
    resolution (the t grid is scale-invariant), so the sharded draft forward
    equals the single-device draft forward."""
    import dataclasses

    from geomconsistentfr_tpu.config import apply_precision_tier, preset_single_image
    from geomconsistentfr_tpu.infer import Relighter
    from geomconsistentfr_tpu.models.relightnet import RelightNet
    from geomconsistentfr_tpu.parallel.mesh import make_mesh

    cfg = preset_single_image()
    cfg = dataclasses.replace(
        cfg,
        render=dataclasses.replace(
            cfg.render, img_height=32, img_width=32,
            num_sample_points=12, t_stop=0.085, march_chunk=12,
            use_pallas_shadows=False,
        ),
    )
    cfg = apply_precision_tier(cfg, "draft")
    assert cfg.render.shadow_resolution_scale == 4

    model = RelightNet(cfg=cfg.model)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    mesh = make_mesh()

    rl1 = Relighter(cfg, variables)
    rln = Relighter(cfg, variables, mesh=mesh, parallel="samples")

    rng = np.random.default_rng(13)
    img = rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)
    mask = np.zeros((2, 32, 32), np.float32)
    mask[:, 6:28, 4:26] = 1.0  # face-like block; leaves cullable row groups
    light = rng.normal(size=(2, 3)).astype(np.float32)
    light[:, 2] = np.abs(light[:, 2]) + 0.3
    light /= np.linalg.norm(light, axis=1, keepdims=True)
    amb = np.full((2,), 0.5, np.float32)

    out1 = rl1.forward(img, mask, target_light=light, target_ambient=amb)
    outn = rln.forward(img, mask, target_light=light, target_ambient=amb)
    np.testing.assert_allclose(
        np.asarray(out1.min_distance), np.asarray(outn.min_distance),
        atol=1e-4, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out1.rendered), np.asarray(outn.rendered), atol=5e-4
    )
