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
