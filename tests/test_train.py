"""Training-step smoke + semantics tests (CPU, tiny shapes)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from geomconsistentfr_tpu.config import preset_target_lighting_train
from geomconsistentfr_tpu import train as train_mod


def _tiny_cfg(batch):
    cfg = preset_target_lighting_train()
    return dataclasses.replace(
        cfg,
        render=dataclasses.replace(
            cfg.render,
            img_height=32,
            img_width=32,
            num_sample_points=16,
            t_stop=0.105,
            march_chunk=16,
            use_pallas_shadows=False,
        ),
        train=dataclasses.replace(cfg.train, batch_size=batch),
    )


def _batch(rng, b, s):
    return {
        "image": rng.uniform(0, 1, (b, s, s, 3)).astype(np.float32),
        "face_mask": np.ones((b, s, s), np.float32),
        "depth_gt": rng.normal(size=(b, s, s)).astype(np.float32),
        "depth_mask": np.ones((b, s, s), np.float32),
        "albedo_gt": rng.uniform(0, 1, (b, s, s)).astype(np.float32),
        "light_gt": np.tile(np.asarray([[0.0, 0.7071, 0.7071]], np.float32), (b, 1)),
    }


@pytest.fixture(scope="module")
def stepped():
    cfg = _tiny_cfg(batch=2)
    state = train_mod.init_state(cfg, jax.random.PRNGKey(0))
    step = train_mod.make_single_device_step(cfg)
    rng = np.random.default_rng(0)
    batch = _batch(rng, 2, 32)
    state0 = state
    state1, m1 = step(state0, batch, (False, False, False, False))
    state2, m2 = step(state1, batch, (False, False, False, False))
    return cfg, state0, state1, state2, m1, m2


def test_losses_finite_and_positive(stepped):
    _, _, _, _, m1, m2 = stepped
    for k, v in m1.items():
        assert np.isfinite(float(v)), k
    assert float(m1["total"]) > 0


def test_generator_updates_every_step(stepped):
    _, s0, s1, s2, _, _ = stepped
    l0 = jax.tree.leaves(s0.params_g)[0]
    l1 = jax.tree.leaves(s1.params_g)[0]
    l2 = jax.tree.leaves(s2.params_g)[0]
    assert not np.allclose(l0, l1)
    assert not np.allclose(l1, l2)


def test_discriminator_gd_ratio(stepped):
    """D params update on step 0 (0 % 5 == 0) but NOT on step 1."""
    _, s0, s1, s2, _, _ = stepped

    def flat(p):
        return np.concatenate([np.ravel(x) for x in jax.tree.leaves(p)])

    assert not np.allclose(flat(s0.params_d), flat(s1.params_d))  # step 0: update
    np.testing.assert_allclose(flat(s1.params_d), flat(s2.params_d))  # step 1: hold


def test_batch_stats_update_every_step(stepped):
    _, s0, s1, s2, _, _ = stepped

    def flat(p):
        return np.concatenate([np.ravel(x) for x in jax.tree.leaves(p)])

    assert not np.allclose(flat(s0.batch_stats_g), flat(s1.batch_stats_g))
    assert not np.allclose(flat(s1.batch_stats_d), flat(s2.batch_stats_d))


def test_data_parallel_matches_single_device():
    """2-device shard_map step == single-device step on the global batch."""
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    from geomconsistentfr_tpu.parallel.mesh import make_mesh, device_put_sharded_batch

    cfg = _tiny_cfg(batch=2)
    state = train_mod.init_state(cfg, jax.random.PRNGKey(1))
    rng = np.random.default_rng(1)
    batch = _batch(rng, 2, 32)

    single = train_mod.make_single_device_step(cfg)
    s_single, m_single = single(state, batch, (False, False, False, False))

    mesh = make_mesh(jax.devices()[:2])
    dp = train_mod.make_data_parallel_step(cfg, mesh)
    sharded_batch = device_put_sharded_batch(batch, mesh)
    s_dp, m_dp = dp(state, sharded_batch, (False, False, False, False))

    for k in m_single:
        assert abs(float(m_single[k]) - float(m_dp[k])) < 5e-4, (
            k, float(m_single[k]), float(m_dp[k]),
        )
    a = jax.tree.leaves(s_single.params_g)[0]
    b = jax.tree.leaves(s_dp.params_g)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_training_is_deterministic():
    """Same seed + same batches -> bitwise-identical states."""
    cfg = _tiny_cfg(batch=1)
    rng = np.random.default_rng(3)
    batch = _batch(rng, 1, 32)
    step = train_mod.make_single_device_step(cfg)

    def run():
        state = train_mod.init_state(cfg, jax.random.PRNGKey(7))
        for _ in range(2):
            state, _ = step(state, batch, (False, False, False, False))
        return state

    a, b = run(), run()
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_save_restore_mid_run_equivalence(tmp_path):
    """step, checkpoint, restore, step == two straight steps."""
    from geomconsistentfr_tpu.utils import checkpoint as ckpt

    cfg = _tiny_cfg(batch=1)
    rng = np.random.default_rng(4)
    b1 = _batch(rng, 1, 32)
    b2 = _batch(rng, 1, 32)
    step = train_mod.make_single_device_step(cfg)
    us = (False, False, False, False)

    state = train_mod.init_state(cfg, jax.random.PRNGKey(9))
    s1, _ = step(state, b1, us)
    straight, _ = step(s1, b2, us)

    path = str(tmp_path / "step_00000001")
    ckpt.save_variables(path, s1)
    restored = ckpt.restore_variables(path, template=jax.device_get(s1))
    restored = jax.tree.map(jnp.asarray, restored)
    resumed, _ = step(restored, b2, us)

    for x, y in zip(jax.tree.leaves(straight), jax.tree.leaves(resumed)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-7)


def test_profile_trace_writes_files(tmp_path):
    from geomconsistentfr_tpu.utils.profiling import StepTimer, trace

    with trace(str(tmp_path)):
        _ = jnp.sum(jnp.arange(128.0) ** 2).block_until_ready()
    import os

    found = any("trace" in f or f.endswith(".pb") or "plugins" in f
                for root, dirs, files in os.walk(tmp_path)
                for f in list(files) + list(dirs))
    assert found

    timer = StepTimer()
    with timer:
        pass
    assert timer.ms is not None and timer.ms >= 0


def test_synthetic_data_schema():
    from geomconsistentfr_tpu.data import SyntheticFaceData

    data = SyntheticFaceData(num_samples=4, size=32)
    rng = np.random.default_rng(0)
    batch = data.sample_batch(rng, 2)
    assert batch["image"].shape == (2, 32, 32, 3)
    assert batch["depth_gt"].shape == (2, 32, 32)
    assert batch["light_gt"].shape == (2, 3)
    assert 0 <= batch["image"].min() and batch["image"].max() <= 1


def test_resume_replays_uninterrupted_batch_order(tmp_path):
    """2 epochs straight == 1 epoch + checkpoint + resume + 1 epoch.

    run_epoch derives each epoch's shuffle from (seed, epoch), so a resumed
    run must reproduce the uninterrupted run's batch stream — not just its
    state (round-1 weakness: resume re-seeded a fresh stream and re-drew
    epoch shuffles).
    """
    from geomconsistentfr_tpu.data import SyntheticFaceData

    cfg = _tiny_cfg(batch=2)
    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(
            cfg.train, batches_per_epoch=3, log_every_steps=1,
            checkpoint_every_steps=0,
        ),
    )
    data = SyntheticFaceData(num_samples=8, size=32)
    from geomconsistentfr_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(jax.devices()[:1])  # suite pins an 8-device CPU mesh

    wd_a = str(tmp_path / "straight")
    trainer_a = train_mod.Trainer(cfg, data=data, workdir=wd_a, mesh=mesh)
    state = trainer_a.init_or_resume()
    state, m0_a = trainer_a.run_epoch(state, 0)
    trainer_a.save(state)
    state, m1_a = trainer_a.run_epoch(state, 1)

    wd_b = str(tmp_path / "resumed")
    trainer_b = train_mod.Trainer(cfg, data=data, workdir=wd_b, mesh=mesh)
    state_b = trainer_b.init_or_resume()
    state_b, m0_b = trainer_b.run_epoch(state_b, 0)
    trainer_b.save(state_b)
    # Simulate a crash + restart: a fresh Trainer restores from wd_b and
    # continues at the epoch derived from the restored step counter.
    trainer_c = train_mod.Trainer(cfg, data=data, workdir=wd_b, mesh=mesh)
    state_c = trainer_c.init_or_resume()
    start_epoch = int(jax.device_get(state_c.step)) // cfg.train.batches_per_epoch
    assert start_epoch == 1
    state_c, m1_c = trainer_c.run_epoch(state_c, start_epoch)

    for k in m1_a:
        if k == "seconds":
            continue
        assert np.isclose(m1_a[k], m1_c[k], atol=1e-6), (k, m1_a[k], m1_c[k])


class _CrashAfter:
    """Data wrapper that simulates a crash on the n+1-th batch draw."""

    def __init__(self, inner, n_calls: int):
        self.inner = inner
        self.n = n_calls
        self.calls = 0

    def sample_batch(self, rng, batch_size):
        self.calls += 1
        if self.calls > self.n:
            raise RuntimeError("simulated crash")
        return self.inner.sample_batch(rng, batch_size)


def test_mid_epoch_resume_matches_uninterrupted(tmp_path):
    """Crash after a mid-epoch step checkpoint; resume must fast-forward
    within the epoch (start_batch) rather than re-training the epoch head
    on the already-advanced state (round-2 weakness #2).
    """
    from geomconsistentfr_tpu.data import SyntheticFaceData
    from geomconsistentfr_tpu.parallel.mesh import make_mesh

    cfg = _tiny_cfg(batch=2)
    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(
            cfg.train, batches_per_epoch=4, log_every_steps=1,
            checkpoint_every_steps=2,
        ),
    )
    data = SyntheticFaceData(num_samples=8, size=32)
    mesh = make_mesh(jax.devices()[:1])

    # Uninterrupted: two full epochs.
    wd_a = str(tmp_path / "straight")
    trainer_a = train_mod.Trainer(cfg, data=data, workdir=wd_a, mesh=mesh)
    state_a = trainer_a.init_or_resume()
    state_a, _ = trainer_a.run_epoch(state_a, 0)
    state_a, m1_a = trainer_a.run_epoch(state_a, 1)

    # Interrupted: crash on the 4th batch draw of epoch 0 — after the
    # step-2 checkpoint was written, before the epoch completes.
    wd_b = str(tmp_path / "crashed")
    trainer_b = train_mod.Trainer(
        cfg, data=_CrashAfter(data, 3), workdir=wd_b, mesh=mesh
    )
    state_b = trainer_b.init_or_resume()
    with pytest.raises(RuntimeError, match="simulated crash"):
        trainer_b.run_epoch(state_b, 0)

    # Restart: restore the step-2 checkpoint, fast-forward 2 batches into
    # epoch 0's shuffle, finish the epoch, then run epoch 1.
    trainer_c = train_mod.Trainer(cfg, data=data, workdir=wd_b, mesh=mesh)
    state_c = trainer_c.init_or_resume()
    step0 = int(jax.device_get(state_c.step))
    start_epoch, start_batch = divmod(step0, cfg.train.batches_per_epoch)
    assert (start_epoch, start_batch) == (0, 2)
    state_c, _ = trainer_c.run_epoch(state_c, 0, start_batch=start_batch)
    assert int(jax.device_get(state_c.step)) == 4
    state_c, m1_c = trainer_c.run_epoch(state_c, 1)

    for k in m1_a:
        if k == "seconds":
            continue
        assert np.isclose(m1_a[k], m1_c[k], atol=1e-6), (k, m1_a[k], m1_c[k])
    for x, y in zip(jax.tree.leaves(state_a), jax.tree.leaves(state_c)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-7)


def test_trainer_visualize_writes_gallery(tmp_path):
    """Per-epoch HTML progress gallery (util/visualizer.py counterpart)."""
    import dataclasses
    import os

    import jax

    from geomconsistentfr_tpu import train as train_mod
    from geomconsistentfr_tpu.config import preset_target_lighting_train
    from geomconsistentfr_tpu.data import SyntheticFaceData

    cfg = preset_target_lighting_train()
    cfg = dataclasses.replace(
        cfg,
        render=dataclasses.replace(
            cfg.render, img_height=32, img_width=32,
            num_sample_points=8, t_stop=0.065, march_chunk=8,
            use_pallas_shadows=False,
        ),
    )
    data = SyntheticFaceData(num_samples=4, size=32)
    trainer = train_mod.Trainer(cfg, data=data, workdir=str(tmp_path))
    state = train_mod.init_state(cfg, jax.random.PRNGKey(0), batch_size=1)
    index = trainer.visualize(state, epoch=0)
    index2 = trainer.visualize(state, epoch=1)
    assert index == index2 and os.path.exists(index)
    html = open(index).read()
    assert "epoch_0000" in html and "epoch_0001" in html
    for name in ("input", "albedo", "depth", "shadow", "rendered"):
        assert os.path.exists(tmp_path / "visuals" / "epoch_0001" / f"{name}.png")

    # A resumed run (fresh Trainer over the same workdir) keeps prior rows.
    trainer2 = train_mod.Trainer(cfg, data=data, workdir=str(tmp_path))
    trainer2.visualize(state, epoch=2)
    html = open(index).read()
    for tag in ("epoch_0000", "epoch_0001", "epoch_0002"):
        assert tag in html, tag


def test_decode_device_batch_matches_host_scaling():
    """The on-device u8 -> f32/255 expansion equals the host
    `.astype(np.float32)/255.0` (CelebAHQRelightingData.get_batch) to within
    1 ulp for every uint8 value (XLA may lower the divide to
    reciprocal+multiply); float fields pass through untouched."""
    u8 = np.arange(256, dtype=np.uint8).reshape(1, 16, 16)
    f32 = np.random.default_rng(0).normal(size=(1, 16, 16)).astype(np.float32)
    out = jax.device_get(
        train_mod._decode_device_batch(
            {"m": jnp.asarray(u8), "d": jnp.asarray(f32)}
        )
    )
    assert out["m"].dtype == np.float32
    want = u8.astype(np.float32) / 255.0
    err = np.abs(out["m"].astype(np.float64) - want)
    assert (err <= np.spacing(np.abs(want))).all()
    np.testing.assert_array_equal(out["d"], f32)


def test_grid_parallel_matches_single_device():
    """2-D (data x samples) step == single-device step on the global batch:
    the batch shards over the data axis while the shadow march's sample grid
    shards over the samples axis (pmin forward + first-global-winner t* for
    the replicated backward). Also asserts parameters stay in sync across
    the samples axis (gradients there must be bit-identical by design)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device mesh")
    from geomconsistentfr_tpu.parallel.mesh import (
        device_put_sharded_batch,
        make_mesh_grid,
    )

    cfg = _tiny_cfg(batch=2)
    state = train_mod.init_state(cfg, jax.random.PRNGKey(2))
    rng = np.random.default_rng(2)
    batch = _batch(rng, 2, 32)
    # Make the mask non-trivial so the off-face veto and the argmin combine
    # see real structure (all-vetoed sample slices included).
    batch["face_mask"] = (
        rng.uniform(size=(2, 32, 32)) > 0.2
    ).astype(np.float32)

    single = train_mod.make_single_device_step(cfg)
    s_single, m_single = single(state, batch, (False, False, False, False))

    mesh = make_mesh_grid(2, 4)  # 16 samples -> 4 per device
    grid = train_mod.make_grid_parallel_step(cfg, mesh)
    sharded_batch = device_put_sharded_batch(batch, mesh)
    s_grid, m_grid = grid(state, sharded_batch, (False, False, False, False))

    # Forward (loss) equivalence is tight; parameter updates differ at
    # ~1e-4 because the grid path uses the single-winning-sample backward
    # (recompute from t*, exact a.e. — the same estimator the Pallas TPU
    # training path uses) while the CPU single-device step autogradss
    # through the full 16-sample min.
    for k in m_single:
        assert abs(float(m_single[k]) - float(m_grid[k])) < 5e-4, (
            k, float(m_single[k]), float(m_grid[k]),
        )
    for a, b in zip(
        jax.tree.leaves(s_single.params_g), jax.tree.leaves(s_grid.params_g)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)

    # Sharding-shape self-consistency is the sharp check: a (1, 8) grid
    # (8 sample shards, no data sharding) uses the identical gradient
    # estimator, so any deviation would expose a bug in the sample-axis
    # combine itself (pmin, first-global-winner t*, replicated backward).
    mesh18 = make_mesh_grid(1, 8)
    grid18 = train_mod.make_grid_parallel_step(cfg, mesh18)
    batch18 = device_put_sharded_batch(batch, mesh18)
    s_g18, m_g18 = grid18(state, batch18, (False, False, False, False))
    for k in m_grid:
        # 1-way vs 2-way data psum changes f32 reduction order; bound the
        # drift relative to the metric's magnitude (losses range 0.01..20).
        tol = 2e-5 + 2e-6 * abs(float(m_grid[k]))
        assert abs(float(m_g18[k]) - float(m_grid[k])) < tol, (
            k, float(m_g18[k]), float(m_grid[k]),
        )
    # Params tolerate more: one Adam step from init turns ~1e-7 psum-order
    # gradient noise into +-lr update flips wherever a near-zero gradient
    # changes sign (m/sqrt(v) ~ sign(g) at step 1). The bit-exact
    # estimator-level check lives in
    # tests/test_shadows_pallas.py::test_vjp_sp_gradient_slice_invariant.
    for a, b in zip(
        jax.tree.leaves(s_g18.params_g), jax.tree.leaves(s_grid.params_g)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)
    for a, b in zip(
        jax.tree.leaves(s_g18.params_d), jax.tree.leaves(s_grid.params_d)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)

    # A second step keeps them in lockstep (catches any samples-axis
    # divergence compounding through optimizer state).
    s_single2, m_single2 = single(s_single, batch, (False, False, False, False))
    s_grid2, m_grid2 = grid(s_grid, sharded_batch, (False, False, False, False))
    assert abs(float(m_single2["total"]) - float(m_grid2["total"])) < 2e-3


def test_cli_train_precision_flag(tmp_path):
    """`cli train --precision fast` applies the serving tier on top of the
    preset/config and runs end to end (one tiny synthetic epoch)."""
    import json

    from geomconsistentfr_tpu import cli

    cfg_json = {
        "render": {
            "img_height": 32, "img_width": 32, "num_sample_points": 16,
            "t_stop": 0.105, "march_chunk": 16, "use_pallas_shadows": False,
        },
        "train": {
            # The CLI trains over ALL visible devices (the suite pins an
            # 8-device CPU mesh), so the batch must divide across them.
            "batch_size": 8, "batches_per_epoch": 1, "log_every_steps": 1,
            "checkpoint_every_steps": 0,
        },
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg_json))
    out = tmp_path / "run"
    rc = cli.main([
        "train", "--config", str(cfg_path), "--precision", "fast",
        "--data", "synthetic", "--synthetic-samples", "4",
        "--epochs", "1", "--out", str(out),
    ])
    assert rc == 0
    assert (out / "losses" / "metrics.csv").exists()
    # 'draft' is serving-only: the tier changes the marched computation.
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        cli.main(["train", "--precision", "draft", "--out", str(out)])


def test_device_resident_matches_streaming(tmp_path):
    """data_residency='device' (whole set on device + index gathers) must
    reproduce the streaming path's metrics exactly: same (seed, epoch)
    index stream, same stored bytes, same on-device decode. Residency is
    the default on single-device meshes because this machine's remote-TPU
    plugin leaks every device_put's staging buffer (docs/HOST_LEAK_probe.md)
    — but the equivalence is what makes that swap safe."""
    from geomconsistentfr_tpu.data import SyntheticFaceData
    from geomconsistentfr_tpu.parallel.mesh import make_mesh

    cfg = _tiny_cfg(batch=2)
    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(
            cfg.train, batches_per_epoch=3, checkpoint_every_steps=0,
        ),
    )
    data = SyntheticFaceData(num_samples=8, size=32)
    mesh = make_mesh(jax.devices()[:1])

    def run(residency):
        c = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, data_residency=residency)
        )
        tr = train_mod.Trainer(
            c, data=data, workdir=str(tmp_path / residency), mesh=mesh
        )
        state = tr.init_or_resume()
        state, m = tr.run_epoch(state, 0)
        return tr, m

    tr_dev, m_dev = run("device")
    tr_str, m_str = run("stream")
    assert tr_dev._resident() is not None
    assert tr_str._resident() is None
    for k in m_dev:
        if k == "seconds":
            continue
        assert np.isclose(m_dev[k], m_str[k], atol=0), (k, m_dev[k], m_str[k])


def test_device_resident_budget_fallback(tmp_path):
    """'auto' silently streams when the set exceeds the budget; explicit
    'device' fails loudly instead."""
    from geomconsistentfr_tpu.data import SyntheticFaceData
    from geomconsistentfr_tpu.parallel.mesh import make_mesh

    cfg = _tiny_cfg(batch=2)
    data = SyntheticFaceData(num_samples=8, size=32)
    mesh = make_mesh(jax.devices()[:1])

    tiny_budget = dataclasses.replace(
        cfg, train=dataclasses.replace(
            cfg.train, data_residency="auto", device_data_budget_mb=0
        )
    )
    tr = train_mod.Trainer(
        tiny_budget, data=data, workdir=str(tmp_path / "auto"), mesh=mesh
    )
    assert tr._resident() is None

    forced = dataclasses.replace(
        tiny_budget,
        train=dataclasses.replace(tiny_budget.train, data_residency="device"),
    )
    tr2 = train_mod.Trainer(
        forced, data=data, workdir=str(tmp_path / "forced"), mesh=mesh
    )
    with pytest.raises(ValueError, match="device_data_budget_mb"):
        tr2._resident()
