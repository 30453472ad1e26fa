"""orbax checkpoint save/restore roundtrip, incl. TrainState resume."""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp


def test_variables_roundtrip(tmp_path):
    from geomconsistentfr_tpu.utils import checkpoint as ckpt

    tree = {
        "params": {"w": jnp.arange(12.0).reshape(3, 4), "b": jnp.zeros(4)},
        "batch_stats": {"m": jnp.ones(4)},
    }
    path = str(tmp_path / "vars")
    ckpt.save_variables(path, tree)
    back = ckpt.restore_variables(path)
    np.testing.assert_allclose(back["params"]["w"], np.arange(12.0).reshape(3, 4))
    np.testing.assert_allclose(back["batch_stats"]["m"], np.ones(4))


def test_trainstate_resume(tmp_path):
    from geomconsistentfr_tpu import train as train_mod
    from geomconsistentfr_tpu.config import preset_target_lighting_train
    from geomconsistentfr_tpu.utils import checkpoint as ckpt

    cfg = preset_target_lighting_train()
    cfg = dataclasses.replace(
        cfg,
        render=dataclasses.replace(
            cfg.render, img_height=32, img_width=32,
            num_sample_points=16, t_stop=0.105, use_pallas_shadows=False,
        ),
        train=dataclasses.replace(cfg.train, batch_size=1),
    )
    state = train_mod.init_state(cfg, jax.random.PRNGKey(0), batch_size=1)
    path = str(tmp_path / "step_00000001")
    ckpt.save_variables(path, state)
    template = jax.device_get(state)
    restored = ckpt.restore_variables(path, template=template)
    a = jax.tree.leaves(state.params_g)[0]
    b = jax.tree.leaves(restored.params_g if hasattr(restored, "params_g") else restored["params_g"])[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert ckpt.latest_step_dir(str(tmp_path)) == path
