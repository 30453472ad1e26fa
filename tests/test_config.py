"""Config presets pinned against the reference constants (SURVEY.md §6 table)."""

import pytest

from geomconsistentfr_tpu import config as C


def test_single_image_preset():
    cfg = C.preset_single_image()
    r = cfg.render
    assert (r.img_height, r.img_width) == (256, 256)
    assert r.directional_intensity == 0.5
    assert r.light_distance == 4013.0
    assert r.num_sample_points == 160 and r.t_start == 0.025
    assert r.depth_offset == 1610.0 and r.focal_length == 1570.0
    assert r.ambient_mode == "estimated_minus_0.1"
    assert r.lighting_mode == "target"
    assert r.shadow_bias_gate == "inside_image" and r.shadow_bias == 5.0
    assert cfg.model.variant == "target"


def test_lighting_transfer_preset():
    r = C.preset_lighting_transfer().render
    assert r.directional_intensity == 0.41
    assert r.num_sample_points == 159 and r.t_start == 0.03
    assert r.depth_offset == 1410.0 and r.focal_length == 700.0
    assert r.ambient_mode == "target" and r.lighting_mode == "target"
    assert r.z_clamp_min == 0.16
    assert r.shadow_bias_gate == "wide"
    assert C.preset_lighting_transfer().model.variant == "transfer"


def test_train_presets():
    for preset, variant in [
        (C.preset_target_lighting_train(), "target"),
        (C.preset_transfer_train(), "transfer"),
    ]:
        r = preset.render
        assert r.lighting_mode == "self_estimated" and r.z_clamp_min == 0.0
        assert r.ambient_mode == "estimated"
        assert r.shadow_bias_gate == "none"
        assert r.num_sample_points == 160
        assert preset.model.variant == variant
        t = preset.train
        assert t.batch_size == 3 and t.learning_rate == 1e-4
        assert t.max_epochs == 1000 and t.batches_per_epoch == 700
        assert t.gd_ratio == 5 and t.dataset_size == 29890
        lw = t.loss
        assert (lw.reconstruction, lw.depth, lw.ambient) == (20.0, 1.0, 2.5)
        assert (lw.direction, lw.albedo, lw.gan, lw.dssim) == (1.0, 5.0, 0.01, 8.0)
        assert lw.ambient_target == 0.5


def test_multipie_eval_preset():
    r = C.preset_multipie_eval().render
    assert r.ambient_mode == "estimated"  # no -0.1 (test_raytracing :341-342)
    assert r.shadow_bias_gate == "inside_image"
    assert r.focal_length == 1570.0


def test_skip_gate_table():
    assert C.ModelConfig().skip_gate_epochs == (8, 10, 12, 14)


def test_presets_registry_complete():
    assert set(C.PRESETS) == {
        "target_lighting_train",
        "transfer_train",
        "single_image",
        "multipie_eval",
        "lighting_transfer",
    }
    for factory in C.PRESETS.values():
        cfg = factory()
        # round-trips through dict serialisation
        assert C.from_dict(C.to_dict(cfg)) == cfg


def test_render_config_rejects_odd_dimensions():
    import pytest

    from geomconsistentfr_tpu.config import RenderConfig

    with pytest.raises(ValueError, match="even"):
        RenderConfig(img_height=65, img_width=64)
    with pytest.raises(ValueError, match="even"):
        RenderConfig(img_height=64, img_width=63)
    RenderConfig(img_height=64, img_width=64)  # fine


def test_apply_precision_tier():
    import pytest

    from geomconsistentfr_tpu import config as C

    base = C.preset_single_image()
    strict = C.apply_precision_tier(base, "strict")
    assert strict.render.shadow_matmul_precision == "highest"
    assert strict.model.compute_dtype == "float32"
    high = C.apply_precision_tier(base, "high")
    assert high.render.shadow_matmul_precision == "high"
    assert high.model.compute_dtype == "float32"
    fast = C.apply_precision_tier(base, "fast")
    assert fast.render.shadow_matmul_precision == "default"
    assert fast.model.compute_dtype == "bfloat16"
    with pytest.raises(ValueError, match="unknown precision tier"):
        C.apply_precision_tier(base, "turbo")
