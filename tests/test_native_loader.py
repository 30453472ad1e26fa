"""Native C++ data loader: build, stream, and match the numpy loader."""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_cache(tmp_path_factory):
    """A small packed cache in the data/celebahq.py memmap format."""
    cache = tmp_path_factory.mktemp("cache")
    n = 8
    rng = np.random.default_rng(0)
    fields = {
        "image": (np.uint8, (256, 256, 3)),
        "depth_gt": (np.float32, (256, 256)),
        "depth_mask": (np.uint8, (256, 256)),
        "albedo_gt": (np.uint8, (256, 256)),
        "face_mask": (np.uint8, (256, 256)),
        "light_gt": (np.float32, (3,)),
    }
    for name, (dt, shape) in fields.items():
        if dt == np.uint8:
            arr = rng.integers(0, 256, size=(n, *shape)).astype(np.uint8)
        else:
            arr = rng.normal(size=(n, *shape)).astype(np.float32)
        np.save(os.path.join(cache, f"{name}.npy"), arr)
    with open(os.path.join(cache, "meta.json"), "w") as f:
        json.dump({"num_samples": n}, f)
    return str(cache)


def test_build_and_stream(tiny_cache):
    from geomconsistentfr_tpu.data.native_loader import NativeCelebAHQLoader

    loader = NativeCelebAHQLoader(tiny_cache, batch_size=4, seed=1, workers=2)
    seen = set()
    for _ in range(4):
        batch = loader.next_batch()
        assert batch["image"].shape == (4, 256, 256, 3)
        assert batch["image"].dtype == np.float32
        assert 0.0 <= batch["image"].min() and batch["image"].max() <= 1.0
        assert np.isfinite(batch["depth_gt"]).all()
        seen.add(round(float(batch["light_gt"][0, 0]), 6))
    loader.close()
    assert len(seen) >= 2  # shuffled slots produce different batches


def test_native_matches_numpy_loader(tiny_cache):
    from geomconsistentfr_tpu.data import CelebAHQRelightingData
    from geomconsistentfr_tpu.data.native_loader import NativeCelebAHQLoader

    ref = CelebAHQRelightingData(tiny_cache)
    loader = NativeCelebAHQLoader(tiny_cache, batch_size=2, seed=3, workers=1)
    batch = loader.next_batch()
    # Identify which slot the native loader served by matching light_gt rows.
    want_all = ref.get_batch(np.arange(8))
    row = batch["light_gt"][0]
    matches = np.where((np.abs(want_all["light_gt"] - row) < 1e-6).all(axis=1))[0]
    assert len(matches) == 1
    s = int(matches[0])
    want = ref.get_batch(np.arange(s, s + 2))
    for key in batch:
        np.testing.assert_allclose(batch[key], want[key], atol=1e-6, err_msg=key)
    loader.close()


def test_native_jpeg_decode_matches_imageio(tmp_path):
    """Native libjpeg decode == imageio's decode of the same file (both sit
    on libjpeg; any IDCT variation stays within a couple of LSBs)."""
    import imageio.v2 as imageio
    import numpy as np

    from geomconsistentfr_tpu.data import native_loader

    if not native_loader.has_native_jpeg():
        import pytest

        pytest.skip("shared library built without libjpeg")

    rng = np.random.default_rng(0)
    rgb = (rng.uniform(size=(256, 256, 3)) * 255).astype(np.uint8)
    gray = (rng.uniform(size=(256, 256)) * 255).astype(np.uint8)
    p_rgb = str(tmp_path / "img.jpg")
    p_gray = str(tmp_path / "gray.jpg")
    imageio.imwrite(p_rgb, rgb)
    imageio.imwrite(p_gray, gray)

    got = native_loader.decode_jpeg(p_rgb, 256, 256, 3)
    want = np.asarray(imageio.imread(p_rgb))
    assert got.shape == (256, 256, 3) and got.dtype == np.uint8
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 2

    got_g = native_loader.decode_jpeg(p_gray, 256, 256, 1)
    want_g = np.asarray(imageio.imread(p_gray))
    assert got_g.shape == (256, 256)
    assert np.abs(got_g.astype(int) - want_g.astype(int)).max() <= 2


def test_native_jpeg_batch_and_errors(tmp_path):
    import imageio.v2 as imageio
    import numpy as np
    import pytest

    from geomconsistentfr_tpu.data import native_loader

    if not native_loader.has_native_jpeg():
        pytest.skip("shared library built without libjpeg")

    rng = np.random.default_rng(1)
    paths = []
    imgs = []
    for i in range(5):
        img = (rng.uniform(size=(256, 256, 3)) * 255).astype(np.uint8)
        p = str(tmp_path / f"b{i}.jpg")
        imageio.imwrite(p, img)
        paths.append(p)
        imgs.append(np.asarray(imageio.imread(p)))

    batch = native_loader.decode_jpegs(paths, 256, 256, 3, workers=3)
    assert batch.shape == (5, 256, 256, 3)
    for got, want in zip(batch, imgs):
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 2

    # Dimension mismatch raises (no silent rescale).
    small = (rng.uniform(size=(64, 64, 3)) * 255).astype(np.uint8)
    p_small = str(tmp_path / "small.jpg")
    imageio.imwrite(p_small, small)
    with pytest.raises(ValueError, match="code 4"):
        native_loader.decode_jpeg(p_small, 256, 256, 3)

    # Corrupt / missing files raise.
    p_bad = str(tmp_path / "bad.jpg")
    with open(p_bad, "wb") as f:
        f.write(b"not a jpeg at all")
    with pytest.raises(ValueError, match="code 3"):
        native_loader.decode_jpeg(p_bad, 256, 256, 3)
    with pytest.raises(ValueError, match="code 2"):
        native_loader.decode_jpeg(str(tmp_path / "missing.jpg"), 256, 256, 3)
    with pytest.raises(ValueError, match="failed"):
        native_loader.decode_jpegs([paths[0], p_bad], 256, 256, 3)


def test_raw_batch_and_device_decode_match_f32_path(tiny_cache):
    """get_batch_raw (stored dtypes) + the trainer's on-device decode must
    reproduce get_batch's f32 schema to within 1 ulp (XLA may lower the /255
    to reciprocal+multiply — the documented decode_batch contract)."""
    import jax
    import jax.numpy as jnp

    from geomconsistentfr_tpu import train as train_mod
    from geomconsistentfr_tpu.data import CelebAHQRelightingData

    ref = CelebAHQRelightingData(tiny_cache)
    idx = np.arange(3)
    raw = ref.get_batch_raw(idx)
    assert raw["image"].dtype == np.uint8
    assert raw["face_mask"].dtype == np.uint8
    assert raw["depth_gt"].dtype == np.float32
    decoded = jax.device_get(
        train_mod._decode_device_batch(
            {k: jnp.asarray(v) for k, v in raw.items()}
        )
    )
    want = ref.get_batch(idx)
    for k in want:
        assert decoded[k].dtype == np.float32, k
        err = np.abs(decoded[k].astype(np.float64) - want[k])
        assert (err <= np.spacing(np.abs(want[k]))).all(), k
        # Float-through fields (depth, light) must be untouched.
        if raw[k].dtype == np.float32:
            np.testing.assert_array_equal(decoded[k], want[k], err_msg=k)


def test_native_raw_matches_memmaps(tiny_cache):
    """The native loader's raw mode streams the stored bytes untouched."""
    from geomconsistentfr_tpu.data import CelebAHQRelightingData
    from geomconsistentfr_tpu.data.native_loader import NativeCelebAHQLoader

    ref = CelebAHQRelightingData(tiny_cache)
    loader = NativeCelebAHQLoader(
        tiny_cache, batch_size=2, seed=3, workers=1, raw=True
    )
    batch = loader.next_batch_raw()
    assert batch["image"].dtype == np.uint8
    # Identify which slot the native loader served by matching light_gt rows.
    want_all = ref.get_batch_raw(np.arange(8))
    row = batch["light_gt"][0]
    matches = np.where(
        (np.abs(want_all["light_gt"] - row) < 1e-6).all(axis=1)
    )[0]
    assert len(matches) == 1
    s = int(matches[0])
    want = ref.get_batch_raw(np.arange(s, s + 2))
    for key in batch:
        assert batch[key].dtype == want[key].dtype, key
        np.testing.assert_array_equal(batch[key], want[key], err_msg=key)
    # Mode guards: the f32 API is refused on a raw loader.
    with pytest.raises(AssertionError):
        loader.next_batch()
    loader.close()
