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
