"""build_cache packing semantics on a synthetic MP_data directory layout."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def fake_mp_data(tmp_path_factory):
    import imageio.v2 as imageio
    import scipy.io

    root = tmp_path_factory.mktemp("MP_data")
    dirs = {
        "images": root / "CelebA-HQ_DFNRMVS_cropped",
        "lightings": root / "lighting_directions_CelebAHQ_DFNRMVS",
        "depths": root / "depth_maps_CelebA-HQ",
        "depth_masks": root / "depth_masks_CelebA-HQ_DFNRMVS",
        "albedo": root / "CelebA-HQ_albedo_grayscale",
        "face_masks": root / "CelebAHQ_face_masks",
    }
    for d in dirs.values():
        os.makedirs(d)
    rng = np.random.default_rng(0)
    for i in range(3):
        stem = f"{i:05d}"
        imageio.imwrite(
            dirs["images"] / f"{stem}.jpg",
            rng.integers(0, 256, (256, 256, 3)).astype(np.uint8),
        )
        imageio.imwrite(
            dirs["albedo"] / f"{stem}.jpg",
            rng.integers(0, 256, (256, 256)).astype(np.uint8),
        )
        imageio.imwrite(
            dirs["face_masks"] / f"{stem}.jpg",
            (rng.uniform(size=(256, 256)) > 0.5).astype(np.uint8) * 255,
        )
        imageio.imwrite(
            dirs["depth_masks"] / f"{stem}_depth.png",
            (rng.uniform(size=(256, 256)) > 0.5).astype(np.uint8) * 255,
        )
        scipy.io.savemat(
            dirs["depths"] / f"{stem}_depth.mat",
            {"depth_img": rng.normal(size=(256, 256)).astype(np.float64)},
        )
        scipy.io.savemat(
            dirs["lightings"] / f"{stem}.jpg.mat",
            {"lighting_direction": rng.normal(size=(1, 3))},
        )
    return str(root)


def test_build_cache_and_stream(fake_mp_data, tmp_path):
    from geomconsistentfr_tpu.data import CelebAHQRelightingData, build_cache

    cache = str(tmp_path / "cache")
    n = build_cache(fake_mp_data, cache)
    assert n == 3

    data = CelebAHQRelightingData(cache)
    assert data.num_samples == 3
    batch = data.get_batch(np.array([0, 2]))
    assert batch["image"].shape == (2, 256, 256, 3)
    assert batch["image"].dtype == np.float32
    assert batch["light_gt"].shape == (2, 3)
    # "fill nose and mouth" mask is binarised (only 0/1 after /255).
    assert set(np.unique(batch["face_mask"])) <= {0.0, 1.0}
    # Depth pseudo-GT round-trips exactly (float32 memmap).
    import scipy.io

    want = scipy.io.loadmat(
        os.path.join(fake_mp_data, "depth_maps_CelebA-HQ", "00000_depth.mat")
    )["depth_img"].astype(np.float32)
    np.testing.assert_allclose(batch["depth_gt"][0], want)

    # Reference epoch structure: shuffled contiguous slots.
    rng = np.random.default_rng(0)
    idx = list(data.epoch_batch_indices(rng, batch_size=1, batches_per_epoch=3))
    assert len(idx) == 3
    assert sorted(int(i[0]) for i in idx) == [0, 1, 2]
