"""Crop-geometry parity vs the vendored reference oracle.

The oracle (tests/oracles/crop_oracle.py) transcribes the reference geometry
from recrop_CelebA-HQ_images.py:15-49 with detection replaced by an explicit
box; `preprocess.crop_face` must be pixel-identical on every box, including
the guard boundary and out-of-canvas crops.
"""

import numpy as np
import pytest

from geomconsistentfr_tpu.preprocess import box_from_mask, crop_face
from tests.oracles.crop_oracle import reference_crop

FFHQ_IMAGES = "/root/reference/sample_test_images_FFHQ"
FFHQ_MASKS = "/root/reference/FFHQ_skin_masks"


def _random_image(rng, h=600, w=600):
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_crop_matches_oracle_random_boxes():
    rng = np.random.default_rng(0)
    img = _random_image(rng)
    for _ in range(40):
        x1 = float(rng.uniform(-30, 400))
        y1 = float(rng.uniform(-30, 400))
        w = float(rng.uniform(120, 450))
        h = float(rng.uniform(120, 450))
        box = (x1, y1, x1 + w, y1 + h)
        ours = crop_face(img, box)
        ref = reference_crop(img, box)
        if ref is None:
            assert ours is None
            continue
        assert ours is not None
        np.testing.assert_array_equal(ours, ref)


def test_min_face_guard_tests_scaled_side():
    """Raw max-side in [200/1.2, 200) passes the reference guard (recrop:37-39:
    l = 1.2*max(w,h); skip when l < 200) — a raw-side test would reject it."""
    rng = np.random.default_rng(1)
    img = _random_image(rng)
    # raw side 180 -> scaled 216 >= 200: must crop.
    box = (100.0, 100.0, 280.0, 250.0)
    assert reference_crop(img, box) is not None
    ours = crop_face(img, box)
    assert ours is not None
    np.testing.assert_array_equal(ours, reference_crop(img, box))
    # raw side 160 -> scaled 192 < 200: both skip.
    small = (100.0, 100.0, 260.0, 230.0)
    assert reference_crop(img, small) is None
    assert crop_face(img, small) is None


def test_crop_overrunning_canvas_zero_fills():
    """Boxes near the border overrun even the 50px pad; PIL crop zero-fills."""
    rng = np.random.default_rng(2)
    img = _random_image(rng, 400, 400)
    for box in [
        (-20.0, -20.0, 300.0, 310.0),   # top-left overrun
        (150.0, 120.0, 420.0, 430.0),   # bottom-right overrun
        (0.0, 0.0, 399.0, 399.0),       # whole image, 1.2x overruns all sides
    ]:
        ours = crop_face(img, box)
        ref = reference_crop(img, box)
        assert ours is not None and ref is not None
        np.testing.assert_array_equal(ours, ref)


def test_crop_fractional_box_truncation():
    """Fractional detector boxes exercise the int() truncation semantics."""
    rng = np.random.default_rng(3)
    img = _random_image(rng)
    for box in [
        (100.3, 90.7, 350.9, 340.1),
        (99.999, 100.001, 300.5, 299.5),
        (50.5, 60.5, 251.5, 261.5),
    ]:
        np.testing.assert_array_equal(
            crop_face(img, box), reference_crop(img, box)
        )


@pytest.mark.parametrize("name", ["00104", "00295", "00508", "00695"])
def test_crop_matches_oracle_ffhq(name):
    """Real face boxes from the bundled FFHQ skin masks (box_from_mask)."""
    imageio = pytest.importorskip("imageio.v2")
    img = np.asarray(imageio.imread(f"{FFHQ_IMAGES}/{name}.png"))[..., :3]
    mask = np.asarray(imageio.imread(f"{FFHQ_MASKS}/{name}.png"))
    box = box_from_mask(mask)
    ours = crop_face(img, box)
    ref = reference_crop(img, box)
    assert ours is not None and ref is not None
    np.testing.assert_array_equal(ours, ref)
