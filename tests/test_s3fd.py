"""Parity tests for the native S3FD face detector (models/s3fd.py).

The published s3fd.pth weights are environment-blocked (like the LPIPS
trunks), so parity is pinned with RANDOM weights shared between the Flax
implementation and a torch transcription of the same public architecture
(tests/oracles/s3fd_torch.py) through the converter — covering the layer
graph, padding semantics, L2Norm, the max-out background label, the SSD
anchor decode and NMS.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from geomconsistentfr_tpu.models import s3fd
from tests.oracles.s3fd_torch import S3FDTorch, reference_detect


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(0)
    return S3FDTorch().eval()


@pytest.fixture(scope="module")
def flax_variables(torch_model):
    return s3fd.convert_s3fd_state_dict(torch_model.state_dict())


@pytest.fixture(scope="module")
def image():
    rng = np.random.default_rng(7)
    return rng.integers(0, 256, (64, 64, 3)).astype(np.float32)


def test_head_logits_match_torch(torch_model, flax_variables, image):
    import jax.numpy as jnp

    x = s3fd.preprocess_bgr(image)
    flax_out = s3fd.S3FD().apply(flax_variables, jnp.asarray(x))
    with torch.no_grad():
        torch_out = torch_model(
            torch.from_numpy(x.transpose(0, 3, 1, 2).copy())
        )
    assert len(flax_out) == len(torch_out) == 12
    for i, (f, t) in enumerate(zip(flax_out, torch_out)):
        t_nhwc = t.numpy().transpose(0, 2, 3, 1)
        assert f.shape == t_nhwc.shape, (i, f.shape, t_nhwc.shape)
        np.testing.assert_allclose(
            np.asarray(f), t_nhwc, rtol=1e-3, atol=1e-4,
            err_msg=f"head output {i}",
        )


def test_decode_matches_reference_decode(torch_model, image):
    # Same logits into both decoders: rows must match exactly.
    x = np.asarray(image, np.float32) - np.array(
        [104.0, 117.0, 123.0], np.float32
    )
    with torch.no_grad():
        olist = torch_model(torch.from_numpy(x.transpose(2, 0, 1)[None]))
    nhwc = [o.numpy().transpose(0, 2, 3, 1) for o in olist]
    ours = s3fd.decode_detections(nhwc)
    ref = reference_detect(torch_model, image)
    assert ours.shape == ref.shape
    if len(ours):
        order_a = np.lexsort(ours.T)
        order_b = np.lexsort(ref.T)
        np.testing.assert_allclose(
            ours[order_a], ref[order_b], rtol=1e-5, atol=1e-5
        )


def test_nms_known_case():
    boxes = np.array(
        [
            [0, 0, 10, 10, 0.9],
            [1, 1, 11, 11, 0.8],   # IoU ~0.70 with the first -> suppressed
            [20, 20, 30, 30, 0.7],  # disjoint -> kept
            [0, 0, 10, 10, 0.6],   # duplicate of the first -> suppressed
        ],
        np.float32,
    )
    assert s3fd.nms(boxes, 0.3) == [0, 2]


def test_nms_matches_naive_reference():
    rng = np.random.default_rng(3)
    xy = rng.uniform(0, 50, (40, 2))
    wh = rng.uniform(5, 30, (40, 2))
    boxes = np.concatenate(
        [xy, xy + wh, rng.uniform(0, 1, (40, 1))], axis=1
    ).astype(np.float32)

    def naive(b, thresh):
        idx = list(np.argsort(-b[:, 4]))
        keep = []
        while idx:
            i = idx.pop(0)
            keep.append(i)
            rest = []
            for j in idx:
                xx1 = max(b[i, 0], b[j, 0])
                yy1 = max(b[i, 1], b[j, 1])
                xx2 = min(b[i, 2], b[j, 2])
                yy2 = min(b[i, 3], b[j, 3])
                inter = max(0, xx2 - xx1 + 1) * max(0, yy2 - yy1 + 1)
                a_i = (b[i, 2] - b[i, 0] + 1) * (b[i, 3] - b[i, 1] + 1)
                a_j = (b[j, 2] - b[j, 0] + 1) * (b[j, 3] - b[j, 1] + 1)
                if inter / (a_i + a_j - inter) <= thresh:
                    rest.append(j)
            idx = rest
        return keep

    assert s3fd.nms(boxes, 0.3) == naive(boxes, 0.3)


def test_detect_faces_end_to_end(torch_model, flax_variables, image):
    # Full pipeline vs an identical pipeline run on the torch logits.
    ours = s3fd.detect_faces(image, flax_variables, score_threshold=0.2)
    cand = reference_detect(torch_model, image)
    if len(cand):
        cand = cand[s3fd.nms(cand, 0.3)]
        cand = cand[cand[:, 4] > 0.2]
        cand = cand[np.argsort(-cand[:, 4])]
    assert ours.shape == cand.shape
    if len(ours):
        np.testing.assert_allclose(ours, cand, rtol=1e-3, atol=1e-3)


def test_weights_roundtrip_through_pth(tmp_path, torch_model, image):
    path = tmp_path / "s3fd.pth"
    torch.save(torch_model.state_dict(), str(path))
    variables = s3fd.load_s3fd_weights(str(path))
    det_a = s3fd.detect_faces(image, variables, score_threshold=0.2)
    ref = s3fd.convert_s3fd_state_dict(torch_model.state_dict())
    det_b = s3fd.detect_faces(image, ref, score_threshold=0.2)
    np.testing.assert_array_equal(det_a, det_b)


def test_preprocess_detect_coordinates_shift_back():
    # detect_faces_s3fd pads by 50 reflect-101 (the frame the reference's
    # detector sees) and returns ORIGINAL-image coordinates.
    from geomconsistentfr_tpu import preprocess

    calls = {}

    def fake_detect(image_bgr, variables, **kw):
        calls["shape"] = image_bgr.shape
        calls["bgr_corner"] = image_bgr[50, 50].copy()
        return np.array([[60.0, 70.0, 160.0, 180.0, 0.99]], np.float32)

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (128, 128, 3)).astype(np.uint8)
    det = preprocess.detect_faces_s3fd(
        img, variables={}, _detect_fn=fake_detect
    )
    assert calls["shape"] == (228, 228, 3)
    # Channel flip: the padded pixel at (50, 50) is the original (0, 0), BGR.
    np.testing.assert_array_equal(calls["bgr_corner"], img[0, 0, ::-1])
    np.testing.assert_allclose(det[0, :4], [10.0, 20.0, 110.0, 130.0])
    assert det[0, 4] == np.float32(0.99)
