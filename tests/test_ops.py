"""Unit tests for device ops vs loop oracles and handcrafted cases."""

import numpy as np
import jax.numpy as jnp
import pytest

from face_vijnana_yolov3_tpu.ops.boxes import pairwise_iou, iou_single
from face_vijnana_yolov3_tpu.ops.letterbox import (
    letterbox_geometry,
    letterbox_host,
    letterbox_device,
    pack_geometry,
    unletterbox_boxes,
)
from face_vijnana_yolov3_tpu.ops.decode import decode_face_head
from face_vijnana_yolov3_tpu.ops.nms import nms_single_class, nms_multi_class
from face_vijnana_yolov3_tpu.ops.postprocess import (
    face_postprocess,
    FacePostprocessConfig,
)

from oracles import (
    oracle_iou,
    oracle_nms_single,
    oracle_face_decode,
    oracle_face_detect,
)


# ------------------------------------------------------------------ IoU

def test_iou_matches_oracle_random():
    rng = np.random.default_rng(0)
    n = 40
    mins = rng.uniform(0, 300, size=(n, 2))
    sizes = rng.uniform(1, 100, size=(n, 2))
    boxes = np.concatenate([mins, mins + sizes], axis=1)
    got = np.asarray(pairwise_iou(jnp.asarray(boxes), jnp.asarray(boxes)))
    for i in range(n):
        for j in range(n):
            assert got[i, j] == pytest.approx(oracle_iou(boxes[i], boxes[j]), abs=1e-5)


def test_iou_disjoint_and_identical():
    a = np.array([[0, 0, 10, 10]], dtype=np.float32)
    b = np.array([[20, 20, 30, 30]], dtype=np.float32)
    assert float(pairwise_iou(jnp.asarray(a), jnp.asarray(b))[0, 0]) == 0.0
    assert float(pairwise_iou(jnp.asarray(a), jnp.asarray(a))[0, 0]) == pytest.approx(1.0)
    assert iou_single(a[0], a[0]) == pytest.approx(1.0)


# ------------------------------------------------------------------ letterbox

@pytest.mark.parametrize(
    "h,w",
    [(480, 640), (640, 480), (416, 416), (1080, 1920), (333, 217), (1, 999)],
)
def test_letterbox_geometry_reference_math(h, w):
    g = letterbox_geometry(h, w, 416)
    # Re-derive with the reference's exact expressions.
    if w >= h:
        w_p = 416
        h_p = int(h / w * 416)
        pad = 416 - h_p
        pad_t = pad // 2
        pad_b = pad // 2 if pad % 2 == 0 else pad // 2 + 1
        assert (g.new_w, g.new_h, g.pad_t, g.pad_b, g.pad_l, g.pad_r) == (
            w_p, h_p, pad_t, pad_b, 0, 0)
    else:
        h_p = 416
        w_p = int(w / h * 416)
        pad = 416 - w_p
        pad_l = pad // 2
        pad_r = pad // 2 if pad % 2 == 0 else pad // 2 + 1
        assert (g.new_w, g.new_h, g.pad_t, g.pad_b, g.pad_l, g.pad_r) == (
            w_p, h_p, 0, 0, pad_l, pad_r)
    assert g.new_h + g.pad_t + g.pad_b == 416
    assert g.new_w + g.pad_l + g.pad_r == 416


def test_letterbox_host_shapes_and_pad_zero():
    img = np.random.default_rng(1).uniform(size=(300, 500, 3))
    out, g = letterbox_host(img, 416, "cubic")
    assert out.shape == (416, 416, 3)
    assert np.all(out[: g.pad_t] == 0)
    assert np.all(out[416 - g.pad_b:] == 0)


def test_letterbox_device_close_to_host_linear():
    # Use nearest on a smooth image: device path should land near the host result.
    rng = np.random.default_rng(2)
    img = rng.uniform(size=(200, 320, 3)).astype(np.float32)
    host, g = letterbox_host(img, 416, "cubic")
    staged = np.zeros((1, 256, 384, 3), np.float32)
    staged[0, :200, :320] = img
    dev = np.asarray(
        letterbox_device(jnp.asarray(staged), pack_geometry(g)[None], 416, "cubic")
    )[0]
    # Interpolation kernels differ (Keys a=-0.5 vs OpenCV a=-0.75): compare loosely.
    inner = (slice(g.pad_t + 2, 416 - g.pad_b - 2), slice(2, 414))
    assert np.mean(np.abs(dev[inner] - host[inner])) < 0.03
    # Pad region must be exactly zero.
    assert np.all(dev[: g.pad_t] == 0)
    assert np.all(dev[416 - g.pad_b:] == 0)


def test_unletterbox_boxes_matches_reference_formulas():
    g = letterbox_geometry(300, 500, 416)
    boxes = np.array([[10, 60, 200, 300], [0, 0, 416, 416]], dtype=np.float64)
    out = unletterbox_boxes(boxes, g)
    s, w, h = 416, 500, 300
    for k, (xmin, ymin, xmax, ymax) in enumerate(boxes):
        assert out[k, 0] == pytest.approx(min(xmin * w / s, w))
        assert out[k, 2] == pytest.approx(min(xmax * w / s, w))
        assert out[k, 1] == pytest.approx(min(max(ymin - g.pad_t, 0) * w / s, h))
        assert out[k, 3] == pytest.approx(min(max(ymax - g.pad_t, 0) * w / s, h))


def test_unletterbox_boxes_chunk_bitwise_matches_per_image():
    """The chunk-vectorized consumer path (streaming serving) must be
    BITWISE identical to the per-image f64 unletterbox across mixed
    landscape/portrait geometries."""
    from face_vijnana_yolov3_tpu.ops.letterbox import unletterbox_boxes_chunk

    rng = np.random.default_rng(3)
    geoms = [
        letterbox_geometry(300, 500, 416),   # landscape
        letterbox_geometry(640, 360, 416),   # portrait
        letterbox_geometry(416, 416, 416),   # square (wide branch)
        letterbox_geometry(57, 1203, 416),   # extreme aspect
    ]
    cands = rng.uniform(-10, 430, (4, 60, 6))
    out = unletterbox_boxes_chunk(cands, geoms)
    for k, g in enumerate(geoms):
        want = unletterbox_boxes(cands[k, :, :4].astype(np.float64), g)
        np.testing.assert_array_equal(out[k], want)


# ------------------------------------------------------------------ decode

def _random_head(rng, peaky=True):
    head = rng.normal(size=(13, 13, 6)).astype(np.float32)
    if peaky:
        # Push a handful of cells above threshold.
        for _ in range(8):
            i, j = rng.integers(0, 13, size=2)
            head[i, j, 0] = rng.uniform(2.0, 5.0)   # obj logit
            head[i, j, 5] = rng.uniform(2.0, 5.0)   # score logit
            head[i, j, 1:5] = rng.uniform(0.0, 1.0, size=4)
    return head


def test_decode_face_head_matches_oracle():
    rng = np.random.default_rng(3)
    for trial in range(5):
        head = _random_head(rng)
        boxes, scores, objness, mask = decode_face_head(jnp.asarray(head))
        boxes, scores, mask = map(np.asarray, (boxes, scores, mask))
        oracle = oracle_face_decode(head)
        got = [
            (k // 13, k % 13, *boxes[k].astype(int), scores[k])
            for k in range(169)
            if mask[k]
        ]
        assert len(got) == len(oracle)
        for g_row, o_row in zip(got, oracle):
            assert g_row[:6] == tuple(o_row[:2]) + tuple(int(v) for v in o_row[2:6])
            assert g_row[6] == pytest.approx(o_row[7], rel=1e-5)


# ------------------------------------------------------------------ NMS

def test_nms_single_class_matches_oracle():
    rng = np.random.default_rng(4)
    for trial in range(5):
        n = 30
        mins = rng.uniform(0, 300, size=(n, 2))
        sizes = rng.uniform(10, 120, size=(n, 2))
        boxes = np.concatenate([mins, mins + sizes], axis=1).astype(np.float32)
        scores = rng.uniform(0.01, 1.0, size=n).astype(np.float32)
        got = np.asarray(
            nms_single_class(jnp.asarray(boxes), jnp.asarray(scores), 0.45)
        )
        want = oracle_nms_single(boxes, scores, 0.45)
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_nms_multi_class_each_class_independent():
    rng = np.random.default_rng(5)
    n, c = 20, 4
    mins = rng.uniform(0, 200, size=(n, 2))
    sizes = rng.uniform(10, 100, size=(n, 2))
    boxes = np.concatenate([mins, mins + sizes], axis=1).astype(np.float32)
    cls = rng.uniform(0.01, 1.0, size=(n, c)).astype(np.float32)
    got = np.asarray(nms_multi_class(jnp.asarray(boxes), jnp.asarray(cls), 0.5))
    for ci in range(c):
        want = oracle_nms_single(boxes, cls[:, ci], 0.5)
        np.testing.assert_allclose(got[:, ci], want, atol=1e-6)


def test_nms_zero_score_boxes_do_not_suppress():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11]], dtype=np.float32)
    scores = np.array([0.0, 0.9], dtype=np.float32)
    got = np.asarray(nms_single_class(jnp.asarray(boxes), jnp.asarray(scores), 0.3))
    assert got[1] == pytest.approx(0.9)


# ------------------------------------------------------------------ fused postprocess

def test_face_postprocess_matches_full_oracle():
    rng = np.random.default_rng(6)
    cfg = FacePostprocessConfig()
    for trial in range(5):
        head = _random_head(rng)
        cands, count = face_postprocess(jnp.asarray(head), cfg)
        cands, count = np.asarray(cands), int(count)
        want = oracle_face_detect(head)
        assert count == len(want)
        for k, (box, score) in enumerate(want):
            np.testing.assert_array_equal(cands[k, :4], np.array(box, dtype=np.float32))
            assert cands[k, 5] == pytest.approx(score, rel=1e-5)
        # Rows past count are zeroed.
        assert np.all(cands[count:] == 0)


def test_face_postprocess_num_cands_cap():
    # Saturate every cell above threshold with tiny boxes so NMS keeps them all.
    head = np.zeros((13, 13, 6), dtype=np.float32)
    head[..., 0] = 5.0
    head[..., 5] = 5.0
    head[..., 1:3] = 0.5
    head[..., 3:5] = 0.02  # ~8px boxes, far apart per cell
    cfg = FacePostprocessConfig(num_cands=60)
    cands, count = face_postprocess(jnp.asarray(head), cfg)
    assert int(count) == 60
    want = oracle_face_detect(head, num_cands=60)
    assert len(want) == 60


def test_face_postprocess_empty():
    head = np.full((13, 13, 6), -10.0, dtype=np.float32)
    cfg = FacePostprocessConfig()
    cands, count = face_postprocess(jnp.asarray(head), cfg)
    assert int(count) == 0
    assert np.all(np.asarray(cands) == 0)
