"""cv2-parity tests for the device resize and the fused strict letterbox."""

import numpy as np
import pytest

import jax.numpy as jnp

from face_vijnana_yolov3_tpu.ops.resize import (
    resize_cv2_cubic,
    resize_cv2_nearest,
    letterbox_taps,
    letterbox_device_strict,
)
from face_vijnana_yolov3_tpu.ops.letterbox import letterbox_host, letterbox_geometry


@pytest.mark.parametrize(
    "h,w,oh,ow",
    [(300, 500, 243, 416), (100, 80, 416, 333), (64, 64, 64, 64),
     (7, 5, 19, 23), (50, 61, 416, 341)],
)
def test_cubic_matches_cv2(h, w, oh, ow):
    import cv2 as cv

    img = np.random.default_rng(0).uniform(size=(h, w, 3)).astype(np.float32)
    want = cv.resize(img, (ow, oh), interpolation=cv.INTER_CUBIC)
    got = np.asarray(resize_cv2_cubic(jnp.asarray(img), oh, ow))
    assert np.abs(got - want).max() < 2e-6


@pytest.mark.parametrize(
    "h,w,oh,ow",
    [(300, 500, 243, 416), (100, 80, 416, 333), (19, 23, 7, 5)],
)
def test_nearest_matches_cv2_bitexact(h, w, oh, ow):
    import cv2 as cv

    img = np.random.default_rng(1).uniform(size=(h, w, 3)).astype(np.float32)
    want = cv.resize(img, (ow, oh), interpolation=cv.INTER_NEAREST)
    got = np.asarray(resize_cv2_nearest(jnp.asarray(img), oh, ow))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("h,w", [(300, 500), (500, 300), (416, 416), (120, 97)])
def test_strict_device_letterbox_matches_host(h, w):
    rng = np.random.default_rng(2)
    img = rng.uniform(size=(h, w, 3)).astype(np.float32)
    host, geom = letterbox_host(img, 416, "cubic")

    max_h, max_w = 512, 512
    staged = np.zeros((1, max_h, max_w, 3), np.float32)
    staged[0, :h, :w] = img
    ri, rw, ci, cw = letterbox_taps(geom, max_h, max_w, 416, "cubic")
    dev = np.asarray(
        letterbox_device_strict(
            jnp.asarray(staged), jnp.asarray(ri[None]), jnp.asarray(rw[None]),
            jnp.asarray(ci[None]), jnp.asarray(cw[None]),
        )
    )[0]
    assert np.abs(dev - host).max() < 2e-6
    # Pad band exactly zero.
    if geom.pad_t:
        assert np.all(dev[: geom.pad_t] == 0)
    if geom.pad_l:
        assert np.all(dev[:, : geom.pad_l] == 0)


def test_fused_pipeline_matches_host_pipeline(tmp_path):
    """FaceDetectorPipeline device-letterbox path == host path boxes."""
    import pandas as pd
    from face_vijnana_yolov3_tpu.api.config import FdConf
    from face_vijnana_yolov3_tpu.api.face_detection import FaceDetectorPipeline
    from face_vijnana_yolov3_tpu.utils.io import imsave

    rng = np.random.default_rng(3)
    files = []
    for i, (h, w) in enumerate([(120, 160), (140, 100)]):
        fn = str(tmp_path / f"i{i}.jpg")
        imsave(fn, rng.uniform(0, 255, (h, w, 3)).astype(np.uint8))
        files.append(fn)

    conf = FdConf(weights_path="missing.weights")
    conf.nn_arch.image_size = 64
    conf.hps.face_conf_th = 0.05
    fd = FaceDetectorPipeline(conf)
    host_out = list(fd._iter_detections(files, 2, device_letterbox=False))
    dev_out = list(fd._iter_detections(files, 2, device_letterbox=True))
    assert len(host_out) == len(dev_out) == 2
    for (fn_a, _, _, boxes_a), (fn_b, _, _, boxes_b) in zip(host_out, dev_out):
        assert fn_a == fn_b
        # JPEG decode is shared; only the resize arithmetic differs (≤2e-6
        # pre-sigmoid) — box sets must agree.
        np.testing.assert_allclose(boxes_a, boxes_b, atol=1e-3)


def test_detect_batch_fused_uint8_and_uniform_geometry():
    """uint8 staged batches (device-side /255) and the uniform-geometry
    single-matrix broadcast must match the f32 stacked-matrix path."""
    from face_vijnana_yolov3_tpu.api.config import FdConf
    from face_vijnana_yolov3_tpu.api.face_detection import FaceDetectorPipeline
    from face_vijnana_yolov3_tpu.ops.letterbox import letterbox_geometry

    conf = FdConf(weights_path="missing.weights")
    conf.nn_arch.image_size = 64
    conf.hps.face_conf_th = 0.05
    fd = FaceDetectorPipeline(conf)

    rng = np.random.default_rng(5)
    h, w = 100, 140
    staged_u8 = rng.uniform(0, 255, (2, h, w, 3)).astype(np.uint8)
    geoms = [letterbox_geometry(h, w, 64)] * 2  # uniform -> broadcast branch
    c_u8, n_u8 = fd.detect_batch_fused(staged_u8, geoms)
    c_f32, n_f32 = fd.detect_batch_fused(
        staged_u8.astype(np.float32) / 255, geoms
    )
    np.testing.assert_array_equal(n_u8, n_f32)
    np.testing.assert_allclose(c_u8, c_f32, atol=1e-3)

    # mixed geometries take the stacked-matrix branch; second image smaller
    staged_mix = staged_u8.copy()
    staged_mix[1, 80:] = 0
    staged_mix[1, :, 120:] = 0
    geoms_mix = [letterbox_geometry(h, w, 64), letterbox_geometry(80, 120, 64)]
    c_mix, n_mix = fd.detect_batch_fused(staged_mix, geoms_mix)
    assert c_mix.shape == c_u8.shape and n_mix.shape == n_u8.shape


def test_detect_batch_fused_bucketing_reuses_programs():
    """Staging dims bucket to multiples of 128 and the batch pads to
    pad_batch_to: near-miss shapes share one compiled program, and the pad
    rows/areas don't change results (regression for per-chunk recompiles on
    mixed-resolution test sets)."""
    from face_vijnana_yolov3_tpu.api.config import FdConf
    from face_vijnana_yolov3_tpu.api.face_detection import FaceDetectorPipeline
    from face_vijnana_yolov3_tpu.ops.letterbox import letterbox_geometry

    conf = FdConf(weights_path="missing.weights")
    conf.nn_arch.image_size = 64
    conf.hps.face_conf_th = 0.05
    fd = FaceDetectorPipeline(conf)

    rng = np.random.default_rng(6)
    img = rng.uniform(0, 255, (100, 140, 3)).astype(np.uint8)

    staged_a = img[None]
    geoms = [letterbox_geometry(100, 140, 64)]
    c_a, n_a = fd.detect_batch_fused(staged_a, geoms, pad_batch_to=4)
    assert c_a.shape[0] == 1 and n_a.shape[0] == 1

    # Same image staged into a slightly different buffer + a remainder batch:
    # both bucket to the same (4,128,256) program — no second compile key.
    staged_b = np.zeros((2, 110, 150, 3), np.uint8)
    staged_b[0, :100, :140] = img
    staged_b[1, :100, :140] = img
    c_b, n_b = fd.detect_batch_fused(staged_b, geoms * 2, pad_batch_to=4)
    assert c_b.shape[0] == 2
    assert len(fd._fused_cache) == 1
    np.testing.assert_array_equal(n_b, [n_a[0]] * 2)
    np.testing.assert_allclose(c_b[0], c_a[0], atol=1e-3)
    np.testing.assert_allclose(c_b[1], c_a[0], atol=1e-3)


@pytest.mark.parametrize("h,w", [(300, 500), (500, 300), (120, 97)])
def test_matmul_letterbox_matches_host(h, w):
    from face_vijnana_yolov3_tpu.ops.resize import (
        letterbox_matrices,
        letterbox_device_matmul,
    )

    rng = np.random.default_rng(4)
    img = rng.uniform(size=(h, w, 3)).astype(np.float32)
    host, geom = letterbox_host(img, 416, "cubic")
    max_h, max_w = 512, 512
    staged = np.zeros((1, max_h, max_w, 3), np.float32)
    staged[0, :h, :w] = img
    rm, cm = letterbox_matrices(geom, max_h, max_w, 416)
    dev = np.asarray(
        letterbox_device_matmul(
            jnp.asarray(staged), jnp.asarray(rm[None]), jnp.asarray(cm[None]),
            precision="highest",
        )
    )[0]
    assert np.abs(dev - host).max() < 2e-6
    if geom.pad_t:
        assert np.all(dev[: geom.pad_t] == 0)
    if geom.pad_l:
        assert np.all(dev[:, : geom.pad_l] == 0)


def test_detect_batch_fused_empty_chunk():
    """An empty staged batch (n_real == 0) with pad_batch_to set must return
    empty (cands, counts), not IndexError on geoms[-1] (advisor finding)."""
    from face_vijnana_yolov3_tpu.api.config import FdConf
    from face_vijnana_yolov3_tpu.api.face_detection import FaceDetectorPipeline

    conf = FdConf(weights_path="missing.weights")
    conf.nn_arch.image_size = 64
    fd = FaceDetectorPipeline(conf)
    cands, counts = fd.detect_batch_fused(
        np.zeros((0, 100, 140, 3), np.uint8), [], pad_batch_to=4
    )
    assert cands.shape == (0, conf.hps.num_cands, 6)
    assert counts.shape == (0,)
