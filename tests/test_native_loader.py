"""Native C++ JPEG loader: build, decode parity vs PIL, pipeline integration."""

import numpy as np
import pytest

from face_vijnana_yolov3_tpu.data import native_loader as nl


pytestmark = pytest.mark.skipif(
    not nl.native_available(), reason="g++/libjpeg unavailable"
)


def _make_jpegs(tmp_path, specs):
    from PIL import Image

    rng = np.random.default_rng(0)
    paths = []
    for i, (h, w) in enumerate(specs):
        p = str(tmp_path / f"img_{i}.jpg")
        Image.fromarray(rng.uniform(0, 255, (h, w, 3)).astype(np.uint8)).save(
            p, quality=90
        )
        paths.append(p)
    return paths


def test_jpeg_size_and_decode_parity_with_pil(tmp_path):
    from PIL import Image

    paths = _make_jpegs(tmp_path, [(120, 160), (90, 200)])
    assert nl.jpeg_size(paths[0]) == (120, 160)
    staged, dims = nl.decode_batch_staged(paths)
    assert staged.shape == (2, 120, 200, 3)
    np.testing.assert_array_equal(dims, [[120, 160], [90, 200]])
    for k, p in enumerate(paths):
        pil = np.asarray(Image.open(p).convert("RGB"))
        nat = staged[k, : dims[k, 0], : dims[k, 1]]
        np.testing.assert_array_equal(nat, pil)  # same libjpeg → bit-identical
    # padding region untouched (zeros)
    assert np.all(staged[1, 90:] == 0)


def test_decode_batch_missing_file_raises(tmp_path):
    paths = _make_jpegs(tmp_path, [(60, 60)])
    with pytest.raises(IOError):
        nl.decode_batch_staged(paths + [str(tmp_path / "nope.jpg")],
                               max_h=60, max_w=60)


def test_pipeline_native_path_matches_host(tmp_path):
    from face_vijnana_yolov3_tpu.api.config import FdConf
    from face_vijnana_yolov3_tpu.api.face_detection import FaceDetectorPipeline

    paths = _make_jpegs(tmp_path, [(120, 160), (140, 100)])
    conf = FdConf(weights_path="missing.weights")
    conf.nn_arch.image_size = 64
    conf.hps.face_conf_th = 0.05
    fd = FaceDetectorPipeline(conf)
    host_out = list(fd._iter_detections(paths, 2, device_letterbox=False))
    nat_out = list(fd._iter_detections(paths, 2, device_letterbox=True))
    assert len(nat_out) == 2
    for (fa, _, _, ba), (fb, _, _, bb) in zip(host_out, nat_out):
        assert fa == fb
        np.testing.assert_allclose(ba, bb, atol=1e-3)


def _make_smooth_jpeg(tmp_path, h, w, name="smooth.jpg", seed=3):
    from PIL import Image

    rng = np.random.default_rng(seed)
    cell = 16
    base = rng.uniform(50, 210, (h // cell + 1, w // cell + 1, 3))
    img = np.kron(base, np.ones((cell, cell, 1)))[:h, :w]
    p = str(tmp_path / name)
    Image.fromarray(np.clip(img, 0, 255).astype(np.uint8)).save(p, quality=92)
    return p


def test_scaled_decode_dims_and_content(tmp_path):
    """DCT-domain scaled decode: dims = ceil(orig*M/8) (turbo) or the
    power-of-two fallback, content ~ a box-downscale of the full decode."""
    import cv2

    p = _make_smooth_jpeg(tmp_path, 720, 1280)
    staged, dec, orig = nl.decode_batch_staged_scaled([p], target=416)
    np.testing.assert_array_equal(orig, [[720, 1280]])
    h, w = int(dec[0, 0]), int(dec[0, 1])
    assert max(h, w) >= 416  # downscale-only guarantee
    assert max(h, w) < 1280  # actually scaled
    m = nl.pick_scale_num(720, 1280, 416)
    if nl._supports_fractional_scales():
        assert (h, w) == ((720 * m + 7) // 8, (1280 * m + 7) // 8)
    full, fdims = nl.decode_batch_staged([p])
    ref = cv2.resize(
        full[0, :720, :1280].astype(np.float64), (w, h),
        interpolation=cv2.INTER_AREA,
    )
    got = staged[0, :h, :w].astype(np.float64)
    assert np.abs(ref - got).mean() < 6.0  # DCT downscale ≈ box filter


def test_scaled_decode_detect_close_to_full(tmp_path):
    """End-to-end: fd.test() with FVY_JPEG_SCALED_DECODE produces the same
    letterboxed tensor up to resampling noise — verified at the fused-detect
    head level (boxes from random weights are too degenerate to compare)."""
    import jax.numpy as jnp

    from face_vijnana_yolov3_tpu.api.config import FdConf
    from face_vijnana_yolov3_tpu.api.face_detection import FaceDetectorPipeline
    from face_vijnana_yolov3_tpu.ops.letterbox import letterbox_geometry

    p = _make_smooth_jpeg(tmp_path, 360, 640)
    conf = FdConf(weights_path="missing.weights")
    conf.nn_arch.image_size = 64
    conf.hps.face_conf_th = 0.05
    fd = FaceDetectorPipeline(conf)

    staged_full, fdims = nl.decode_batch_staged([p])
    geom = letterbox_geometry(360, 640, 64)
    c_full, n_full = fd.detect_batch_fused(staged_full, [geom])

    staged_s, dec, orig = nl.decode_batch_staged_scaled([p], target=64)
    assert max(dec[0]) < 200  # heavily scaled for a 64 target
    c_s, n_s = fd.detect_batch_fused(staged_s, [geom], dec_dims=dec)
    # same candidate structure; scores close despite the resampled source
    np.testing.assert_array_equal(n_full, n_s)
    if int(n_full[0]):
        k = int(n_full[0])
        np.testing.assert_allclose(
            c_full[0, :k, 5], c_s[0, :k, 5], atol=0.05
        )


def test_scaled_decode_streaming_test_mode(tmp_path, monkeypatch):
    """fd.test() end-to-end with the env gate on: runs the native scaled
    path and writes the same CSV schema."""
    import pandas as pd

    from face_vijnana_yolov3_tpu.api.config import FdConf
    from face_vijnana_yolov3_tpu.api.face_detection import FaceDetectorPipeline

    for i in range(3):
        _make_smooth_jpeg(tmp_path, 360, 640, name=f"s_{i}.jpg", seed=i)
    monkeypatch.setenv("FVY_DEVICE_LETTERBOX", "1")
    monkeypatch.setenv("FVY_JPEG_SCALED_DECODE", "1")
    conf = FdConf(weights_path="missing.weights")
    conf.nn_arch.image_size = 64
    conf.hps.face_conf_th = 0.05
    conf.hps.batch_size = 2
    conf.test_path = str(tmp_path)
    conf.output_file_path = str(tmp_path / "solution_fd.csv")
    fd = FaceDetectorPipeline(conf)
    fd.test()
    sol = pd.read_csv(conf.output_file_path, header=None)
    assert sol.shape[1] == 6
    # coords are in ORIGINAL image coords despite the scaled decode
    assert (sol[1] <= 640).all() and (sol[2] <= 360).all()
