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
