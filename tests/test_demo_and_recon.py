"""COCO demo CLI and reconstruction-decoder tests."""

import os

import numpy as np
import jax
import pytest

from face_vijnana_yolov3_tpu.models import darknet


def _fake_full_weights(tmp_path):
    ops = darknet.yolov3_graph()
    n = sum(
        (4 * o if bn else o) + k * k * i * o
        for _, i, o, k, _s, bn in darknet.conv_layout(ops)
    )
    rng = np.random.default_rng(0)
    path = tmp_path / "yolov3.weights"
    with open(path, "wb") as f:
        f.write(np.array([0, 2, 0], np.int32).tobytes())
        f.write(bytes(8))
        # Keep BN variances positive-ish: abs() the whole stream is harmless
        # for kernels and guarantees finite normalization.
        f.write(np.abs(rng.normal(0, 0.05, n)).astype(np.float32).tobytes())
    return str(path)


def test_preprocess_coco_geometry():
    from face_vijnana_yolov3_tpu.api.yolov3_detect import preprocess_coco

    img = np.random.default_rng(0).uniform(0, 255, (200, 400, 3)).astype(np.uint8)
    out = preprocess_coco(img, 128, 128)
    assert out.shape == (1, 128, 128, 3)
    # Gray 0.5 letterbox padding above/below.
    assert np.allclose(out[0, :30], 0.5)
    assert np.allclose(out[0, -30:], 0.5)


def test_coco_demo_cli_end_to_end(tmp_path):
    from face_vijnana_yolov3_tpu.api import yolov3_detect
    from face_vijnana_yolov3_tpu.utils.io import imsave, imread

    weights = _fake_full_weights(tmp_path)
    img_path = str(tmp_path / "scene.jpg")
    imsave(
        img_path,
        np.random.default_rng(1).uniform(0, 255, (160, 240, 3)).astype(np.uint8),
    )
    yolov3_detect.main(
        ["-w", weights, "-i", img_path, "--obj-thresh", "0.01"]
    )
    out_path = str(tmp_path / "scene_detected.jpg")
    assert os.path.exists(out_path)
    assert imread(out_path).shape == (160, 240, 3)


def test_detect_coco_shapes_small_net(tmp_path):
    from face_vijnana_yolov3_tpu.api.yolov3_detect import detect_coco

    weights = _fake_full_weights(tmp_path)
    img = np.random.default_rng(2).uniform(0, 255, (100, 150, 3)).astype(np.uint8)
    boxes, obj, classes, valid = detect_coco(
        weights, img, obj_thresh=0.3, net_size=128
    )
    assert boxes.shape == (256, 4) and classes.shape == (256, 80)
    assert obj.shape == (256,) and valid.shape == (256,)
    # Boxes are integer-valued pixel coords (trunc semantics).
    assert np.all(boxes == np.trunc(boxes))


def test_recon_graph_mirrors_trunk():
    from face_vijnana_yolov3_tpu.models.recon import recon_graph

    ops = recon_graph()
    deconvs = [op[1] for op in ops if op[0] == "deconv"]
    subtracts = sum(1 for op in ops if op[0] == "subtract")
    # Every trunk conv appears exactly once, first deconv is 73, last is 0.
    trunk_idxs = [t[0] for t in darknet.conv_layout(darknet.trunk_graph())]
    assert sorted(deconvs) == sorted(trunk_idxs)
    assert deconvs[0] == 73 and deconvs[-1] == 0
    # 1+2+8+8+4 = 23 residual blocks → 23 subtract ops.
    assert subtracts == 23
    # Reference stage order: pairs (i, i-1) — e.g. 73 then 72.
    assert deconvs[1] == 72


def test_recon_forward_roundtrip_shape():
    from face_vijnana_yolov3_tpu.models.identifier import FaceIdentifierModel
    from face_vijnana_yolov3_tpu.models.recon import FaceReconstructionModel

    idm = FaceIdentifierModel(image_size=64, dense1_dim=8)
    iparams, _ = idm.init(jax.random.PRNGKey(0))
    recon = FaceReconstructionModel(image_size=64, dense1_dim=8)
    rparams, rstate = recon.init(jax.random.PRNGKey(1), iparams)
    z = np.random.default_rng(0).normal(size=(2, 8)).astype(np.float32)
    out, _ = recon.apply(rparams, rstate, z)
    assert out.shape == (2, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_pipeline_recon_roundtrip(tmp_path, monkeypatch):
    from face_vijnana_yolov3_tpu.api.config import Conf
    from face_vijnana_yolov3_tpu.api.face_identification import (
        FaceIdentifierPipeline,
    )

    monkeypatch.chdir(tmp_path)
    conf = Conf()
    conf.fi_conf.weights_path = "missing.weights"
    conf.fi_conf.nn_arch.image_size = 64
    conf.fi_conf.nn_arch.dense1_dim = 8
    conf.fd_conf.weights_path = "missing.weights"
    conf.fd_conf.nn_arch.image_size = 64
    fi = FaceIdentifierPipeline(conf)
    fi.create_face_reconst_model()
    out = fi.reconstruct(np.random.default_rng(0).normal(size=(2, 8)).astype(np.float32))
    assert out.shape == (2, 64, 64, 3)
    # reload path (face_vijana_recon_load)
    conf.fi_conf.face_vijana_recon_load = True
    fi2 = FaceIdentifierPipeline(conf)
    fi2.create_face_reconst_model()
    np.testing.assert_allclose(
        np.asarray(fi2.recon_params["dense1_t"]["bias"]),
        np.asarray(fi.recon_params["dense1_t"]["bias"]),
    )


def test_demo_cli_save_load_and_h5_roundtrip(tmp_path, monkeypatch):
    """-s writes yolov3_model.h5 (Keras layout), -l runs from it, and the h5
    roundtrips bit-exactly vs the darknet import (reference save/load fast
    path, yolov3_detect.py:572-585)."""
    from face_vijnana_yolov3_tpu.api import yolov3_detect
    from face_vijnana_yolov3_tpu.core.keras_import import yolov3_from_keras_h5
    from face_vijnana_yolov3_tpu.core.weights import load_darknet_weights
    from face_vijnana_yolov3_tpu.utils.io import imsave, imread

    monkeypatch.chdir(tmp_path)
    weights = _fake_full_weights(tmp_path)
    img_path = str(tmp_path / "scene.jpg")
    imsave(
        img_path,
        np.random.default_rng(3).uniform(0, 255, (120, 160, 3)).astype(np.uint8),
    )
    yolov3_detect.main(["-w", weights, "-i", img_path, "-s", "1",
                        "--obj-thresh", "0.01"])
    assert os.path.exists("yolov3_model.h5")

    params, state = load_darknet_weights(weights, darknet.yolov3_graph())
    h5_params, h5_state = yolov3_from_keras_h5("yolov3_model.h5")
    for key, entry in params.items():
        for wname, arr in entry.items():
            np.testing.assert_array_equal(
                np.asarray(arr), np.asarray(h5_params[key][wname])
            )
    for key, entry in state.items():
        for wname, arr in entry.items():
            np.testing.assert_array_equal(
                np.asarray(arr), np.asarray(h5_state[key][wname])
            )

    out_path = str(tmp_path / "scene_detected.jpg")
    first = imread(out_path).copy()
    os.remove(out_path)
    # -l 1 ignores -w and loads the h5 (compiled program is cached, cheap)
    yolov3_detect.main(["-l", "1", "-i", img_path, "--obj-thresh", "0.01"])
    np.testing.assert_array_equal(imread(out_path), first)


def test_yolov3_class_detect_object(tmp_path, monkeypatch):
    """Docker-variant YOLOV3.detect_object parity
    (docker/code/yolov3_detect.py:623-668): person/bottle entropy filter,
    v1 drawing, and the [:-5] output-name arithmetic (built for '.jpeg')."""
    from face_vijnana_yolov3_tpu.api.yolov3_detect import YOLOV3
    from face_vijnana_yolov3_tpu.core.keras_import import save_yolov3_keras_h5
    from face_vijnana_yolov3_tpu.core.weights import load_darknet_weights
    from face_vijnana_yolov3_tpu.utils.io import imsave

    monkeypatch.chdir(tmp_path)
    weights = _fake_full_weights(tmp_path)
    params, state = load_darknet_weights(weights, darknet.yolov3_graph())
    save_yolov3_keras_h5(params, state, "yolov3_model.h5")

    img_path = str(tmp_path / "scene.jpeg")
    imsave(
        img_path,
        np.random.default_rng(4).uniform(0, 255, (100, 140, 3)).astype(np.uint8),
    )
    det = YOLOV3(net_size=128)
    image, boxes = det.detect_object(
        img_path, obj_thresh=0.01, cls_thresh=0.0, nms_thresh=0.45,
        human_entropy_thresh=100.0, bottle_entropy_thresh=100.0,
    )
    assert image.shape == (100, 140, 3)
    assert os.path.exists(str(tmp_path / "scene_detected.jpeg"))
    for b in boxes:
        assert b.classes.shape == (80,)

    persons = det.detect_person(
        np.asarray(image), obj_thresh=0.01, cls_thresh=0.0, nms_thresh=0.45,
        human_entropy_thresh=100.0, bottle_entropy_thresh=100.0,
    )
    assert isinstance(persons, list)
