"""Keras-h5 importer tests and checkpoint-resume (model_loading) semantics."""

import os

import numpy as np
import jax
import pytest

from face_vijnana_yolov3_tpu.models import darknet


def _write_keras_style_h5(path, layout, extra=()):
    """Emulate the reference's Keras 2.2.4 model h5: datasets named
    '<layer>/<weight>:0' nested under model_weights/<group>/."""
    import h5py

    rng = np.random.default_rng(0)
    arrays = {}
    with h5py.File(path, "w") as f:
        mw = f.create_group("model_weights")
        base = mw.create_group("base")  # nested sub-model, like the reference
        for idx, in_c, out_c, k, _s, bn in layout:
            g = base.create_group(f"conv_{idx}")
            kern = rng.normal(0, 0.1, (k, k, in_c, out_c)).astype(np.float32)
            g.create_dataset(f"conv_{idx}/kernel:0".split("/")[-1], data=kern)
            arrays[f"conv_{idx}/kernel:0"] = kern
            if bn:
                b = base.create_group(f"bnorm_{idx}")
                for wname in ("gamma", "beta", "moving_mean", "moving_variance"):
                    arr = rng.uniform(0.5, 1.5, out_c).astype(np.float32)
                    b.create_dataset(f"{wname}:0", data=arr)
                    arrays[f"bnorm_{idx}/{wname}:0"] = arr
            else:
                arr = rng.normal(0, 0.1, out_c).astype(np.float32)
                g.create_dataset("bias:0", data=arr)
                arrays[f"conv_{idx}/bias:0"] = arr
        for name, shape in extra:
            layer, wname = name.split("/")
            g = mw.require_group(layer)
            arr = rng.normal(0, 0.1, shape).astype(np.float32)
            g.create_dataset(wname, data=arr)
            arrays[name] = arrays.get(name, arr)
    return arrays


def test_detector_from_keras_h5(tmp_path):
    from face_vijnana_yolov3_tpu.core.keras_import import detector_from_keras_h5

    layout = darknet.conv_layout(darknet.trunk_graph())
    path = str(tmp_path / "face_detector.h5")
    arrays = _write_keras_style_h5(
        path, layout,
        extra=[("output/kernel:0", (3, 3, 1024, 6)), ("output/bias:0", (6,))],
    )
    params, state = detector_from_keras_h5(path)
    np.testing.assert_array_equal(
        np.asarray(params["conv_0"]["kernel"]), arrays["conv_0/kernel:0"]
    )
    np.testing.assert_array_equal(
        np.asarray(state["bnorm_12"]["mean"]), arrays["bnorm_12/moving_mean:0"]
    )
    assert params["head"]["kernel"].shape == (3, 3, 1024, 6)
    # Wrong weight names must raise, not silently zero-fill.
    with pytest.raises(KeyError):
        from face_vijnana_yolov3_tpu.core.keras_import import (
            identifier_from_keras_h5,
        )

        identifier_from_keras_h5(path)  # no dense1 in this file


def test_yolov3_from_keras_h5(tmp_path):
    from face_vijnana_yolov3_tpu.core.keras_import import yolov3_from_keras_h5

    layout = darknet.conv_layout(darknet.yolov3_graph())
    path = str(tmp_path / "yolov3_model.h5")
    _write_keras_style_h5(path, layout)
    params, state = yolov3_from_keras_h5(path)
    assert params["conv_105"]["kernel"].shape == (1, 1, 256, 255)
    assert "bias" in params["conv_81"]
    assert "bnorm_81" not in params


def test_model_loading_resume_roundtrip(tmp_path, monkeypatch):
    """train → checkpoint → model_loading=true restores params AND opt state."""
    from face_vijnana_yolov3_tpu.api.config import FdConf
    from face_vijnana_yolov3_tpu.api.face_detection import FaceDetectorPipeline
    from face_vijnana_yolov3_tpu.data.uccs import DetectionDataset
    import pandas as pd
    from face_vijnana_yolov3_tpu.utils.io import imsave

    rng = np.random.default_rng(0)
    rows = []
    for i in range(2):
        name = f"t{i}.jpg"
        imsave(str(tmp_path / name),
               rng.uniform(0, 255, (100, 120, 3)).astype(np.uint8))
        rows.append({"FACE_ID": i, "FILE": name, "SUBJECT_ID": 1,
                     "FACE_X": 20, "FACE_Y": 20, "FACE_WIDTH": 40,
                     "FACE_HEIGHT": 40})
    pd.DataFrame(rows).to_csv(tmp_path / "training.csv", index=False)
    monkeypatch.chdir(tmp_path)

    conf = FdConf(
        raw_data_path=str(tmp_path),
        weights_path="missing.weights",
        model_path=str(tmp_path / "fd_ckpt"),
    )
    conf.nn_arch.image_size = 64
    conf.hps.epochs = 1
    conf.hps.batch_size = 2
    fd = FaceDetectorPipeline(conf)
    fd.train()
    assert os.path.isdir(tmp_path / "fd_ckpt")

    conf.model_loading = True
    fd2 = FaceDetectorPipeline(conf)
    np.testing.assert_array_equal(
        np.asarray(fd2.params["head"]["kernel"]),
        np.asarray(fd.params["head"]["kernel"]),
    )
    assert fd2.opt_state is not None
    # Adam moments restored (non-zero after a step).
    mu = fd2.opt_state["mu"] if isinstance(fd2.opt_state, dict) else fd2.opt_state.mu
    head_mu = mu["head"]["kernel"]
    assert np.abs(np.asarray(head_mu)).sum() > 0
    # And training continues from the restored state without error.
    losses = fd2.train()
    assert np.isfinite(losses).all()


def test_pipeline_loads_reference_keras_h5(tmp_path):
    """model_loading with a .h5 path routes through the Keras importer."""
    from face_vijnana_yolov3_tpu.api.config import FdConf
    from face_vijnana_yolov3_tpu.api.face_detection import FaceDetectorPipeline

    layout = darknet.conv_layout(darknet.trunk_graph())
    path = str(tmp_path / "face_detector.h5")
    arrays = _write_keras_style_h5(
        path, layout,
        extra=[("output/kernel:0", (3, 3, 1024, 6)), ("output/bias:0", (6,))],
    )
    conf = FdConf(model_loading=True, model_path=path)
    fd = FaceDetectorPipeline(conf)
    np.testing.assert_array_equal(
        np.asarray(fd.params["conv_0"]["kernel"]), arrays["conv_0/kernel:0"]
    )
    np.testing.assert_array_equal(
        np.asarray(fd.params["head"]["kernel"]), arrays["output/kernel:0"]
    )


def test_save_detector_keras_h5_roundtrip(tmp_path):
    """Exporter writes the reference's face_detector.h5 artifact; our own
    importer reads back the identical tree (kernel/bias/BN params+state)."""
    from face_vijnana_yolov3_tpu.core.keras_import import (
        detector_from_keras_h5, save_detector_keras_h5,
    )
    from face_vijnana_yolov3_tpu.models.detector import FaceDetectorModel

    model = FaceDetectorModel()
    params, state = model.init(jax.random.PRNGKey(0))
    path = str(tmp_path / "face_detector.h5")
    save_detector_keras_h5(params, state, path)
    params2, state2 = detector_from_keras_h5(path)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        params, params2)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        state, state2)


def test_save_identifier_keras_h5_roundtrip(tmp_path):
    from face_vijnana_yolov3_tpu.core.keras_import import (
        identifier_from_keras_h5, save_identifier_keras_h5,
    )
    from face_vijnana_yolov3_tpu.models.identifier import FaceIdentifierModel

    model = FaceIdentifierModel(image_size=64)
    params, state = model.init(jax.random.PRNGKey(0))
    path = str(tmp_path / "face_identifier.h5")
    save_identifier_keras_h5(params, state, path)
    params2, _ = identifier_from_keras_h5(path)
    np.testing.assert_array_equal(np.asarray(params["dense1"]["kernel"]),
                                  np.asarray(params2["dense1"]["kernel"]))
    np.testing.assert_array_equal(np.asarray(params["conv_50"]["kernel"]),
                                  np.asarray(params2["conv_50"]["kernel"]))


def test_train_with_h5_model_path_exports_keras_artifact(tmp_path):
    """mode=train with model_path=face_detector.h5 produces the reference's
    artifact (face_detection.py:630) and evaluates/loads from it."""
    from face_vijnana_yolov3_tpu.api.config import FdConf
    from face_vijnana_yolov3_tpu.api.face_detection import FaceDetectorPipeline
    from face_vijnana_yolov3_tpu.utils.io import imsave
    import pandas as pd

    rng = np.random.default_rng(0)
    rows = []
    for i in range(2):
        name = f"t{i}.jpg"
        imsave(str(tmp_path / name),
               rng.uniform(0, 255, (100, 120, 3)).astype(np.uint8))
        rows.append({"FACE_ID": i, "FILE": name, "SUBJECT_ID": 1,
                     "FACE_X": 20, "FACE_Y": 20, "FACE_WIDTH": 40,
                     "FACE_HEIGHT": 40})
    pd.DataFrame(rows).to_csv(tmp_path / "training.csv", index=False)

    h5_path = str(tmp_path / "face_detector.h5")
    conf = FdConf(
        raw_data_path=str(tmp_path),
        weights_path="missing.weights",
        model_path=h5_path,
    )
    conf.nn_arch.image_size = 64
    conf.hps.epochs = 1
    conf.hps.batch_size = 2
    fd = FaceDetectorPipeline(conf)
    fd.train()
    assert os.path.exists(h5_path)
    assert os.path.isdir(h5_path + ".orbax")  # resumable optimizer state

    conf.model_loading = True
    fd2 = FaceDetectorPipeline(conf)
    np.testing.assert_array_equal(
        np.asarray(fd2.params["head"]["kernel"]),
        np.asarray(fd.params["head"]["kernel"]),
    )


def test_darknet_build_caches_yolov3_base_h5(tmp_path, monkeypatch):
    """Building from the darknet binary writes the reference's
    yolov3_base.h5 cache (face_detection.py:598); a later FD run with
    yolov3_base_model_load and the FI pipeline (verbatim-copied YOLOV3Base,
    face_identification.py:404) both load the identical trunk from it."""
    from face_vijnana_yolov3_tpu.api.config import Conf, FdConf
    from face_vijnana_yolov3_tpu.api.face_detection import FaceDetectorPipeline
    from face_vijnana_yolov3_tpu.api.face_identification import (
        FaceIdentifierPipeline,
    )
    from face_vijnana_yolov3_tpu.models import darknet as dk

    monkeypatch.chdir(tmp_path)
    # trunk-sized fake darknet binary (header + exact float count)
    n = 0
    for _idx, in_c, out_c, k, _s, bn in dk.conv_layout(dk.trunk_graph()):
        n += out_c * (4 if bn else 1) + k * k * in_c * out_c
    rng = np.random.default_rng(7)
    with open(tmp_path / "yolov3.weights", "wb") as f:
        f.write(np.array([0, 2, 0], dtype=np.int32).tobytes())
        f.write(np.zeros(8, dtype=np.uint8).tobytes())
        f.write(rng.normal(size=n).astype(np.float32).tobytes())

    conf = FdConf(weights_path=str(tmp_path / "yolov3.weights"))
    conf.nn_arch.image_size = 64
    fd = FaceDetectorPipeline(conf)
    assert os.path.exists("yolov3_base.h5")

    conf2 = FdConf(weights_path="missing.weights",
                   yolov3_base_model_load=True)
    conf2.nn_arch.image_size = 64
    fd2 = FaceDetectorPipeline(conf2)
    np.testing.assert_array_equal(
        np.asarray(fd.params["conv_73"]["kernel"]),
        np.asarray(fd2.params["conv_73"]["kernel"]))

    c = Conf()
    c.fi_conf.weights_path = "missing.weights"
    c.fi_conf.yolov3_base_model_load = True
    c.fi_conf.nn_arch.image_size = 64
    c.fi_conf.nn_arch.dense1_dim = 8
    c.fd_conf.weights_path = "missing.weights"
    c.fd_conf.nn_arch.image_size = 64
    fi = FaceIdentifierPipeline(c)
    np.testing.assert_array_equal(
        np.asarray(fd.params["conv_73"]["kernel"]),
        np.asarray(fi.params["conv_73"]["kernel"]))
    assert fi.params["dense1"]["kernel"].shape[-1] == 8
