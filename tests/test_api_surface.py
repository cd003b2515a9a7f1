"""Public API surface: everything documented in COMPONENTS.md imports."""


def test_all_public_modules_import():
    import importlib

    modules = [
        "face_vijnana_yolov3_tpu",
        "face_vijnana_yolov3_tpu.ops",
        "face_vijnana_yolov3_tpu.ops.boxes",
        "face_vijnana_yolov3_tpu.ops.letterbox",
        "face_vijnana_yolov3_tpu.ops.decode",
        "face_vijnana_yolov3_tpu.ops.nms",
        "face_vijnana_yolov3_tpu.ops.postprocess",
        "face_vijnana_yolov3_tpu.ops.similarity",
        "face_vijnana_yolov3_tpu.ops.resize",
        "face_vijnana_yolov3_tpu.ops.pallas_nms",
        "face_vijnana_yolov3_tpu.ops.pallas_front",
        "face_vijnana_yolov3_tpu.models",
        "face_vijnana_yolov3_tpu.models.darknet",
        "face_vijnana_yolov3_tpu.models.detector",
        "face_vijnana_yolov3_tpu.models.identifier",
        "face_vijnana_yolov3_tpu.models.recon",
        "face_vijnana_yolov3_tpu.models.s2d",
        "face_vijnana_yolov3_tpu.core.weights",
        "face_vijnana_yolov3_tpu.core.checkpoints",
        "face_vijnana_yolov3_tpu.core.keras_import",
        "face_vijnana_yolov3_tpu.data.uccs",
        "face_vijnana_yolov3_tpu.data.facedb",
        "face_vijnana_yolov3_tpu.data.pipeline",
        "face_vijnana_yolov3_tpu.parallel",
        "face_vijnana_yolov3_tpu.parallel.mesh",
        "face_vijnana_yolov3_tpu.train.optimizer",
        "face_vijnana_yolov3_tpu.train.trainer",
        "face_vijnana_yolov3_tpu.evals.detection",
        "face_vijnana_yolov3_tpu.evals.identification",
        "face_vijnana_yolov3_tpu.api.config",
        "face_vijnana_yolov3_tpu.api.face_detection",
        "face_vijnana_yolov3_tpu.api.face_identification",
        "face_vijnana_yolov3_tpu.api.yolov3_detect",
        "face_vijnana_yolov3_tpu.api.evaluate",
        "face_vijnana_yolov3_tpu.utils.io",
        "face_vijnana_yolov3_tpu.utils.drawing",
        "face_vijnana_yolov3_tpu.utils.box_select",
        "face_vijnana_yolov3_tpu.utils.profiling",
        "face_vijnana_yolov3_tpu.utils.runtime",
    ]
    for m in modules:
        importlib.import_module(m)


def test_tpu_compiler_options_env_and_backend(monkeypatch):
    """tpu_compiler_options: None on non-TPU backends (this suite runs CPU);
    FVY_XLA_VMEM_KIB must override/disable when a TPU backend is present."""
    from face_vijnana_yolov3_tpu.utils import runtime

    # CPU backend (conftest pins it): options must be None so the virtual-mesh
    # tests never hand TPU flags to the CPU compiler.
    assert runtime.tpu_compiler_options("serving") is None
    assert runtime.tpu_compiler_options("train") is None

    # Simulate a TPU backend to exercise the knob logic.
    import jax

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert runtime.tpu_compiler_options("serving") == {
        "xla_tpu_scoped_vmem_limit_kib": "65536"
    }
    assert runtime.tpu_compiler_options("train") == {
        "xla_tpu_scoped_vmem_limit_kib": "32768"
    }
    monkeypatch.setenv("FVY_XLA_VMEM_KIB", "12345")
    assert runtime.tpu_compiler_options("serving") == {
        "xla_tpu_scoped_vmem_limit_kib": "12345"
    }
    monkeypatch.setenv("FVY_XLA_VMEM_KIB", "0")
    assert runtime.tpu_compiler_options("serving") is None


def test_legacy_docker_flag_surface(tmp_path):
    """Docker-variant argparse flags map onto FdConf flag for flag
    (reference docker/code/face_detection.py:1135-1155; VERDICT r2 missing #3)."""
    import argparse

    import pandas as pd

    from face_vijnana_yolov3_tpu.api.face_detection import legacy_args_to_conf

    # 7 unique files -> docker batching n_files // step_per_epoch = 3
    pd.DataFrame({
        "FACE_ID": range(7), "FILE": [f"f{i}.jpg" for i in range(7)],
        "SUBJECT_ID": [1] * 7, "FACE_X": [10] * 7, "FACE_Y": [10] * 7,
        "FACE_WIDTH": [20] * 7, "FACE_HEIGHT": [20] * 7,
    }).to_csv(tmp_path / "training.csv", index=False)

    args = argparse.Namespace(
        mode="train", raw_data_path=str(tmp_path), output_file_path=None,
        image_size="416", num_filters="6", lr="0.001", beta_1="0.99",
        beta_2="0.99", decay="0.0", step_per_epoch="2", epochs="12",
        face_conf_th="0.6", nms_iou_th="0.4", num_cands="60",
        model_loading="0",
    )
    conf = legacy_args_to_conf(args)
    assert conf.mode == "train" and conf.model_loading is False
    assert conf.nn_arch.image_size == 416 and conf.nn_arch.bb_info_c_size == 6
    assert conf.hps.lr == 0.001 and conf.hps.epochs == 12
    assert conf.hps.face_conf_th == 0.6 and conf.hps.nms_iou_th == 0.4
    assert conf.hps.batch_size == 7 // 2  # docker face_detection.py:608
    assert conf.model_path == "face_detector.hd5"  # legacy artifact (:42)
    assert conf.apply_face_region_ratio is True    # RATIO_TH active (:415-422)

    # evaluate/test force model_loading=True (docker :1100,:1124)
    args.mode = "evaluate"
    args.model_loading = "0"
    conf = legacy_args_to_conf(args)
    assert conf.model_loading is True
    assert conf.test_path == str(tmp_path)


def test_legacy_main_engaged_by_mode_flag(monkeypatch):
    """main() routes --mode invocations to the legacy parser."""
    from face_vijnana_yolov3_tpu.api import face_detection as fd_mod

    seen = {}
    monkeypatch.setattr(fd_mod, "legacy_main",
                        lambda argv: seen.setdefault("argv", argv))
    fd_mod.main(["--mode", "test", "--raw_data_path", "/tmp/x"])
    assert seen["argv"][0] == "--mode"
