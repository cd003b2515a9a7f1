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
