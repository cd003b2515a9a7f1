"""Serialized serving artifacts (core/export.py + api/export_cli.py).

The deploy contract: an exported artifact, deserialized with nothing but
jax, must reproduce the live pipeline's fused serving outputs bit-exactly,
across batch sizes (symbolic batch dim), and carry a self-describing header.
"""

import json
import os
import struct

import numpy as np
import pytest

from face_vijnana_yolov3_tpu.api.config import Conf
from face_vijnana_yolov3_tpu.core.export import (
    DEFAULT_PLATFORMS,
    load_artifact,
)


def _fd_conf(size=64):
    conf = Conf()
    conf.fd_conf.weights_path = "missing.weights"
    conf.fd_conf.nn_arch.image_size = size
    conf.fd_conf.hps.face_conf_th = 0.05
    return conf


@pytest.fixture(scope="module")
def fd_pipeline():
    from face_vijnana_yolov3_tpu.api.face_detection import FaceDetectorPipeline

    return FaceDetectorPipeline(_fd_conf().fd_conf, precision="float32")


def _rand_images(n, size=64, seed=0):
    return np.random.default_rng(seed).random((n, size, size, 3)).astype(
        np.float32
    )


def test_export_detector_symbolic_batch_roundtrip(fd_pipeline, tmp_path):
    from face_vijnana_yolov3_tpu.core.export import export_detector

    path = str(tmp_path / "detect.fvyx")
    header = export_detector(fd_pipeline, path, platforms=("cpu",))
    assert header["kind"] == "face_detect"
    assert header["batch"] is None

    art = load_artifact(path)
    assert art.meta["precision"] == "float32"
    assert art.meta["num_cands"] == fd_pipeline._pp_cfg.num_cands
    # One artifact serves multiple batch sizes (symbolic dim) and matches
    # the live fused program bit-exactly.
    for n, seed in ((2, 0), (1, 1)):
        x = _rand_images(n, seed=seed)
        cands_live, counts_live = fd_pipeline.detect_batch(x)
        cands_art, counts_art = art(x)
        np.testing.assert_array_equal(np.asarray(cands_art), cands_live)
        np.testing.assert_array_equal(np.asarray(counts_art), counts_live)


def test_export_detector_int8_requires_calibration(tmp_path):
    from face_vijnana_yolov3_tpu.api.face_detection import FaceDetectorPipeline
    from face_vijnana_yolov3_tpu.core.export import export_detector

    fd = FaceDetectorPipeline(_fd_conf().fd_conf, precision="int8")
    with pytest.raises(RuntimeError, match="calibrate_int8"):
        export_detector(fd, str(tmp_path / "x.fvyx"), platforms=("cpu",))


def test_export_detector_int8_roundtrip(tmp_path):
    from face_vijnana_yolov3_tpu.api.face_detection import FaceDetectorPipeline
    from face_vijnana_yolov3_tpu.core.export import export_detector

    fd = FaceDetectorPipeline(_fd_conf().fd_conf, precision="int8")
    fd.calibrate_int8(_rand_images(4, seed=2))
    path = str(tmp_path / "detect_int8.fvyx")
    export_detector(fd, path, batch=2, platforms=("cpu",))

    art = load_artifact(path)
    assert art.meta["precision"] == "int8"
    assert art.meta["batch"] == 2
    x = _rand_images(2, seed=3)
    cands_live, counts_live = fd.detect_batch(x)
    cands_art, counts_art = art(x)
    np.testing.assert_array_equal(np.asarray(cands_art), cands_live)
    np.testing.assert_array_equal(np.asarray(counts_art), counts_live)


def test_export_embedder_with_registry(tmp_path):
    from face_vijnana_yolov3_tpu.api.face_identification import (
        FaceIdentifierPipeline,
    )
    from face_vijnana_yolov3_tpu.core.export import export_embedder
    from face_vijnana_yolov3_tpu.ops.similarity import match_embeddings

    conf = _fd_conf()
    conf.fi_conf.weights_path = "missing.weights"
    conf.fi_conf.nn_arch.image_size = 64
    conf.fi_conf.nn_arch.dense1_dim = 8
    fi = FaceIdentifierPipeline(conf, precision="float32")

    path = str(tmp_path / "identify.fvyx")
    header = export_embedder(fi, path, platforms=("cpu",))
    assert header["kind"] == "face_embed" and header["with_registry"]

    art = load_artifact(path)
    crops = _rand_images(3, seed=4)
    # Bit-exact vs the same unpadded program (fi.embed() bucket-pads, which
    # is allclose but not a like-for-like batch shape).
    import jax

    emb_live = np.asarray(jax.jit(fi._embed_raw(0))(crops))
    np.testing.assert_allclose(fi.embed(crops), emb_live, rtol=0, atol=1e-5)
    # Registry is a runtime argument: two different registry sizes through
    # the same artifact (both dims symbolic).
    for n_reg, seed in ((5, 5), (2, 6)):
        reg = np.random.default_rng(seed).random((n_reg, 8)).astype(np.float32)
        emb_art, idx_art, dist_art = art(crops, reg)
        np.testing.assert_array_equal(np.asarray(emb_art), emb_live)
        idx_live, dist_live = match_embeddings(emb_live, reg)
        np.testing.assert_array_equal(np.asarray(idx_art), np.asarray(idx_live))
        np.testing.assert_array_equal(
            np.asarray(dist_art), np.asarray(dist_live)
        )


def test_export_embedder_int8_requires_calibration(tmp_path):
    from face_vijnana_yolov3_tpu.api.face_identification import (
        FaceIdentifierPipeline,
    )
    from face_vijnana_yolov3_tpu.core.export import export_embedder

    conf = _fd_conf()
    conf.fi_conf.weights_path = "missing.weights"
    conf.fi_conf.nn_arch.image_size = 64
    fi = FaceIdentifierPipeline(conf, precision="int8")
    with pytest.raises(RuntimeError, match="calibration"):
        export_embedder(fi, str(tmp_path / "x.fvyx"), platforms=("cpu",))


def test_load_artifact_rejects_non_artifact(tmp_path):
    bad = tmp_path / "bad.fvyx"
    bad.write_bytes(b"NOPE" + b"\x00" * 16)
    with pytest.raises(ValueError, match="not a FVYX"):
        load_artifact(str(bad))


def test_load_artifact_rejects_newer_format(tmp_path):
    hdr = json.dumps({"format_version": 99}).encode()
    p = tmp_path / "future.fvyx"
    p.write_bytes(b"FVYX" + struct.pack("<I", len(hdr)) + hdr + b"")
    with pytest.raises(ValueError, match="newer"):
        load_artifact(str(p))


def test_default_platforms_include_tpu_and_cpu():
    assert "tpu" in DEFAULT_PLATFORMS and "cpu" in DEFAULT_PLATFORMS


def test_export_cli_detect(tmp_path, monkeypatch):
    from face_vijnana_yolov3_tpu.api import export_cli
    from face_vijnana_yolov3_tpu.api.config import conf_to_dict

    conf_path = tmp_path / "conf.json"
    conf_path.write_text(json.dumps(conf_to_dict(_fd_conf())))
    out = tmp_path / "cli_detect.fvyx"
    monkeypatch.chdir(tmp_path)
    export_cli.main([
        "--conf", str(conf_path), "--target", "detect",
        "--out", str(out), "--batch", "1", "--platforms", "cpu",
    ])
    assert os.path.exists(out)
    art = load_artifact(str(out))
    assert art.meta["kind"] == "face_detect"
    # serving default with no --precision and no --calib: guarded bf16
    # (int8-auto is the headline default when calibration data is given)
    assert art.meta["precision"] == "bfloat16"
    cands, counts = art(_rand_images(1, seed=7))
    assert np.asarray(cands).shape[0] == 1 and np.asarray(counts).shape == (1,)


def test_export_cli_rejects_bad_target(tmp_path):
    from face_vijnana_yolov3_tpu.api import export_cli

    with pytest.raises(SystemExit, match="--target"):
        export_cli.main(["--target", "bogus", "--out", str(tmp_path / "x")])


def test_artifact_loads_in_fresh_process_without_axon(tmp_path):
    """Deploy-host story (VERDICT r2 #8): a .fvyx artifact must load and run
    on a FRESH python process with plain CPU jax — no axon TPU plugin on the
    path, no framework package imports on the serving host beyond
    core/export.py's loader. Also reports cold-load and first-call latency
    (the numbers STATUS.md's export section quotes come from
    scripts/probe_export_latency.py on the real chip)."""
    import subprocess
    import sys

    from face_vijnana_yolov3_tpu.api.face_detection import FaceDetectorPipeline
    from face_vijnana_yolov3_tpu.core.export import export_detector

    fd = FaceDetectorPipeline(_fd_conf().fd_conf, precision="float32")
    path = str(tmp_path / "fresh.fvyx")
    export_detector(fd, path, platforms=("cpu",))
    imgs = _rand_images(2)
    ref_cands, ref_counts = load_artifact(path)(imgs)
    np.save(tmp_path / "imgs.npy", imgs)
    np.save(tmp_path / "ref_cands.npy", np.asarray(ref_cands))
    np.save(tmp_path / "ref_counts.npy", np.asarray(ref_counts))

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()}
    # Strip the axon plugin: the serving host only has jax + the repo.
    env["PYTHONPATH"] = repo
    env.pop("JAX_PLATFORMS", None)
    script = f"""
import time
t0 = time.perf_counter()
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from face_vijnana_yolov3_tpu.core.export import load_artifact
art = load_artifact({path!r})
t_load = time.perf_counter() - t0
imgs = np.load({str(tmp_path / 'imgs.npy')!r})
t1 = time.perf_counter()
cands, counts = art(imgs)
np.asarray(counts)
t_first = time.perf_counter() - t1
assert np.array_equal(np.asarray(cands), np.load({str(tmp_path / 'ref_cands.npy')!r}))
assert np.array_equal(np.asarray(counts), np.load({str(tmp_path / 'ref_counts.npy')!r}))
print(f"FRESH_OK load={{t_load:.2f}}s first_call={{t_first:.2f}}s")
"""
    out = subprocess.run(
        [sys.executable, "-c", script], env=env, capture_output=True,
        text=True, timeout=600,
    )
    assert out.returncode == 0, f"fresh-process load failed:\n{out.stderr}"
    assert "FRESH_OK" in out.stdout, out.stdout


def test_export_cli_int8_selfcheck_fallback(tmp_path, monkeypatch):
    """Auto-picked int8 falls back to guarded bf16 when the calibration
    self-check fails (int8 damage no bf16 tail covers — PROFILE.md r3);
    an EXPLICIT --precision int8 is honored with a warning."""
    from face_vijnana_yolov3_tpu.api import export_cli
    from face_vijnana_yolov3_tpu.api.config import conf_to_dict
    from face_vijnana_yolov3_tpu.api.face_detection import FaceDetectorPipeline

    orig_calibrate = FaceDetectorPipeline.calibrate_int8

    def bad_calibrate(self, images, percentile=None):
        # real calibration, then simulate a checkpoint whose int8 head
        # never approaches f32 at any tail depth
        orig_calibrate(self, images, percentile=percentile)
        self.int8_calib_err = 0.5
        self.int8_tail_chosen = 8

    monkeypatch.setattr(FaceDetectorPipeline, "calibrate_int8",
                        bad_calibrate, raising=True)

    conf_path = tmp_path / "conf.json"
    conf_path.write_text(json.dumps(conf_to_dict(_fd_conf())))
    import numpy as np
    from PIL import Image

    for i in range(3):
        Image.fromarray(
            (np.random.default_rng(i).random((64, 64, 3)) * 255).astype(
                np.uint8)
        ).save(tmp_path / f"c{i}.jpg")

    out = tmp_path / "auto.fvyx"
    export_cli.main([
        "--conf", str(conf_path), "--target", "detect", "--out", str(out),
        "--calib", str(tmp_path / "*.jpg"), "--batch", "1",
        "--platforms", "cpu",
    ])
    art = load_artifact(str(out))
    assert art.meta["precision"] == "bfloat16"  # fell back

    out2 = tmp_path / "explicit.fvyx"
    export_cli.main([
        "--conf", str(conf_path), "--target", "detect", "--out", str(out2),
        "--precision", "int8", "--calib", str(tmp_path / "*.jpg"),
        "--batch", "1", "--platforms", "cpu",
    ])
    art2 = load_artifact(str(out2))
    assert art2.meta["precision"] == "int8"  # honored despite the warning


def test_fi_int8_flip_rate_gate():
    """export_cli._fi_int8_flip_rate (the FI int8 export gate, VERDICT r3
    #4): each int8 calibration-crop embedding must nearest-match its own
    f32 twin. Distinct random crops on a random-weight trunk stay separated
    (rate ~0); a pipeline whose embeddings are permuted flips every match
    (rate 1)."""
    import numpy as np

    from face_vijnana_yolov3_tpu.api.config import Conf
    from face_vijnana_yolov3_tpu.api.export_cli import _fi_int8_flip_rate
    from face_vijnana_yolov3_tpu.api.face_identification import (
        FaceIdentifierPipeline,
    )

    conf = Conf()
    for c in (conf.fi_conf, conf.fd_conf):
        c.weights_path = "missing.weights"
        c.nn_arch.image_size = 64
    conf.fi_conf.nn_arch.dense1_dim = 8
    rng = np.random.default_rng(0)
    calib = rng.uniform(0, 1, (6, 64, 64, 3)).astype(np.float32)

    fi8 = FaceIdentifierPipeline(conf, precision="int8")
    rate = _fi_int8_flip_rate(fi8, conf, calib)
    assert 0.0 <= rate <= 1.0
    assert rate <= 0.05  # random-weight PTQ noise far below crop separation

    class Permuted:
        def __init__(self, fi):
            self.fi = fi

        def embed(self, x):
            return np.roll(self.fi.embed(x), 1, axis=0)

    assert _fi_int8_flip_rate(Permuted(fi8), conf, calib) == 1.0
