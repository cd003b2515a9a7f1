"""Data pipeline, config, eval-harness, and end-to-end CLI-mode tests."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from face_vijnana_yolov3_tpu.api.config import load_conf, apply_overrides, Conf
from face_vijnana_yolov3_tpu.data.uccs import build_gt_tensor, DetectionDataset
from face_vijnana_yolov3_tpu.ops.letterbox import letterbox_geometry
from face_vijnana_yolov3_tpu.evals.detection import cal_mAP_fd, map_sweep
from face_vijnana_yolov3_tpu.evals.identification import cal_acc_fi


# ------------------------------------------------------------------ config

def test_config_load_reference_schema(tmp_path):
    data = {
        "fd_conf": {
            "mode": "evaluate",
            "raw_data_path": "/data",
            "hps": {"lr": 0.001, "batch_size": 8},
            "nn_arch": {"image_size": 416},
        },
        "fi_conf": {"mode": "fid_db", "hps": {"sim_th": 0.3}},
    }
    p = tmp_path / "conf.json"
    p.write_text(json.dumps(data))
    conf = load_conf(str(p))
    assert conf.fd_conf.mode == "evaluate"
    assert conf.fd_conf.hps.lr == 0.001
    assert conf.fd_conf.hps.batch_size == 8
    assert conf.fd_conf.hps.beta_1 == 0.99  # default preserved
    assert conf.fi_conf.hps.sim_th == 0.3


def test_config_overrides():
    conf = Conf()
    apply_overrides(conf, ["fd_conf.mode=test", "fd_conf.hps.lr=0.01"])
    assert conf.fd_conf.mode == "test"
    assert conf.fd_conf.hps.lr == 0.01
    with pytest.raises(KeyError):
        apply_overrides(conf, ["fd_conf.nope=1"])


def test_cli_set_flag_forms():
    """--set works in every shell form: two tokens, --set=k=v, quoted token."""
    from face_vijnana_yolov3_tpu.api.face_detection import _parse_cli

    for argv in (
        ["--set", "fd_conf.mode=test"],          # natural two-token shell form
        ["--set=fd_conf.mode=test"],
        ["--set fd_conf.mode=test"],             # single quoted token
        ["fd_conf.mode=test"],                   # bare override
    ):
        conf_path, overrides = _parse_cli(["--conf=c.json"] + argv)
        assert conf_path == "c.json"
        assert overrides == ["fd_conf.mode=test"], argv
    with pytest.raises(SystemExit):
        _parse_cli(["--set"])


def test_prefetch_batches_propagates_worker_errors():
    """Regression: a failing make_batch used to look like normal end-of-data —
    truncated solution CSVs / silently shortened epochs."""
    from face_vijnana_yolov3_tpu.data.pipeline import prefetch_batches

    def make_batch(i):
        if i == 2:
            raise ValueError("corrupt image")
        return (np.zeros(3),)

    got = []
    with pytest.raises(ValueError, match="corrupt image"):
        for b in prefetch_batches(make_batch, 5, device_put=False):
            got.append(b)
    assert len(got) == 2  # the two good batches arrived first


# ------------------------------------------------------------------ GT tensor

def test_gt_tensor_handcrafted_square():
    df = pd.DataFrame(
        {
            "FACE_ID": [1],
            "FILE": ["a.jpg"],
            "SUBJECT_ID": [7],
            "FACE_X": [100],
            "FACE_Y": [150],
            "FACE_WIDTH": [50],
            "FACE_HEIGHT": [60],
        }
    )
    geom = letterbox_geometry(416, 416, 416)
    gt = build_gt_tensor(df, geom)
    assert gt[5, 3, 0] == 1.0 and gt[5, 3, 5] == 1.0
    assert gt[5, 3, 1] == pytest.approx((124 - 96) / 32)
    assert gt[5, 3, 2] == pytest.approx((179 - 160) / 32)
    assert gt[5, 3, 3] == pytest.approx(50 / 416)
    assert gt[5, 3, 4] == pytest.approx(60 / 416)
    assert np.count_nonzero(gt) == 6


def test_gt_tensor_landscape_pad_and_invalid_rows():
    # 800x600 landscape: pad_t from the reference math shifts y.
    df = pd.DataFrame(
        {
            "FACE_ID": [1, 2],
            "FILE": ["a.jpg", "a.jpg"],
            "SUBJECT_ID": [7, 8],
            "FACE_X": [400, -5],     # second row invalid (negative coord)
            "FACE_Y": [300, 10],
            "FACE_WIDTH": [80, 40],
            "FACE_HEIGHT": [60, 40],
        }
    )
    geom = letterbox_geometry(600, 800, 416)
    gt = build_gt_tensor(df, geom)
    # Exact reference math re-derived:
    x1, y1 = 400, 300
    x2, y2 = 400 + 80 - 1, 300 + 60 - 1
    x1_p = int(x1 / 800 * 416)
    x2_p = int(x2 / 800 * 416)
    y1_p = int(y1 / 800 * 416) + geom.pad_t
    y2_p = int(y2 / 800 * 416) + geom.pad_t
    xc, yc = (x1_p + x2_p) // 2, (y1_p + y2_p) // 2
    cx, cy = xc // 32, yc // 32
    assert gt[cy, cx, 0] == 1.0
    assert gt[cy, cx, 3] == pytest.approx(80 / 800)
    assert np.count_nonzero(gt) == 6  # invalid row contributed nothing


# ------------------------------------------------------------------ mAP harness

def _write_map_fixture(tmp_path):
    gt = pd.DataFrame(
        {
            "FACE_ID": [1, 2],
            "FILE": ["a.jpg", "a.jpg"],
            "SUBJECT_ID": [7, 8],
            "FACE_X": [10, 100],
            "FACE_Y": [10, 100],
            "FACE_WIDTH": [20, 20],
            "FACE_HEIGHT": [20, 20],
        }
    )
    gt_path = tmp_path / "validation.csv"
    gt.to_csv(gt_path, index=False)
    sol_path = tmp_path / "solution_fd.csv"
    sol_path.write_text(
        "a.jpg,10,10,20,20,0.9\n"    # IoU 1.0 with gt1
        "a.jpg,100,105,20,20,0.8\n"  # IoU 0.6 with gt2
        "a.jpg,300,300,10,10,0.7\n"  # no overlap
    )
    return str(gt_path), str(sol_path)


def test_cal_map_fd_handcrafted(tmp_path):
    gt_path, sol_path = _write_map_fixture(tmp_path)
    ps, rs, ap = cal_mAP_fd(gt_path, sol_path, 0.5)
    np.testing.assert_allclose(ps, [1.0, 1.0, 2 / 3])
    np.testing.assert_allclose(rs, [0.5, 1.0, 1.0])
    assert ap == pytest.approx(0.5, abs=1e-6)
    # At IoU 0.7 only the perfect box is TP and recall never moves past 0.5.
    ps2, rs2, ap2 = cal_mAP_fd(gt_path, sol_path, 0.7)
    np.testing.assert_allclose(rs2, [0.5, 0.5, 0.5])
    assert ap2 == pytest.approx(0.0, abs=1e-9)


def test_map_sweep_writes_h5(tmp_path, monkeypatch):
    gt_path, sol_path = _write_map_fixture(tmp_path)
    monkeypatch.chdir(tmp_path)
    ps_ls, rs_ls, map_ls = map_sweep(gt_path, sol_path)
    assert map_ls.shape == (10,)
    assert map_ls[0] == pytest.approx(0.5, abs=1e-6)
    import h5py

    with h5py.File(tmp_path / "p_r_curve.h5", "r") as f:
        assert set(f.keys()) == {"ps_ls", "rs_ls", "mAP_ls"}


def test_plot_pr_curves_renders_png(tmp_path, monkeypatch):
    """The P-R figure producer (the reference ships pics/p_v_curve.png with
    no code to regenerate it — VERDICT r4 #6): p_r_curve.h5 in, a valid PNG
    out, via both the function and the eval-CLI plot mode."""
    gt_path, sol_path = _write_map_fixture(tmp_path)
    monkeypatch.chdir(tmp_path)
    map_sweep(gt_path, sol_path)
    from face_vijnana_yolov3_tpu.evals.detection import plot_pr_curves

    out = plot_pr_curves(str(tmp_path / "p_r_curve.h5"),
                         str(tmp_path / "p_v_curve.png"))
    data = open(out, "rb").read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n" and len(data) > 5000

    from face_vijnana_yolov3_tpu.api.evaluate import main as eval_main

    eval_main(["-m", "plot_p_r_curve", "-s", str(tmp_path / "p_r_curve.h5"),
               "--plot", str(tmp_path / "cli.png")])
    assert open(tmp_path / "cli.png", "rb").read()[:8] == b"\x89PNG\r\n\x1a\n"


def test_map_empty_solution_clear_error(tmp_path):
    """A zero-row solution file (undertrained run, nothing above
    face_conf_th) must raise the documented clear ValueError, not a raw
    pandas EmptyDataError."""
    gt_path, sol_path = _write_map_fixture(tmp_path)
    open(sol_path, "w").close()
    with pytest.raises(ValueError, match="empty"):
        cal_mAP_fd(gt_path, sol_path, 0.5)


def test_cal_acc_fi_handcrafted(tmp_path):
    gt = pd.DataFrame(
        {
            "FACE_ID": [1, 2],
            "FILE": ["a.jpg", "a.jpg"],
            "SUBJECT_ID": [7, -1],
            "FACE_X": [10, 100],
            "FACE_Y": [10, 100],
            "FACE_WIDTH": [20, 20],
            "FACE_HEIGHT": [20, 20],
        }
    )
    gt_path = tmp_path / "validation.csv"
    gt.to_csv(gt_path, index=False)
    sol_path = tmp_path / "solution_fi.csv"
    sol_path.write_text(
        "a.jpg,7,10,10,20,20,0.9\n"    # matches gt1, right subject → TP
        "a.jpg,9,100,100,20,20,0.8\n"  # matches gt2 (sid -1), iou 1.0, ids differ → FP
    )
    tp, fp, tn, fn, acc = cal_acc_fi(str(gt_path), str(sol_path), 0.5)
    assert (tp, fp) == (1, 1)
    assert tn == 0 and fn == 0
    assert acc == pytest.approx(0.5)


# ------------------------------------------------------------------ end-to-end CLI modes

def _make_synthetic_testdir(tmp_path, n_images=3):
    from face_vijnana_yolov3_tpu.utils.io import imsave

    rng = np.random.default_rng(0)
    rows = []
    for i in range(n_images):
        img = (rng.uniform(0, 255, size=(240, 320, 3))).astype(np.uint8)
        name = f"img_{i}.jpg"
        imsave(str(tmp_path / name), img)
        rows.append(
            {
                "FACE_ID": i,
                "FILE": name,
                "SUBJECT_ID": i,
                "FACE_X": 50,
                "FACE_Y": 60,
                "FACE_WIDTH": 40,
                "FACE_HEIGHT": 40,
            }
        )
    pd.DataFrame(rows).to_csv(tmp_path / "validation.csv", index=False)
    pd.DataFrame(rows).to_csv(tmp_path / "training.csv", index=False)
    return tmp_path


def test_face_detection_evaluate_and_test_modes(tmp_path, monkeypatch):
    from face_vijnana_yolov3_tpu.api.face_detection import FaceDetectorPipeline
    from face_vijnana_yolov3_tpu.api.config import FdConf

    testdir = _make_synthetic_testdir(tmp_path)
    monkeypatch.chdir(tmp_path)

    conf = FdConf(
        mode="evaluate",
        test_path=str(testdir),
        output_file_path=str(tmp_path / "solution_fd.csv"),
        weights_path="does_not_exist.weights",  # random init path
    )
    conf.hps.face_conf_th = 0.05  # random trunk scores hover near 0.25
    conf.hps.batch_size = 2
    fd = FaceDetectorPipeline(conf)
    fd.evaluate()

    sol = pd.read_csv(tmp_path / "solution_fd.csv", header=None)
    assert sol.shape[1] == 6
    assert set(sol[0]) <= {f"img_{i}.jpg" for i in range(3)}
    assert (sol.groupby(0).size() <= 60).all()
    assert os.path.isdir(testdir / "results")
    assert os.path.exists(tmp_path / "ratios.csv")

    # test mode: CSV only
    conf.output_file_path = str(tmp_path / "solution_fd_test.csv")
    fd.test()
    sol2 = pd.read_csv(tmp_path / "solution_fd_test.csv", header=None)
    pd.testing.assert_frame_equal(sol, sol2)


def test_detection_dataset_batches(tmp_path):
    testdir = _make_synthetic_testdir(tmp_path)
    ds = DetectionDataset(str(testdir))
    assert len(ds) == 3
    assert ds.steps(2) == 2
    imgs, gts = ds.batch(1, 2)  # final remainder batch
    assert imgs.shape == (1, 416, 416, 3)
    assert gts.shape == (1, 13, 13, 6)
    assert gts.sum() > 0


def test_detection_dataset_sample_cache(tmp_path):
    """cache='samples' returns bit-identical batches without re-decoding."""
    from face_vijnana_yolov3_tpu.utils.io import imsave

    rng = np.random.default_rng(0)
    rows = []
    for i in range(3):
        imsave(str(tmp_path / f"f{i}.jpg"),
               rng.uniform(0, 255, (60, 80, 3)).astype(np.uint8))
        rows.append({"FACE_ID": i, "FILE": f"f{i}.jpg", "SUBJECT_ID": 1,
                     "FACE_X": 5, "FACE_Y": 5, "FACE_WIDTH": 20,
                     "FACE_HEIGHT": 20})
    pd.DataFrame(rows).to_csv(tmp_path / "training.csv", index=False)

    plain = DetectionDataset(str(tmp_path), image_size=64, grid=2)
    cached = DetectionDataset(str(tmp_path), image_size=64, grid=2,
                              cache="samples")
    im0, gt0 = plain.batch(0, 3)
    im1, gt1 = cached.batch(0, 3)
    im2, gt2 = cached.batch(0, 3)  # second epoch: served from cache
    np.testing.assert_array_equal(im0, im1)
    np.testing.assert_array_equal(gt0, gt1)
    np.testing.assert_array_equal(im1, im2)
    np.testing.assert_array_equal(gt1, gt2)
    assert len(cached._sample_cache) == 3
    with pytest.raises(ValueError):
        DetectionDataset(str(tmp_path), cache="bogus")

    # cache='disk': identical batches, persisted npz, reloaded without decode
    disk = DetectionDataset(str(tmp_path), image_size=64, grid=2,
                            cache="disk")
    im3, gt3 = disk.batch(0, 3)
    np.testing.assert_array_equal(im0, im3)
    np.testing.assert_array_equal(gt0, gt3)
    npz = tmp_path / "training.csv.samples_64.npz"
    assert npz.exists()
    # second construction must load the stack, not re-decode: poison the
    # images on disk and verify the served pixels are still the originals
    for i in range(3):
        imsave(str(tmp_path / f"f{i}.jpg"), np.zeros((60, 80, 3), np.uint8))
    disk2 = DetectionDataset(str(tmp_path), image_size=64, grid=2,
                             cache="disk")
    im4, gt4 = disk2.batch(0, 3)
    np.testing.assert_array_equal(im0, im4)
    np.testing.assert_array_equal(gt0, gt4)
    # but REWRITING the CSV (same row count) must invalidate the cache — a
    # regenerated dataset may carry different pixels/GT for the same N; the
    # poisoned all-zero images must now actually be decoded and served
    pd.DataFrame(rows).to_csv(tmp_path / "training.csv", index=False)
    disk3 = DetectionDataset(str(tmp_path), image_size=64, grid=2,
                             cache="disk")
    im5, _ = disk3.batch(0, 3)
    assert not np.array_equal(im0, im5)
    assert np.abs(im5).max() == 0.0  # the zero images, freshly decoded


def test_boundbox_compat_record():
    from face_vijnana_yolov3_tpu.ops.boxes import BoundBox

    b = BoundBox(0, 0, 10, 20, objness=0.9, classes=np.array([0.1, 0.8]))
    assert b.get_label() == 1
    assert b.get_score() == pytest.approx(0.8)
    assert b.get_relative_bb(100, 100) == (0, 0, 10, 20)
    # Score clamp at 1.0 (yolov3_detect.py:155).
    b2 = BoundBox(0, 0, 1, 1, classes=np.array([1.7]))
    assert b2.get_score() == 1.0


def test_get_person_boxes_entropy_filter():
    from face_vijnana_yolov3_tpu.ops.boxes import BoundBox
    from face_vijnana_yolov3_tpu.utils.box_select import get_person_boxes

    labels = ["person", "bottle", "cat"]
    sharp = np.array([0.97, 0.02, 0.01])   # low entropy person
    flat = np.array([0.4, 0.3, 0.3])       # high entropy person
    cat = np.array([0.1, 0.1, 0.8])
    boxes = [BoundBox(0, 0, 1, 1, classes=c) for c in (sharp, flat, cat)]
    got = get_person_boxes(boxes, labels, 0.5, human_entropy_thresh=0.5,
                           bottle_entropy_thresh=0.5)
    assert got == [boxes[0]]


def test_apply_face_region_ratio_docker_variant(tmp_path):
    from face_vijnana_yolov3_tpu.api.config import FdConf
    from face_vijnana_yolov3_tpu.api.face_detection import FaceDetectorPipeline

    conf = FdConf(weights_path="missing.weights", apply_face_region_ratio=True)
    conf.nn_arch.image_size = 64
    fd = FaceDetectorPipeline(conf)
    boxes = np.array([[0.0, 0.0, 10.0, 100.0],    # w/h = 0.1 < 0.8 → widen x
                      [0.0, 0.0, 100.0, 10.0],    # h/w = 0.1 < 0.8 → widen y
                      [0.0, 0.0, 50.0, 50.0]])    # square untouched
    out = fd._correct_aspect_ratio(boxes)
    assert out[0, 2] == pytest.approx(0.8 * 100.0)
    assert out[1, 3] == pytest.approx(0.8 * 100.0)
    np.testing.assert_array_equal(out[2], boxes[2])
