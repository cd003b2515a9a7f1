"""Device ROI pipeline tests: crop-window semantics, crop parity vs the host
cv2 path, and the fused identify path vs the host `_identify_image`."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from face_vijnana_yolov3_tpu.ops.letterbox import letterbox_host
from face_vijnana_yolov3_tpu.ops.roi import (
    build_roi_taps,
    roi_letterbox_device,
    roi_window,
)


@pytest.mark.parametrize(
    "l,t,r,b",
    [
        (40, 30, 110, 90),   # interior box
        (1, 1, 50, 40),      # top-left corner (t-1 = l-1 = 0)
        (0, 30, 110, 90),    # l == 0: off-by-one wraps (reference quirk)
        (40, 0, 110, 90),    # t == 0: same on rows
        (150, 100, 200, 150),  # flush with the far edges (r=W, b=H)
        (40, 30, 40, 90),    # zero width
        (40, 30, 110, 30),   # zero height
        (0, 0, 0, 0),        # degenerate all-zero box
        (199, 149, 200, 150),  # 1x1 crop at the far corner
    ],
)
def test_roi_window_matches_numpy_slice(l, t, r, b):
    """roi_window reproduces `image[(t-1):(b-1), (l-1):(r-1)]` exactly,
    including the python-slice wrap when t or l is 0
    (reference face_identification.py:872-877)."""
    H, W = 150, 200
    img = np.arange(H * W).reshape(H, W)
    want = img[(t - 1):(b - 1), (l - 1):(r - 1)]
    y0, x0, ch, cw = roi_window(l, t, r, b, H, W)
    assert (max(ch, 0), max(cw, 0)) == want.shape
    if ch > 0 and cw > 0:
        np.testing.assert_array_equal(img[y0:y0 + ch, x0:x0 + cw], want)


def test_roi_crops_match_host_crop_letterbox():
    """Device crop+cubic-letterbox == host numpy-slice + letterbox_host.

    The host path runs /255 in f64 then cv2 f64 cubic; the device path is f32
    HIGHEST matmuls — parity is float-rounding level.
    """
    rng = np.random.default_rng(7)
    H, W, S = 150, 200, 64
    img = rng.integers(0, 256, size=(H, W, 3)).astype(np.uint8)
    boxes = np.array(
        [
            [40, 30, 110, 90, 0.9],
            [1, 1, 50, 40, 0.8],
            [150, 100, 200, 150, 0.7],
            [10, 90, 180, 100, 0.6],   # wide/thin: portrait letterbox branch
            [199, 149, 200, 150, 0.5],  # 1x1 crop
        ],
        np.float64,
    )
    keep, ri, rw, ci, cw = build_roi_taps(boxes, H, W, S)
    assert keep == [0, 1, 2, 3, 4]
    crops = np.asarray(
        jax.jit(roi_letterbox_device)(
            jnp.asarray(img), jnp.asarray(ri), jnp.asarray(rw),
            jnp.asarray(ci), jnp.asarray(cw),
        )
    )
    for j, k in enumerate(keep):
        l, t, r, b = (int(boxes[k, 0]), int(boxes[k, 1]),
                      int(boxes[k, 2]), int(boxes[k, 3]))
        host_crop = img[(t - 1):(b - 1), (l - 1):(r - 1), :]
        want, _ = letterbox_host(host_crop / 255, S, "cubic")
        assert np.abs(crops[j] - want).max() < 3e-6


def test_roi_staged_padding_does_not_change_crops():
    """Taps carry zero weight outside the image region, so staging-buffer
    padding (the 128-multiple bucketing) must not leak garbage into crops.
    Only f32 summation ORDER changes with the staging width (the resize
    matmul reduces over the full staged axis), so parity is ~1-ulp, not
    bit-exact."""
    rng = np.random.default_rng(11)
    H, W, S = 150, 200, 64
    img = rng.integers(0, 256, size=(H, W, 3)).astype(np.uint8)
    boxes = np.array([[40, 30, 110, 90, 0.9]], np.float64)
    _, ri, rw, ci, cw = build_roi_taps(boxes, H, W, S)

    def run(staged):
        return np.asarray(
            jax.jit(roi_letterbox_device)(
                jnp.asarray(staged), jnp.asarray(ri), jnp.asarray(rw),
                jnp.asarray(ci), jnp.asarray(cw),
            )
        )

    tight = run(img)
    staged = np.full((256, 256, 3), 255, np.uint8)  # garbage in the pad
    staged[:H, :W] = img
    padded = run(staged)
    np.testing.assert_allclose(tight, padded, atol=1e-6)


def test_roi_windowed_matches_absolute():
    """The dynamic-slice windowed fast path == full-staged-axis path (same
    weights; only the f32 reduction span differs), incl. origin clamping for
    crops flush against the staged edges."""
    from face_vijnana_yolov3_tpu.ops.roi import (
        build_roi_windows,
        roi_letterbox_device_windowed,
        stack_roi_taps,
        window_bucket,
    )

    rng = np.random.default_rng(13)
    H, W, S = 300, 400, 64
    img = rng.integers(0, 256, size=(H, W, 3)).astype(np.uint8)
    boxes = np.array(
        [
            [40, 30, 110, 90, 0.9],
            [350, 250, 400, 300, 0.8],   # flush with the far staged corner
            [1, 1, 120, 40, 0.7],
            [10, 10, 300, 290, 0.6],     # big crop: forces a large window
        ],
        np.float64,
    )
    keep, wins = build_roi_windows(boxes, H, W)
    assert len(keep) == 4
    ri_a, rw_a, ci_a, cw_a = stack_roi_taps(wins, S)
    absolute = np.asarray(
        jax.jit(roi_letterbox_device)(
            jnp.asarray(img), jnp.asarray(ri_a), jnp.asarray(rw_a),
            jnp.asarray(ci_a), jnp.asarray(cw_a),
        )
    )
    wh = window_bucket(max(w[2] for w in wins), H)
    ww = window_bucket(max(w[3] for w in wins), W)
    assert (wh, ww) == (300, 400)  # the big crop caps at the staged dims
    origins = np.array(
        [[0, min(y0, H - wh), min(x0, W - ww)] for y0, x0, _, _ in wins],
        np.int32,
    )
    ri, rw, ci, cw = stack_roi_taps(wins, S, origins[:, 1:])
    windowed = np.asarray(
        jax.jit(
            lambda im, og, a, b, c, d: roi_letterbox_device_windowed(
                im, og, a, b, c, d, window_h=wh, window_w=ww
            )
        )(jnp.asarray(img[None]), jnp.asarray(origins), jnp.asarray(ri),
          jnp.asarray(rw), jnp.asarray(ci), jnp.asarray(cw))
    )
    np.testing.assert_allclose(windowed, absolute, atol=1e-6)

    # small-window case: only small crops → 128-bucket windows
    small = [wins[0], wins[1]]
    wh2 = window_bucket(max(w[2] for w in small), H)
    ww2 = window_bucket(max(w[3] for w in small), W)
    assert (wh2, ww2) == (128, 128)
    origins2 = np.array(
        [[0, min(y0, H - wh2), min(x0, W - ww2)] for y0, x0, _, _ in small],
        np.int32,
    )
    ri2, rw2, ci2, cw2 = stack_roi_taps(small, S, origins2[:, 1:])
    windowed2 = np.asarray(
        jax.jit(
            lambda im, og, a, b, c, d: roi_letterbox_device_windowed(
                im, og, a, b, c, d, window_h=wh2, window_w=ww2
            )
        )(jnp.asarray(img[None]), jnp.asarray(origins2), jnp.asarray(ri2),
          jnp.asarray(rw2), jnp.asarray(ci2), jnp.asarray(cw2))
    )
    np.testing.assert_allclose(windowed2, absolute[:2], atol=1e-6)


def _fi_pipeline(tmp_path, image_size=64):
    from face_vijnana_yolov3_tpu.api.config import Conf
    from face_vijnana_yolov3_tpu.api.face_identification import (
        FaceIdentifierPipeline,
    )

    conf = Conf()
    conf.fi_conf.raw_data_path = str(tmp_path)
    conf.fi_conf.weights_path = "missing.weights"
    conf.fi_conf.nn_arch.image_size = image_size
    conf.fi_conf.nn_arch.dense1_dim = 8
    conf.fi_conf.hps.sim_th = 10.0
    conf.fd_conf.weights_path = "missing.weights"
    conf.fd_conf.nn_arch.image_size = image_size
    return FaceIdentifierPipeline(conf)


def test_identify_image_device_matches_host(tmp_path):
    """The fused device identify path makes the same decisions as the host
    path: same boxes kept/skipped, same subjects, distances at float parity."""
    fi = _fi_pipeline(tmp_path)
    rng = np.random.default_rng(3)
    image_o = rng.integers(0, 256, size=(150, 200, 3)).astype(np.uint8)
    boxes = np.array(
        [
            [40.0, 30.0, 110.0, 90.0, 0.9],
            [0.0, 0.0, 0.0, 0.0, 0.5],    # degenerate: skipped by both
            [0.0, 30.0, 110.0, 90.0, 0.4],  # l==0 wrap: empty, skipped
            [5.0, 10.0, 60.0, 70.0, 0.8],
        ],
        np.float64,
    )
    # Registry anchored at crop 0's embedding so matches are deterministic.
    crop = image_o[29:89, 39:109, :]
    lb, _ = letterbox_host(crop / 255, 64, "cubic")
    emb = fi.embed(lb[None].astype(np.float32))[0]
    reg = np.stack([emb, -emb]).astype(np.float32)
    subject_ids = ["alice", "bob"]

    host_rows = fi._identify_image(image_o, boxes, subject_ids, reg)
    dev_rows = fi._identify_image_device(
        image_o, boxes, subject_ids, jnp.asarray(reg)
    )
    assert [r["box_index"] for r in dev_rows] == [
        r["box_index"] for r in host_rows
    ]
    assert [r["subject_id"] for r in dev_rows] == [
        r["subject_id"] for r in host_rows
    ]
    for hr, dr in zip(host_rows, dev_rows):
        for key in ("xmin", "ymin", "xmax", "ymax", "score"):
            assert hr[key] == dr[key]

    # sim gate applies identically
    fi.hps["sim_th"] = -1.0
    assert fi._identify_image_device(
        image_o, boxes, subject_ids, jnp.asarray(reg)
    ) == []


def test_identify_image_device_staged_reuse(tmp_path):
    """Passing the detect pass's device staging row (staged_dev) gives the
    same rows as letting the ROI path stage the image itself."""
    fi = _fi_pipeline(tmp_path)
    rng = np.random.default_rng(9)
    image_o = rng.integers(0, 256, size=(150, 200, 3)).astype(np.uint8)
    boxes = np.array(
        [[40.0, 30.0, 110.0, 90.0, 0.9], [5.0, 10.0, 60.0, 70.0, 0.8]],
        np.float64,
    )
    reg = np.eye(2, 8, dtype=np.float32)
    reg_dev = jnp.asarray(reg)
    rows_a = fi._identify_image_device(image_o, boxes, ["a", "b"], reg_dev)
    staged = np.zeros((256, 256, 3), np.uint8)
    staged[:150, :200] = image_o
    rows_b = fi._identify_image_device(
        image_o, boxes, ["a", "b"], reg_dev, staged_dev=jnp.asarray(staged)
    )
    assert [r["subject_id"] for r in rows_a] == [
        r["subject_id"] for r in rows_b
    ]
    assert [r["box_index"] for r in rows_a] == [
        r["box_index"] for r in rows_b
    ]


def test_identify_chunk_device_matches_per_image_host(tmp_path):
    """The chunk-fused device path (all images' ROIs in shared program calls)
    makes the same per-image decisions as the host path, with mixed image
    sizes and a boxless image in the chunk."""
    fi = _fi_pipeline(tmp_path)
    rng = np.random.default_rng(17)
    images = [
        rng.integers(0, 256, size=(150, 200, 3)).astype(np.uint8),
        rng.integers(0, 256, size=(100, 120, 3)).astype(np.uint8),
        rng.integers(0, 256, size=(130, 90, 3)).astype(np.uint8),
    ]
    boxes_list = [
        np.array([[40, 30, 110, 90, 0.9], [5, 10, 60, 70, 0.8]], np.float64),
        np.zeros((0, 5), np.float64),  # no detections on this image
        np.array([[10, 20, 70, 100, 0.7], [0, 0, 0, 0, 0.1]], np.float64),
    ]
    reg = np.eye(3, 8, dtype=np.float32)
    ids = ["a", "b", "c"]
    dev = fi._identify_chunk_device(
        images, boxes_list, ids, jnp.asarray(reg)
    )
    host = [fi._identify_image(im, bx, ids, reg)
            for im, bx in zip(images, boxes_list)]
    assert len(dev) == 3
    for d_rows, h_rows in zip(dev, host):
        assert [r["box_index"] for r in d_rows] == [
            r["box_index"] for r in h_rows
        ]
        assert [r["subject_id"] for r in d_rows] == [
            r["subject_id"] for r in h_rows
        ]


def test_identify_device_roi_bucketing(tmp_path):
    """More ROIs than the largest embed bucket still processes every box
    (chunked program reuse), and padding ROIs never leak into results."""
    fi = _fi_pipeline(tmp_path)
    rng = np.random.default_rng(5)
    image_o = rng.integers(0, 256, size=(300, 300, 3)).astype(np.uint8)
    n = 70  # > _EMBED_BUCKETS[-1] = 64
    boxes = np.zeros((n, 5))
    for k in range(n):
        x = 1 + (k * 3) % 200
        y = 1 + (k * 7) % 200
        boxes[k] = [x, y, x + 40, y + 40, 0.9]
    reg = np.eye(2, 8, dtype=np.float32)
    rows = fi._identify_image_device(
        image_o, boxes, ["a", "b"], jnp.asarray(reg)
    )
    assert len(rows) == n
    host = fi._identify_image(image_o, boxes, ["a", "b"], reg)
    assert [r["subject_id"] for r in rows] == [r["subject_id"] for r in host]


def test_identify_chunk_device_int8_calibration(tmp_path):
    """precision='int8' through the device ROI path: the calibration branch
    (real crops via the one-off letterbox program) fires once, and the fused
    int8 embed makes decisions matching the host int8 path."""
    from face_vijnana_yolov3_tpu.api.config import Conf
    from face_vijnana_yolov3_tpu.api.face_identification import (
        FaceIdentifierPipeline,
    )

    conf = Conf()
    conf.fi_conf.raw_data_path = str(tmp_path)
    conf.fi_conf.weights_path = "missing.weights"
    conf.fi_conf.nn_arch.image_size = 64
    conf.fi_conf.nn_arch.dense1_dim = 8
    conf.fi_conf.hps.sim_th = 10.0
    conf.fd_conf.weights_path = "missing.weights"
    conf.fd_conf.nn_arch.image_size = 64
    fi = FaceIdentifierPipeline(conf, precision="int8")
    rng = np.random.default_rng(21)
    image_o = rng.integers(0, 256, size=(150, 200, 3)).astype(np.uint8)
    boxes = np.array(
        [[40, 30, 110, 90, 0.9], [5, 10, 60, 70, 0.8]], np.float64
    )
    reg = np.eye(2, 8, dtype=np.float32)
    assert fi._q_embed is None
    dev = fi._identify_chunk_device(
        [image_o], [boxes], ["a", "b"], jnp.asarray(reg)
    )[0]
    assert fi._q_embed is not None  # calibration branch fired
    host = fi._identify_image(image_o, boxes, ["a", "b"], reg)
    assert [r["subject_id"] for r in dev] == [r["subject_id"] for r in host]
    assert [r["box_index"] for r in dev] == [r["box_index"] for r in host]


def test_run_identification_device_roi_e2e(tmp_path, monkeypatch):
    """FVY_DEVICE_ROI=1 drives evaluate end-to-end through the fused path and
    produces the same solution_fi.csv as the host path."""
    import os
    import pandas as pd
    from face_vijnana_yolov3_tpu.data.facedb import create_subject_db_uccs
    from face_vijnana_yolov3_tpu.utils.io import imsave

    rng = np.random.default_rng(0)
    train_dir = tmp_path / "training"
    train_dir.mkdir()
    rows = []
    fid = 0
    for s in range(2):
        for k in range(3):
            name = f"s{s}_{k}.jpg"
            imsave(str(train_dir / name),
                   rng.integers(0, 256, (120, 160, 3)).astype(np.uint8))
            rows.append({"FACE_ID": fid, "FILE": name, "SUBJECT_ID": s + 1,
                         "FACE_X": 30 + s * 5, "FACE_Y": 20,
                         "FACE_WIDTH": 60, "FACE_HEIGHT": 50})
            fid += 1
    df = pd.DataFrame(rows)
    df.to_csv(train_dir / "training.csv", index=False)
    df.to_csv(train_dir / "validation.csv", index=False)
    monkeypatch.chdir(tmp_path)
    create_subject_db_uccs(str(tmp_path), image_size=64)

    from face_vijnana_yolov3_tpu.api.config import Conf
    from face_vijnana_yolov3_tpu.api.face_identification import (
        FaceIdentifierPipeline,
    )

    conf = Conf()
    conf.fi_conf.raw_data_path = str(tmp_path)
    conf.fi_conf.test_path = str(train_dir)
    conf.fi_conf.weights_path = "missing.weights"
    conf.fi_conf.nn_arch.image_size = 64
    conf.fi_conf.nn_arch.dense1_dim = 8
    conf.fi_conf.hps.sim_th = 10.0
    conf.fd_conf.weights_path = "missing.weights"
    conf.fd_conf.nn_arch.image_size = 64
    conf.fd_conf.hps.face_conf_th = 0.05
    conf.fd_conf.hps.batch_size = 4

    fi = FaceIdentifierPipeline(conf)
    fi.make_facial_ids_db()
    fi.register_facial_ids()

    conf.fi_conf.output_file_path = str(tmp_path / "sol_host.csv")
    fi.test()
    host_sol = open(tmp_path / "sol_host.csv").read()

    conf.fi_conf.output_file_path = str(tmp_path / "sol_dev.csv")
    monkeypatch.setenv("FVY_DEVICE_ROI", "1")
    fi.test()
    dev_sol = open(tmp_path / "sol_dev.csv").read()

    def parse(s):
        return [ln.split(",")[:2] for ln in s.strip().splitlines()]

    # file + subject decisions identical; coords are copied from the same
    # detect output so the full rows match too
    assert parse(dev_sol) == parse(host_sol)
    assert dev_sol == host_sol

    # With the device letterbox on too, the ROI path reuses the detect
    # staging buffer (one upload per image); boxes come from the device
    # letterbox (float-parity, not bit-exact), so compare decisions only.
    conf.fi_conf.output_file_path = str(tmp_path / "sol_dev2.csv")
    monkeypatch.setenv("FVY_DEVICE_LETTERBOX", "1")
    fi.test()
    dev2_sol = open(tmp_path / "sol_dev2.csv").read()
    assert parse(dev2_sol) == parse(host_sol)


def test_identify_chunk_device_float_originals_match_host(tmp_path):
    """Float (non-uint8) originals take the f32 self-staging branch, which
    must pre-normalize by /255 — the host twin always divides the raw crop by
    255, while the device resize treats f32 staged pixels as already in
    [0,1]. Regression: un-normalized float staging embedded 255x-bright crops
    and silently diverged from the host rows."""
    fi = _fi_pipeline(tmp_path)
    rng = np.random.default_rng(21)
    image_u8 = rng.integers(0, 256, size=(150, 200, 3)).astype(np.uint8)
    image_f = image_u8.astype(np.float64)  # raw 0-255 values, float dtype
    boxes = np.array(
        [[40.0, 30.0, 110.0, 90.0, 0.9], [5.0, 10.0, 60.0, 70.0, 0.8]],
        np.float64,
    )
    # Registry anchored at crop 0's true embedding; a tight sim gate then
    # DISCRIMINATES a mis-scaled crop (its embedding rotates away and the
    # distance blows past the gate).
    crop = image_u8[29:89, 39:109, :]
    lb, _ = letterbox_host(crop / 255, 64, "cubic")
    emb = fi.embed(lb[None].astype(np.float32))[0]
    reg = np.stack([emb, -emb]).astype(np.float32)
    ids = ["alice", "bob"]
    fi.hps["sim_th"] = 0.2

    host = fi._identify_image(image_f, boxes, ids, reg)
    assert host, "anchored registry must keep at least crop 0 on the host"
    dev = fi._identify_chunk_device(
        [image_f], [boxes], ids, jnp.asarray(reg)
    )[0]
    assert [r["box_index"] for r in dev] == [r["box_index"] for r in host]
    assert [r["subject_id"] for r in dev] == [r["subject_id"] for r in host]


def test_roi_taps_degenerate_aspect_raises():
    """Crops thinner than image_size:1 letterbox to a zero-size resize target;
    the host path (and the reference) crash in cv2.resize. The tap builder
    must refuse them too instead of silently emitting a black crop."""
    from face_vijnana_yolov3_tpu.ops.roi import roi_letterbox_taps

    with pytest.raises(ValueError, match="degenerate crop aspect"):
        roi_letterbox_taps(0, 0, 1, 490, 64)  # 1x490 -> new_h = 0
    with pytest.raises(ValueError, match="degenerate crop aspect"):
        roi_letterbox_taps(0, 0, 490, 1, 64)  # 490x1 -> new_w = 0
    # sane aspect still fine
    ri, rw, ci, cw = roi_letterbox_taps(0, 0, 30, 40, 64)
    assert ri.shape == (64, 4) and cw.shape == (64, 4)


def test_identify_roi_dp_matches_single_device():
    """parallel/serving.identify_roi_dp: the fused crop→embed→match program
    sharded ROI-data-parallel over the 8-device mesh matches the
    single-device program (idx exactly, dist at f32-summation tolerance —
    the GSPMD-partitioned program's fusion choices may differ)."""
    from face_vijnana_yolov3_tpu.models.identifier import FaceIdentifierModel
    from face_vijnana_yolov3_tpu.ops.roi import (
        build_roi_windows,
        pack_roi_operands,
        stack_roi_taps,
        window_bucket,
    )
    from face_vijnana_yolov3_tpu.parallel import mesh as mesh_lib
    from face_vijnana_yolov3_tpu.parallel.serving import identify_roi_dp

    size, staged_hw = 64, 128
    idm = FaceIdentifierModel(image_size=size, dense1_dim=16)
    iparams, istate = idm.init(jax.random.PRNGKey(3))
    ifolded = idm.fold(iparams, istate)

    def embed_fn(crops):
        return idm.embed_folded(ifolded, crops, compute_dtype=jnp.float32)

    rng = np.random.default_rng(5)
    staged = rng.integers(0, 255, (2, staged_hw, staged_hw, 3), dtype=np.uint8)
    boxes = np.asarray(
        [[8, 10, 70, 80], [30, 20, 110, 100], [5, 40, 60, 120], [50, 8, 120, 60]],
        np.float32,
    )
    owners, wins = [], []
    for j in range(2):
        keep_j, wins_j = build_roi_windows(boxes, staged_hw, staged_hw)
        owners += [(j, k) for k in keep_j]
        wins += wins_j
    wh = window_bucket(max(w[2] for w in wins), staged_hw)
    ww = window_bucket(max(w[3] for w in wins), staged_hw)
    origins = np.zeros((len(wins), 3), np.int32)
    for r, ((j, _k), (y0, x0, _ch, _cw)) in enumerate(zip(owners, wins)):
        origins[r] = (j, min(y0, staged_hw - wh), min(x0, staged_hw - ww))
    ri, rw, ci, cw = stack_roi_taps(wins, size, origins[:, 1:])
    bucket = len(wins)  # 8 ROIs = divisible by the 'data' axis (4)
    packed = pack_roi_operands(origins, ri, rw, ci, cw).reshape(1, bucket, -1)
    reg = rng.normal(size=(6, 16)).astype(np.float32)
    reg /= np.linalg.norm(reg, axis=-1, keepdims=True)

    mesh = mesh_lib.make_mesh(8, model_axis=2)
    from jax.sharding import NamedSharding, PartitionSpec as P

    fn_dp = identify_roi_dp(embed_fn, mesh, image_size=size,
                            window_h=wh, window_w=ww)
    out_dp = np.asarray(fn_dp(
        jax.device_put(jnp.asarray(staged), mesh_lib.replicated(mesh)),
        jax.device_put(jnp.asarray(packed),
                       NamedSharding(mesh, P(None, "data", None))),
        jax.device_put(jnp.asarray(reg), mesh_lib.replicated(mesh)),
    ))
    mesh1 = mesh_lib.make_mesh(1)
    fn_1 = identify_roi_dp(embed_fn, mesh1, image_size=size,
                           window_h=wh, window_w=ww)
    out_1 = np.asarray(fn_1(jnp.asarray(staged), jnp.asarray(packed),
                            jnp.asarray(reg)))
    assert out_dp.shape == (1, bucket, 2)
    np.testing.assert_array_equal(out_dp[..., 0], out_1[..., 0])
    np.testing.assert_allclose(out_dp[..., 1], out_1[..., 1], atol=1e-4)
