"""Face-identification stack tests: subject DB, triplets, registry, e2e modes."""

import os
import pickle

import numpy as np
import pandas as pd
import pytest

from face_vijnana_yolov3_tpu.api.config import Conf
from face_vijnana_yolov3_tpu.ops.similarity import match_embeddings


def test_match_embeddings_argmin_and_distance():
    import jax.numpy as jnp

    reg = np.eye(4, dtype=np.float32)  # 4 one-hot registry entries
    q = np.array([[0.9, 0.1, 0, 0], [0, 0, 0.2, 0.98]], np.float32)
    idx, dist = match_embeddings(jnp.asarray(q), jnp.asarray(reg))
    idx, dist = np.asarray(idx), np.asarray(dist)
    assert list(idx) == [0, 3]
    want0 = np.linalg.norm(q[0] - reg[0])
    assert dist[0] == pytest.approx(want0, rel=1e-5)


def _make_uccs_tree(tmp_path, n_subjects=2, per_subject=3, img_hw=(120, 160)):
    """raw_data_path/training/{training.csv, *.jpg} with GT face boxes."""
    from face_vijnana_yolov3_tpu.utils.io import imsave

    rng = np.random.default_rng(0)
    train_dir = tmp_path / "training"
    train_dir.mkdir()
    rows = []
    fid = 0
    for s in range(n_subjects):
        for k in range(per_subject):
            name = f"s{s}_{k}.jpg"
            img = rng.uniform(0, 255, size=(*img_hw, 3)).astype(np.uint8)
            imsave(str(train_dir / name), img)
            rows.append(
                {
                    "FACE_ID": fid,
                    "FILE": name,
                    "SUBJECT_ID": s + 1,
                    "FACE_X": 30 + s * 5,
                    "FACE_Y": 20,
                    "FACE_WIDTH": 60,
                    "FACE_HEIGHT": 50,
                }
            )
            fid += 1
    pd.DataFrame(rows).to_csv(train_dir / "training.csv", index=False)
    return str(tmp_path)


def test_create_subject_db_uccs(tmp_path, monkeypatch):
    from face_vijnana_yolov3_tpu.data.facedb import create_subject_db_uccs

    raw = _make_uccs_tree(tmp_path)
    monkeypatch.chdir(tmp_path)
    db = create_subject_db_uccs(raw, image_size=64)
    assert db.shape[0] == 6
    assert set(db["subject_id"]) == {1, 2}
    faces = os.listdir(os.path.join(raw, "subject_faces"))
    assert len(faces) == 6
    from face_vijnana_yolov3_tpu.utils.io import imread

    face = imread(os.path.join(raw, "subject_faces", faces[0]))
    assert face.shape == (64, 64, 3)
    assert os.path.exists(tmp_path / "subject_image_db.csv")
    # crop w/h recorded pre-letterbox: slice (l-1):(r-1) of a 60-wide box = 59
    assert set(db["w"]) == {59} and set(db["h"]) == {49}


def test_triplet_dataset_pairs(tmp_path, monkeypatch):
    from face_vijnana_yolov3_tpu.data.facedb import (
        create_subject_db_uccs,
        TripletDataset,
    )

    raw = _make_uccs_tree(tmp_path)
    monkeypatch.chdir(tmp_path)
    create_subject_db_uccs(raw, image_size=64)
    ds = TripletDataset(raw, rng=np.random.default_rng(0))
    # 2 subjects x C(3,2)=3 pairs each = 6 triplets.
    assert len(ds) == 6
    db = pd.read_csv("subject_image_db.csv").iloc[:, 1:]
    for a, p, n in ds.img_triplet_pairs:
        assert db.loc[a, "subject_id"] == db.loc[p, "subject_id"]
        assert db.loc[n, "subject_id"] != db.loc[a, "subject_id"]
    assert os.path.exists("img_triplet_pairs.pickle")
    # Cache reload path.
    ds2 = TripletDataset(raw, load_flag=True)
    assert ds2.img_triplet_pairs == ds.img_triplet_pairs
    a, p, n = ds.batch(0, 4)
    assert a.shape == (4, 64, 64, 3) and a.dtype == np.float32
    assert a.max() <= 1.0


def _fi_conf(tmp_path, raw):
    conf = Conf()
    conf.fi_conf.raw_data_path = raw
    conf.fi_conf.test_path = str(tmp_path / "training")
    conf.fi_conf.output_file_path = str(tmp_path / "solution_fi.csv")
    conf.fi_conf.weights_path = "missing.weights"
    conf.fi_conf.nn_arch.image_size = 64
    conf.fi_conf.nn_arch.dense1_dim = 8
    conf.fi_conf.hps.sim_th = 10.0  # accept everything (random embeddings)
    conf.fd_conf.weights_path = "missing.weights"
    conf.fd_conf.nn_arch.image_size = 64
    conf.fd_conf.hps.face_conf_th = 0.05
    conf.fd_conf.hps.batch_size = 4
    return conf


def test_fid_db_registry_and_identify_e2e(tmp_path, monkeypatch):
    from face_vijnana_yolov3_tpu.api.face_identification import (
        FaceIdentifierPipeline,
    )
    from face_vijnana_yolov3_tpu.data.facedb import create_subject_db_uccs

    raw = _make_uccs_tree(tmp_path)
    monkeypatch.chdir(tmp_path)
    create_subject_db_uccs(raw, image_size=64)

    conf = _fi_conf(tmp_path, raw)
    fi = FaceIdentifierPipeline(conf)

    # fid_db mode
    fi.make_facial_ids_db()
    import h5py

    with h5py.File("subject_facial_ids.h5", "r") as f:
        keys = list(f.keys())
        assert len(keys) == 6
        emb = f[keys[0]][()]
        assert emb.shape == (8,)
        assert f[keys[0]].attrs["subject_id"] in (1, 2)

    # registry
    registry = fi.register_facial_ids()
    assert set(registry.keys()) == {1, 2}
    with open("ref_facial_id_db.pickle", "rb") as f:
        reloaded = pickle.load(f)
    np.testing.assert_allclose(reloaded[1], registry[1])

    # evaluate mode end-to-end (validation.csv = training.csv schema)
    pd.read_csv(os.path.join(raw, "training", "training.csv")).to_csv(
        os.path.join(raw, "training", "validation.csv"), index=False
    )
    fi.evaluate()
    assert os.path.exists(tmp_path / "solution_fi.csv")
    sol = open(tmp_path / "solution_fi.csv").read().strip()
    if sol:  # random detector may or may not produce usable crops
        df = pd.read_csv(tmp_path / "solution_fi.csv", header=None)
        assert df.shape[1] == 7
        assert set(df[1]) <= {1, 2}
    assert os.path.isdir(os.path.join(raw, "training", "results_fi"))


def test_embed_bucketing(tmp_path):
    from face_vijnana_yolov3_tpu.api.face_identification import (
        FaceIdentifierPipeline,
    )

    conf = _fi_conf(tmp_path, str(tmp_path))
    fi = FaceIdentifierPipeline(conf)
    rng = np.random.default_rng(0)
    for n in (1, 3, 5):
        out = fi.embed(rng.uniform(size=(n, 64, 64, 3)).astype(np.float32))
        assert out.shape == (n, 8)
    # Padding must not change real rows' embeddings.
    x = rng.uniform(size=(3, 64, 64, 3)).astype(np.float32)
    e3 = fi.embed(x)
    e4 = fi.embed(np.concatenate([x, x[:1]]))
    np.testing.assert_allclose(e3, e4[:3], atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("precision", ["float32", "bfloat16"])
def test_identifier_training_smoke(tmp_path, monkeypatch, precision):
    """Both precisions: f32 strict and bf16 mixed (which also exercises the
    bf16 host->device batch upload cast in train_identifier)."""
    from face_vijnana_yolov3_tpu.api.face_identification import (
        FaceIdentifierPipeline,
    )
    from face_vijnana_yolov3_tpu.data.facedb import create_subject_db_uccs

    raw = _make_uccs_tree(tmp_path, n_subjects=2, per_subject=2)
    monkeypatch.chdir(tmp_path)
    create_subject_db_uccs(raw, image_size=64)
    conf = _fi_conf(tmp_path, raw)
    conf.fi_conf.hps.epochs = 1
    conf.fi_conf.hps.batch_size = 2
    conf.fi_conf.model_path = str(tmp_path / "fi_ckpt")
    fi = FaceIdentifierPipeline(conf, precision=precision)
    losses = fi.train()
    assert np.isfinite(losses).all()
    assert fi.hps["step"] == 1
    assert os.path.isdir(tmp_path / "fi_ckpt")


def test_identifier_train_h5_model_path_exports_keras_artifact(
        tmp_path, monkeypatch):
    """mode=train with model_path=face_identifier.h5 produces the reference's
    artifact (face_identification.py:643) plus the resumable .orbax sibling,
    and a fresh pipeline loads from the h5 (FD twin lives in
    tests/test_import_and_resume.py)."""
    from face_vijnana_yolov3_tpu.api.face_identification import (
        FaceIdentifierPipeline,
    )
    from face_vijnana_yolov3_tpu.data.facedb import create_subject_db_uccs

    raw = _make_uccs_tree(tmp_path, n_subjects=2, per_subject=2)
    monkeypatch.chdir(tmp_path)
    create_subject_db_uccs(raw, image_size=64)
    conf = _fi_conf(tmp_path, raw)
    conf.fi_conf.hps.epochs = 1
    conf.fi_conf.hps.batch_size = 2
    h5_path = str(tmp_path / "face_identifier.h5")
    conf.fi_conf.model_path = h5_path
    fi = FaceIdentifierPipeline(conf)
    fi.train()
    assert os.path.exists(h5_path)
    assert os.path.isdir(h5_path + ".orbax")

    conf.fi_conf.model_loading = True
    fi2 = FaceIdentifierPipeline(conf)
    np.testing.assert_array_equal(
        np.asarray(fi2.params["dense1"]["kernel"]),
        np.asarray(fi.params["dense1"]["kernel"]),
    )


def test_identify_image_rows_with_handcrafted_boxes(tmp_path):
    """Non-degenerate boxes → crops → embed → match → rows (deterministic)."""
    from face_vijnana_yolov3_tpu.api.face_identification import (
        FaceIdentifierPipeline,
    )

    conf = _fi_conf(tmp_path, str(tmp_path))
    fi = FaceIdentifierPipeline(conf)
    rng = np.random.default_rng(3)
    image_o = rng.uniform(0, 255, size=(150, 200, 3)).astype(np.uint8)
    boxes = np.array(
        [[40.0, 30.0, 110.0, 90.0, 0.9],
         [0.0, 0.0, 0.0, 0.0, 0.5]],  # degenerate: must be skipped
        np.float64,
    )
    # Registry whose first entry IS the embedding of crop 0 → distance ~0.
    crop = image_o[29:89, 39:109, :]
    from face_vijnana_yolov3_tpu.ops.letterbox import letterbox_host

    lb, _ = letterbox_host(crop / 255, 64, "cubic")
    emb = fi.embed(lb[None].astype(np.float32))[0]
    reg = np.stack([emb, -emb])
    rows = fi._identify_image(image_o, boxes, ["alice", "bob"], reg)
    assert len(rows) == 1
    assert rows[0]["subject_id"] == "alice"
    assert rows[0]["box_index"] == 0
    # sim gate: impossible threshold rejects everything
    fi.hps["sim_th"] = -1.0
    assert fi._identify_image(image_o, boxes, ["alice", "bob"], reg) == []


def test_create_subject_db_vggface2(tmp_path, monkeypatch):
    from face_vijnana_yolov3_tpu.data.facedb import create_subject_db_vggface2
    from face_vijnana_yolov3_tpu.utils.io import imsave

    rng = np.random.default_rng(0)
    rows = []
    for ident in ("n000001", "n000002"):
        d = tmp_path / "train" / ident
        d.mkdir(parents=True)
        for k in range(2):
            imsave(str(d / f"{k:04d}.jpg"),
                   rng.uniform(0, 255, (100, 90, 3)).astype(np.uint8))
            rows.append({"NAME_ID": f"{ident}/{k:04d}", "X": 10, "Y": 12,
                         "W": 40, "H": 50})
    # one invalid row (negative X) that must be skipped
    rows.append({"NAME_ID": "n000001/0000", "X": -3, "Y": 1, "W": 5, "H": 5})
    pd.DataFrame(rows).to_csv(tmp_path / "loose_bb_train.csv", index=False)
    monkeypatch.chdir(tmp_path)
    db = create_subject_db_vggface2(str(tmp_path), image_size=64, workers=2)
    assert db.shape[0] == 4
    assert set(db["subject_id"]) == {"n000001", "n000002"}
    assert set(db["w"]) == {40} and set(db["h"]) == {50}
    assert os.path.exists(tmp_path / "subject_image_vggface2_db.csv")
    files = os.listdir(tmp_path / "subject_faces_vggface2")
    assert len(files) == 4
