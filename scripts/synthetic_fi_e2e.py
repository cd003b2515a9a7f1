"""End-to-end face-identification demonstration on synthetic identities.

Closes the FI loop the same way scripts/synthetic_e2e.py closes the FD loop:
generates a UCCS-style tree of synthetic identities (per-subject deterministic
face pattern, augmented per instance), then drives the REAL pipeline —
create_subject_db_uccs (data mode) → TripletDataset → triplet training
(FaceIdentifierPipeline.train, bf16 mixed precision, device-resident data) →
make_facial_ids_db → register_facial_ids — and scores held-out crops:
top-1 registry identification accuracy (vs the untrained baseline) and the
VAL/FAR sweep (evals C27).

Usage: python scripts/synthetic_fi_e2e.py [workdir] [epochs] [n_subjects]
~6-8 minutes on a v5e chip at the defaults.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

IMG = 416
TRAIN_PER_SUBJ = 6
HOLD_PER_SUBJ = 3


def subject_face(sid: int, size: int, rng) -> np.ndarray:
    """Deterministic per-subject pattern (identity) + per-instance noise."""
    srng = np.random.default_rng(1000 + sid)
    base = srng.uniform(80, 200, 3)
    freq = srng.uniform(0.15, 0.45)
    phase = srng.uniform(0, np.pi)
    stripe_c = srng.uniform(40, 255, 3)
    yy, xx = np.mgrid[0:size, 0:size]
    r = np.sqrt((yy - size / 2) ** 2 + (xx - size / 2) ** 2)
    disk = r <= size / 2
    rings = 0.5 * (1 + np.sin(freq * r + phase))
    face = np.zeros((size, size, 3))
    face += base
    face += rings[..., None] * (stripe_c - base)
    face[~disk] = 0
    face += rng.normal(0, 25, face.shape)  # per-instance augmentation
    face *= rng.uniform(0.6, 1.4)  # strong lighting variation
    # occlusion bar (random angle strip zeroed) so the margin doesn't
    # saturate instantly and training has work to do
    if rng.uniform() < 0.7:
        t0 = int(rng.integers(0, size - size // 5))
        if rng.uniform() < 0.5:
            face[t0:t0 + size // 5, :] *= rng.uniform(0.0, 0.4)
        else:
            face[:, t0:t0 + size // 5] *= rng.uniform(0.0, 0.4)
    return np.clip(face, 0, 255), disk


def make_tree(root: str, n_subjects: int, seed: int = 0,
              hold_per_subj: int = HOLD_PER_SUBJ):
    import pandas as pd

    from face_vijnana_yolov3_tpu.utils.io import imsave

    rng = np.random.default_rng(seed)
    tdir = os.path.join(root, "training")
    os.makedirs(tdir, exist_ok=True)
    rows, holdout = [], []
    fid = 0
    for sid in range(1, n_subjects + 1):
        for j in range(TRAIN_PER_SUBJ + hold_per_subj):
            fsize = int(rng.integers(90, 200))
            face, disk = subject_face(sid, fsize, rng)
            img = rng.uniform(30, 90, (IMG, IMG, 3))
            x0 = int(rng.integers(2, IMG - fsize - 2))
            y0 = int(rng.integers(2, IMG - fsize - 2))
            patch = img[y0:y0 + fsize, x0:x0 + fsize]
            img[y0:y0 + fsize, x0:x0 + fsize] = np.where(
                disk[..., None], face, patch
            )
            img = np.clip(img, 0, 255).astype(np.uint8)
            if j < TRAIN_PER_SUBJ:
                name = f"s{sid}_{j}.jpg"
                imsave(os.path.join(tdir, name), img)
                rows.append({
                    "FACE_ID": fid, "FILE": name, "SUBJECT_ID": sid,
                    "FACE_X": x0, "FACE_Y": y0,
                    "FACE_WIDTH": fsize, "FACE_HEIGHT": fsize,
                })
                fid += 1
            else:
                holdout.append((sid, img, (x0, y0, fsize)))
    pd.DataFrame(rows).to_csv(os.path.join(tdir, "training.csv"), index=False)
    return holdout


def holdout_crops(holdout):
    """Crop + letterbox held-out faces exactly like the subject-DB builder
    (reference off-by-one, INTER_NEAREST uint8 letterbox, /255)."""
    from face_vijnana_yolov3_tpu.data.facedb import _letterbox_uint8

    crops, sids = [], []
    for sid, img, (x0, y0, fs) in holdout:
        l, t = x0, y0
        r, b = x0 + fs - 1, y0 + fs - 1
        crop = img[(t - 1):(b - 1), (l - 1):(r - 1), :]
        crops.append(_letterbox_uint8(crop, IMG, "nearest") / 255.0)
        sids.append(sid)
    return np.asarray(crops, np.float32), np.asarray(sids)


def top1_acc(fi, crops, sids, registry):
    import jax.numpy as jnp

    from face_vijnana_yolov3_tpu.ops.similarity import match_embeddings

    subject_ids = list(registry.keys())
    reg = np.asarray([registry[s] for s in subject_ids], np.float32)
    embs = fi.embed(crops)
    best_idx, best_dist = match_embeddings(jnp.asarray(embs), jnp.asarray(reg))
    pred = np.asarray([subject_ids[int(i)] for i in np.asarray(best_idx)])
    return float((pred == sids).mean()), np.asarray(best_dist)


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fvy_synth_fi"
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    n_subjects = int(sys.argv[3]) if len(sys.argv) > 3 else 12
    mining = sys.argv[4] if len(sys.argv) > 4 else "random"

    from face_vijnana_yolov3_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()

    from face_vijnana_yolov3_tpu.api.config import Conf
    from face_vijnana_yolov3_tpu.api.face_identification import (
        FaceIdentifierPipeline,
    )
    from face_vijnana_yolov3_tpu.data.facedb import create_subject_db_uccs

    os.makedirs(workdir, exist_ok=True)
    os.chdir(workdir)  # subject_image_db.csv etc. land in cwd, like the ref
    print(f"dataset → {workdir} ({n_subjects} subjects)")
    holdout = make_tree(workdir, n_subjects)
    crops, sids = holdout_crops(holdout)

    create_subject_db_uccs(workdir, image_size=IMG)

    conf = Conf()
    conf.fi_conf.raw_data_path = workdir
    conf.fi_conf.weights_path = "missing.weights"  # from-scratch trunk
    conf.fi_conf.model_path = os.path.join(workdir, "fi_ckpt")
    conf.fi_conf.checkpoint_every = 10
    conf.fi_conf.hps.lr = 1e-4
    conf.fi_conf.hps.epochs = epochs
    conf.fi_conf.hps.batch_size = 24
    conf.fi_conf.negative_mining = mining
    conf.fd_conf.weights_path = "missing.weights"

    fi = FaceIdentifierPipeline(conf, precision="bfloat16")

    # Untrained baseline (random trunk embeddings).
    fi.make_facial_ids_db()
    reg0 = fi.register_facial_ids()
    acc0, _ = top1_acc(fi, crops, sids, reg0)
    print(f"untrained top-1 holdout acc: {acc0:.3f} "
          f"(chance {1 / n_subjects:.3f})")

    losses = fi.train()
    print(f"triplet loss: first {losses[0]:.4f} → last {losses[-1]:.4f}")

    fi.make_facial_ids_db()
    registry = fi.register_facial_ids()
    acc, dists = top1_acc(fi, crops, sids, registry)
    print(f"trained top-1 holdout acc: {acc:.3f}  "
          f"(match dists: med {np.median(dists):.3f} max {dists.max():.3f})")

    from face_vijnana_yolov3_tpu.evals.identification import cal_VAL_FAR

    ths, vals, fars = cal_VAL_FAR(np.arange(0.1, 1.01, 0.1))
    for th, v, fr in zip(ths, vals, fars):
        print(f"  sim_th {th:.1f}: VAL {v:.3f}  FAR {fr:.3f}")


if __name__ == "__main__":
    main()
