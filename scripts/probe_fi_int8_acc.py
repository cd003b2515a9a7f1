"""FI embed path under the int8-auto serving default — at statistical scale.

The detector's serving default is int8-auto (faster AND more accurate than
guarded bf16 on trained checkpoints); this probe answers whether the FI
EMBED path tolerates the same treatment. Embeddings are L2-normalized, so
trunk quantization noise rotates them — the operative metric is not raw
error but REGISTRY ARGMIN FLIPS: the fraction of held-out crops whose
nearest registered subject changes vs the f32 embed, plus the resulting
top-1 identification accuracy per precision.

Round-3 ran this at 36 crops / 12 subjects — a ±5% bracket on one flip
(VERDICT r3 #4 called it statistically thin). The defaults are now 50
subjects x 10 held-out crops = 500 crops, and the flip rate is reported
with a 95% Wilson binomial interval.

Reuses scripts/synthetic_fi_e2e.py's synthetic-identity tree and trained
checkpoint (trains one via that flow if the workdir has none — pass the
same workdir you gave synthetic_fi_e2e to skip training).

Usage: python scripts/probe_fi_int8_acc.py [workdir] [epochs] [n_subjects]
                                           [hold_per_subj]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def wilson_ci(k: int, n: int, z: float = 1.96):
    """95% Wilson score interval for a binomial proportion."""
    if n == 0:
        return 0.0, 1.0
    p = k / n
    den = 1 + z * z / n
    center = (p + z * z / (2 * n)) / den
    half = z * np.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / den
    return max(0.0, center - half), min(1.0, center + half)


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fvy_synth_fi_big"
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    n_subjects = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    hold_per_subj = int(sys.argv[4]) if len(sys.argv) > 4 else 10

    from face_vijnana_yolov3_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()

    from synthetic_fi_e2e import holdout_crops, make_tree, top1_acc

    from face_vijnana_yolov3_tpu.api.config import Conf
    from face_vijnana_yolov3_tpu.api.face_identification import (
        FaceIdentifierPipeline,
    )
    from face_vijnana_yolov3_tpu.data.facedb import create_subject_db_uccs
    from face_vijnana_yolov3_tpu.ops.similarity import match_embeddings

    os.makedirs(workdir, exist_ok=True)
    os.chdir(workdir)
    holdout = make_tree(workdir, n_subjects, hold_per_subj=hold_per_subj)
    crops, sids = holdout_crops(holdout)
    if not os.path.exists(os.path.join(workdir, "subject_image_db.csv")):
        create_subject_db_uccs(workdir, image_size=416)

    # "qat" argv flag / FVY_FI_QAT=1: train the identifier quantization-aware
    # (FiConf.train_qat) — the round-5 re-verdict lever after the plain
    # checkpoint measured 7.2% int8 flips. Use a separate workdir from the
    # plain run so both verdicts stay on record.
    qat = ("qat" in sys.argv[5:]) or os.environ.get("FVY_FI_QAT") == "1"

    def conf_for():
        conf = Conf()
        conf.fi_conf.raw_data_path = workdir
        conf.fi_conf.weights_path = "missing.weights"
        conf.fi_conf.model_path = os.path.join(workdir, "fi_ckpt")
        conf.fi_conf.checkpoint_every = 10
        conf.fi_conf.hps.lr = 1e-4
        conf.fi_conf.hps.epochs = epochs
        conf.fi_conf.hps.batch_size = 24
        conf.fi_conf.train_qat = qat
        conf.fd_conf.weights_path = "missing.weights"
        return conf

    ckpt = os.path.join(workdir, "fi_ckpt")
    if not os.path.isdir(ckpt):
        print(f"no checkpoint in {workdir}; training {epochs} epochs ...")
        fi = FaceIdentifierPipeline(conf_for(), precision="bfloat16")
        fi.train()
        del fi

    conf = conf_for()
    conf.fi_conf.model_loading = True

    # f32 reference: embeddings, registry, matches.
    fi32 = FaceIdentifierPipeline(conf, precision="float32")
    fi32.make_facial_ids_db()
    registry = fi32.register_facial_ids()
    subject_ids = list(registry.keys())
    reg = np.asarray([registry[s] for s in subject_ids], np.float32)

    import jax.numpy as jnp

    emb32 = fi32.embed(crops)
    idx32, _ = match_embeddings(jnp.asarray(emb32), jnp.asarray(reg))
    idx32 = np.asarray(idx32)

    print(f"{len(crops)} held-out crops, {n_subjects} subjects; registry "
          "and f32 matches fixed, embed precision swept:\n")
    print(f"{'precision':>12} {'top1':>6} {'argmin flips':>13} "
          f"{'95% CI':>17} {'|Δemb| med':>11} {'max':>7}")
    acc32, _ = top1_acc(fi32, crops, sids, registry)
    print(f"{'float32':>12} {acc32:>6.3f} {'—':>13} {'—':>17} "
          f"{'—':>11} {'—':>7}")

    results = {"n_crops": len(crops), "n_subjects": n_subjects,
               "f32_top1": round(acc32, 4)}
    for precision in ("int8", "bfloat16"):
        fip = FaceIdentifierPipeline(conf, precision=precision)
        embp = fip.embed(crops)
        idxp, _ = match_embeddings(jnp.asarray(embp), jnp.asarray(reg))
        n_flip = int((np.asarray(idxp) != idx32).sum())
        flips = n_flip / len(crops)
        lo, hi = wilson_ci(n_flip, len(crops))
        dn = np.linalg.norm(embp - emb32, axis=-1)
        accp, _ = top1_acc(fip, crops, sids, registry)
        print(f"{precision:>12} {accp:>6.3f} {flips:>12.1%} "
              f"[{lo:>6.1%},{hi:>6.1%}] {np.median(dn):>11.4f} "
              f"{dn.max():>7.4f}")
        key = "int8" if precision == "int8" else "bf16"
        results.update({
            f"{key}_top1": round(accp, 4),
            f"{key}_flip_rate": round(flips, 4),
            f"{key}_flip_ci95": [round(lo, 4), round(hi, 4)],
            f"{key}_demb_med": round(float(np.median(dn)), 4),
            f"{key}_demb_max": round(float(dn.max()), 4),
        })
    print(json.dumps(results))


if __name__ == "__main__":
    main()
