"""Retrain the bench checkpoint quantization-aware (round-5, VERDICT r4 #2).

Round 4 proved the full-int8 (tail-0) accuracy gap is requant-error
ACCUMULATION on a brittle checkpoint — calibration grids, bf16 islands and
post-hoc distillation all measured insufficient (PROFILE.md round-4 tables).
The remaining lever is training-time robustness: run the SAME 400-epoch bench
recipe (synthetic 640/160 set, f32 precision, lr 1e-3, b16 — bench.py
ensure_trained_checkpoint) with `train_qat` on, so every forward carries the
serving int8 noise (darknet.apply_graph fakequant) and the minimum found is
flat against the int8 grid.

Reuses the existing .bench_cache dataset (same images, same npz stack) and
trains into a SIBLING checkpoint dir (fd_ckpt_qat + meta_qat.json) so the
round-4 artifact stays intact until the QAT checkpoint proves itself
(scripts/probe_int8_mix.py / bench swap happens only then).

Kill-safe: trains in 20-epoch chunks, each chunk checkpointed and recorded in
meta_qat.json — a killed run resumes. Designed to be launched detached
(`setsid nohup ... &`) and ridden through axon tunnel outages (STATUS.md
runbook).

Usage: python scripts/train_qat_recipe.py [workdir] [target_epochs]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHUNK = 20


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else ".bench_cache"
    target = int(sys.argv[2]) if len(sys.argv) > 2 else 400

    from face_vijnana_yolov3_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()

    from face_vijnana_yolov3_tpu.api.config import FdConf
    from face_vijnana_yolov3_tpu.api.face_detection import FaceDetectorPipeline
    from face_vijnana_yolov3_tpu.core.checkpoints import checkpoint_exists

    ckpt = os.path.join(workdir, "fd_ckpt_qat")
    meta_path = os.path.join(workdir, "meta_qat.json")
    meta = {"epochs_done": 0}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)

    if not os.path.exists(os.path.join(workdir, "training.csv")):
        raise SystemExit(f"no dataset under {workdir} — run bench.py first")

    while meta["epochs_done"] < target:
        n = min(CHUNK, target - meta["epochs_done"])
        conf = FdConf(
            raw_data_path=workdir,
            test_path=workdir,
            weights_path="missing.weights",
            model_path=ckpt,
        )
        conf.hps.lr = 1e-3
        conf.hps.epochs = n
        conf.hps.batch_size = 16
        conf.train_qat = True
        conf.dataset_cache = "disk"
        if checkpoint_exists(ckpt):
            conf.model_loading = True
        t0 = time.monotonic()
        fd = FaceDetectorPipeline(conf)
        losses = fd.train()
        dt = time.monotonic() - t0
        meta["epochs_done"] += n
        meta["sec_per_epoch"] = round(dt / n, 2)
        with open(meta_path, "w") as f:
            json.dump(meta, f)
        print(
            f"[qat-recipe] epoch {meta['epochs_done']}/{target} "
            f"({dt / n:.1f} s/epoch, loss {losses[0]:.6f} -> {losses[-1]:.6f})",
            flush=True,
        )

    print(f"[qat-recipe] DONE: {meta['epochs_done']} epochs at {ckpt}")


if __name__ == "__main__":
    main()
