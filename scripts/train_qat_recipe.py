"""Retrain the bench checkpoint — plain, QAT-from-scratch, or QAT-finetune.

Round 4 proved the full-int8 (tail-0) accuracy gap is requant-error
ACCUMULATION on a brittle checkpoint — calibration grids, bf16 islands and
post-hoc distillation all measured insufficient (PROFILE.md round-4 tables).
Round 5 measured the two training-time candidates:

* QAT FROM SCRATCH (fake-quant noise from epoch 0): int8 tail-0 improves
  0.6677 → 0.7762 but f32/bf16 run away (0.8734/0.9141), so the drift gate
  still fails; and mixed bf16 tails actively HURT such artifacts (tail1
  0.346 — the minimum is specific to the full-int8 rounding pattern).
* QAT FINETUNE from the converged plain checkpoint (this script with
  --init-from; the literature-standard recipe): see PROFILE.md round 5 for
  the measured verdict.

Reuses the existing .bench_cache dataset (same images, same npz stack) and
trains into a configurable checkpoint dir, so multiple artifacts coexist
for A/B AP measurement (probe_precision_ap --ckpt ...).

Kill-safe: trains in chunks, each chunk checkpointed and recorded in the
meta json; a killed run resumes (the trainer also saves 20-epoch interval
checkpoints inside a chunk). Designed to be launched detached
(`setsid nohup ... &`) and ridden through axon tunnel outages (STATUS.md
runbook).

Usage: python scripts/train_qat_recipe.py [workdir] [target_epochs]
         [--plain] [--ckpt NAME] [--meta NAME] [--init-from NAME] [--lr LR]
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Per-chunk fixed cost is large (pipeline re-init + BN finalize + Orbax save
# ≈ 5 min vs 6.1 s/epoch compute, measured round 5): 20-epoch chunks spend
# 78% of wall on overhead. 120-epoch chunks amortize it to ~9%; kill-safety
# comes from the trainer's checkpoint_every=20 interval saves instead (a
# killed chunk resumes from the last interval, only the meta json lags).
CHUNK = 120


def main():
    args = [a for a in sys.argv[1:]]

    def opt(name, default=None, flag=False):
        if name in args:
            i = args.index(name)
            if flag:
                args.pop(i)
                return True
            v = args[i + 1]
            del args[i:i + 2]
            return v
        return default

    plain = opt("--plain", False, flag=True)
    ckpt_name = opt("--ckpt", "fd_ckpt_plain" if plain else "fd_ckpt_qat")
    meta_name = opt("--meta", f"meta_{ckpt_name.removeprefix('fd_ckpt_')}.json"
                    if ckpt_name != "fd_ckpt_qat" else "meta_qat.json")
    init_from = opt("--init-from")
    lr = float(opt("--lr", "1e-3"))
    workdir = args[0] if args else ".bench_cache"
    target = int(args[1]) if len(args) > 1 else 400

    from face_vijnana_yolov3_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()

    from face_vijnana_yolov3_tpu.api.config import FdConf
    from face_vijnana_yolov3_tpu.api.face_detection import FaceDetectorPipeline
    from face_vijnana_yolov3_tpu.core.checkpoints import checkpoint_exists

    ckpt = os.path.join(workdir, ckpt_name)
    meta_path = os.path.join(workdir, meta_name)
    meta = {"epochs_done": 0}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)

    if not os.path.exists(os.path.join(workdir, "training.csv")):
        raise SystemExit(f"no dataset under {workdir} — run bench.py first")

    if init_from and not checkpoint_exists(ckpt):
        # finetune seed: copy the converged source artifact (params + BN +
        # opt state + trainmeta sidecar) and resume training on top of it
        src = os.path.join(workdir, init_from)
        shutil.copytree(src, ckpt)
        for side in (".trainmeta.json",):
            if os.path.exists(src + side):
                shutil.copy(src + side, ckpt + side)
        print(f"[qat-recipe] seeded {ckpt} from {src}", flush=True)

    while meta["epochs_done"] < target:
        n = min(CHUNK, target - meta["epochs_done"])
        conf = FdConf(
            raw_data_path=workdir,
            test_path=workdir,
            weights_path="missing.weights",
            model_path=ckpt,
        )
        conf.hps.lr = lr
        conf.hps.epochs = n
        conf.hps.batch_size = 16
        conf.train_qat = not plain
        conf.dataset_cache = "disk"
        conf.checkpoint_every = 20  # interval saves: a killed chunk resumes
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
