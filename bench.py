"""Benchmark: fused 416² face detect+NMS throughput on one TPU chip —
measured on a TRAINED checkpoint, with int8 accuracy drift in the same line.

Measures the flagship serving path — folded Darknet-53 trunk + 6ch head +
fused on-device decode/NMS/top-k postprocess — in images/sec on the attached
chip, for both the bf16 path and the calibrated int8 PTQ path
(models/quant.py; int8 MXU is 2x bf16 peak on v5e and halves HBM traffic).
The reference runs this pipeline one image at a time with host-side numpy
decode/NMS (reference src/space/face_detection.py:885-949); the rebuild target
from BASELINE.json is ≥5000 img/s on a v5e-8, i.e. 625 img/s/chip.

Weights: random-weight int8 calibration is the easy case — trained trunks
develop residual-stream outliers that collapse naive int8 (STATUS.md). So the
bench trains once through the real pipeline (synthetic dataset → SPMD train
step → Orbax checkpoint, cached under .bench_cache/), calibrates int8 on real
letterboxed images, and reports BOTH throughput and the int8-vs-f32 AP50
drift on the held-out split — the headline number and the accuracy claim are
the same artifact.

Methodology: iterations are chained inside ONE jitted lax.scan with a data
dependency between steps (input perturbed by the previous step's counts).
A naive repeat-same-args timing loop is invalid on this runtime — identical
executions are deduped (an 8192³ matmul "measures" 6 PFLOP/s) — and per-step
eager dispatches over the tunneled TPU would add host latency that a local
host would not see.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os
import sys
import time

N_ITER = 10
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")
# The round-1 recipe that generalizes AND stays precision-robust (AP50 0.80
# held-out, bf16/int8 at parity). Smaller/shorter runs (256 imgs / 220
# epochs) produce input-noise-brittle checkpoints that collapse EVERY reduced
# precision (bf16 AP50 0.0017 vs f32 0.38; scripts/probe_bf16_bisect.py shows
# head-logit MAE 0.44 from bf16 in conv_0/1 alone) — robustness comes from
# the data scale, not the serving path.
TRAIN_EPOCHS = 400
EPOCH_CHUNK = 60       # train in resumable chunks (kill-safe via the meta file)
N_TRAIN, N_VAL = 640, 160


def ensure_trained_checkpoint():
    """Train once through the real pipeline (or reuse/extend the cached run).

    Progress is tracked in CACHE/meta.json; a killed run resumes from the
    interval checkpoint and continues to TRAIN_EPOCHS, so any single bench
    invocation is bounded while the cache converges.
    Returns (ckpt_path, valdir).
    """
    from face_vijnana_yolov3_tpu.core.checkpoints import checkpoint_exists
    from face_vijnana_yolov3_tpu.api.config import FdConf
    from face_vijnana_yolov3_tpu.api.face_detection import FaceDetectorPipeline

    ckpt = os.path.join(CACHE, "fd_ckpt")
    valdir = os.path.join(CACHE, "valset")
    meta_path = os.path.join(CACHE, "meta.json")
    meta = {"epochs_done": 0}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)

    while meta["epochs_done"] < TRAIN_EPOCHS:
        sys.path.insert(
            0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "scripts"))
        from synthetic_e2e import make_dataset

        os.makedirs(CACHE, exist_ok=True)
        if not os.path.exists(os.path.join(CACHE, "validation.csv")):
            make_dataset(CACHE, n_train=N_TRAIN, n_val=N_VAL)
        n_epochs = min(EPOCH_CHUNK, TRAIN_EPOCHS - meta["epochs_done"])
        conf = FdConf(
            raw_data_path=CACHE,
            test_path=CACHE,
            weights_path="missing.weights",
            model_path=ckpt,
        )
        conf.hps.lr = 1e-3
        conf.hps.epochs = max(n_epochs, 1)
        conf.hps.batch_size = 16
        conf.checkpoint_every = 20
        conf.dataset_cache = "disk"  # npz stack next to the CSV: repeat
        # invocations skip the ~8-min single-core JPEG decode entirely
        if checkpoint_exists(ckpt):
            conf.model_loading = True
        t0 = time.time()
        fd = FaceDetectorPipeline(conf)
        losses = fd.train()
        meta["epochs_done"] += conf.hps.epochs
        with open(meta_path, "w") as f:
            json.dump(meta, f)
        print(f"# trained to epoch {meta['epochs_done']}/{TRAIN_EPOCHS} "
              f"in {time.time()-t0:.0f}s "
              f"(loss {losses[0]:.4f} -> {losses[-1]:.4f})", file=sys.stderr)

    # Val copy lives OUTSIDE the training loop: a deleted/missing valset must
    # be re-copied from the cached val_*.jpg, never by training an extra
    # epoch on the converged checkpoint the published numbers came from.
    import glob
    import shutil

    import pandas as pd

    os.makedirs(valdir, exist_ok=True)
    for f in glob.glob(os.path.join(CACHE, "val_*.jpg")):
        dst = os.path.join(valdir, os.path.basename(f))
        if not os.path.exists(dst):
            shutil.copy(f, dst)
    pd.read_csv(os.path.join(CACHE, "validation.csv")).to_csv(
        os.path.join(valdir, "validation.csv"), index=False)
    return ckpt, valdir


def measure_ap(ckpt, valdir, precision):
    """Held-out AP50/mAP of the full test mode at a serving precision."""
    import numpy as np

    from face_vijnana_yolov3_tpu.api.config import FdConf
    from face_vijnana_yolov3_tpu.api.face_detection import FaceDetectorPipeline
    from face_vijnana_yolov3_tpu.evals.detection import map_sweep

    sol = os.path.join(CACHE, f"solution_{precision}.csv")
    conf = FdConf(
        test_path=valdir,
        output_file_path=sol,
        weights_path="missing.weights",
        model_path=ckpt,
        model_loading=True,
    )
    fd = FaceDetectorPipeline(conf, precision=precision)
    fd.test()
    if os.path.getsize(sol) == 0:
        return 0.0, 0.0
    _, _, maps = map_sweep(os.path.join(valdir, "validation.csv"), sol,
                           out_h5=None)
    return float(maps[0]), float(np.mean(maps))


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import jax
    from face_vijnana_yolov3_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np

    from face_vijnana_yolov3_tpu.models.detector import FaceDetectorModel
    from face_vijnana_yolov3_tpu.ops.postprocess import (
        FacePostprocessConfig,
        face_postprocess,
    )

    trained = True
    ap = {}
    try:
        ckpt, valdir = ensure_trained_checkpoint()
        from face_vijnana_yolov3_tpu.core.checkpoints import load_checkpoint

        loaded = load_checkpoint(ckpt)
        params, state = loaded["params"], loaded["state"]

        # int8 calibration on REAL letterboxed images (the val split), not
        # noise — per-channel scales + percentile clipping (models/quant.py)
        import glob

        from face_vijnana_yolov3_tpu.ops.letterbox import letterbox_host
        from face_vijnana_yolov3_tpu.utils.io import imread

        val_files = sorted(glob.glob(os.path.join(valdir, "*.jpg")))[:8]
        x_calib = jnp.asarray(np.stack([
            letterbox_host(imread(f) / 255.0, 416, "cubic")[0]
            for f in val_files
        ]).astype(np.float32))

        ap["f32_ap50"], ap["f32_map"] = measure_ap(ckpt, valdir, "float32")
        ap["bf16_ap50"], _ = measure_ap(ckpt, valdir, "bfloat16")
        ap["int8_ap50"], ap["int8_map"] = measure_ap(ckpt, valdir, "int8")
        ap["int8_ap50_drift"] = round(ap["int8_ap50"] - ap["f32_ap50"], 4)
        print(f"# AP50 f32 {ap['f32_ap50']:.4f}  bf16 {ap['bf16_ap50']:.4f}  "
              f"int8 {ap['int8_ap50']:.4f}  "
              f"(drift {ap['int8_ap50_drift']:+.4f})", file=sys.stderr)
    except Exception as e:  # no-TPU/dev environments: fall back to random
        print(f"# trained-checkpoint path failed ({e!r}); "
              "falling back to random weights", file=sys.stderr)
        trained = False
        ap = {}  # drop any partial trained-ckpt APs: the throughput below
        # is measured on random weights, the JSON line must not mix models
        model0 = FaceDetectorModel()
        params, state = model0.init(jax.random.PRNGKey(0))
        x_calib = jax.random.uniform(
            jax.random.PRNGKey(0), (8, 416, 416, 3), jnp.float32)

    model = FaceDetectorModel()
    folded = jax.device_put(model.fold(params, state))
    cfg = FacePostprocessConfig()
    qparams = jax.device_put(model.quantize(folded, x_calib))

    def step_bf16(w, images):
        # f32_front_blocks=2 is the serving default (FdConf.bf16_f32_front):
        # throughput and the AP measured above are the same configuration.
        head = model.apply_folded(
            w, images, compute_dtype=jnp.bfloat16, f32_front_blocks=2
        )
        return jax.vmap(lambda h: face_postprocess(h, cfg))(head)

    def step_int8(w, images):
        head = model.apply_quant(w, images)
        return jax.vmap(lambda h: face_postprocess(h, cfg))(head)

    def chained(step, batch):
        from face_vijnana_yolov3_tpu.utils.runtime import tpu_compiler_options
        from functools import partial

        @partial(jax.jit,
                 compiler_options=tpu_compiler_options("serving"))
        def run(w, images):
            def body(carry, _):
                xi = images + (0.0 * carry[0]).astype(images.dtype)
                cands, counts = step(w, xi)
                return counts.astype(jnp.float32), cands[:, 0, 0]

            _, outs = jax.lax.scan(
                body, jnp.zeros((batch,), jnp.float32), None, length=N_ITER
            )
            return outs

        return run

    def measure(step, w, batch):
        x = jax.random.uniform(
            jax.random.PRNGKey(0), (batch, 416, 416, 3), jnp.bfloat16
        )
        run = chained(step, batch)
        jax.block_until_ready(run(w, x))  # compile
        t0 = time.perf_counter()
        out = run(w, x)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / N_ITER
        return batch / dt

    best, best_path, best_batch = 0.0, "", 0
    for path, step, w, batches in (
        ("bf16", step_bf16, folded, (128,)),
        ("int8", step_int8, qparams, (512, 1024)),
    ):
        for batch in batches:
            try:
                ips = measure(step, w, batch)
            except Exception as e:  # OOM at large batch etc.
                print(f"# {path} b{batch} failed: {e}", file=sys.stderr)
                continue
            print(f"# {path} b{batch}: {ips:.0f} img/s", file=sys.stderr)
            if ips > best:
                best, best_path, best_batch = ips, path, batch

    out = {
        "metric": f"416^2 images/sec/chip (detect+NMS fused, {best_path} PTQ)"
        if best_path == "int8"
        else "416^2 images/sec/chip (detect+NMS fused, bf16)",
        "value": round(best, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(best / 625.0, 3),
        "batch": best_batch,
        "trained_checkpoint": trained,
    }
    out.update({k: round(v, 4) for k, v in ap.items()})
    print(json.dumps(out))


if __name__ == "__main__":
    main()
