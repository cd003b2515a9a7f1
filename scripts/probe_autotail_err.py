"""Per-tail label-free self-check error on a checkpoint, vs calibration size.

The autotail ladder accepts the FIRST tail whose detection-level self-check
err (1 - boxF1 vs the f32 head on the calibration batch) passes 0.05. On
the round-5 QAT checkpoint that rule is miscalibrated: tail 0 scores 0.0459
(passes) while its REAL held-out AP50 drift is -0.097. This probe prints
the per-tail self-check err at several calibration-batch sizes next to the
held-out AP (measured separately by probe_precision_ap --tails ...), to
answer: is there a label-free signal (err level, err improvement shape, or
bigger calibration batches) that separates the damaged shallow tails from
the recovered deep ones?

Usage: python scripts/probe_autotail_err.py [workdir] [ckpt_name]
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else ".bench_cache"
    ckpt_name = sys.argv[2] if len(sys.argv) > 2 else "fd_ckpt_qat"

    from face_vijnana_yolov3_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from face_vijnana_yolov3_tpu.core.checkpoints import load_checkpoint
    from face_vijnana_yolov3_tpu.models.detector import FaceDetectorModel
    from face_vijnana_yolov3_tpu.models.quant import (
        calibrate_folded,
        detection_box_f1_scorer,
        quantize_folded,
    )
    from face_vijnana_yolov3_tpu.ops.letterbox import letterbox_host
    from face_vijnana_yolov3_tpu.ops.postprocess import FacePostprocessConfig
    from face_vijnana_yolov3_tpu.utils.io import imread

    loaded = load_checkpoint(os.path.join(workdir, ckpt_name))
    model = FaceDetectorModel()
    folded = jax.device_put(model.fold(loaded["params"], loaded["state"]))

    val_files = sorted(glob.glob(os.path.join(workdir, "valset", "*.jpg")))
    x_all = jnp.asarray(np.stack([
        letterbox_host(imread(f) / 255.0, 416, "cubic")[0]
        for f in val_files[:96]
    ]).astype(np.float32))

    cfg = FacePostprocessConfig()
    ref_all = np.asarray(jax.jit(
        lambda w, xi: model.apply_folded(w, xi, compute_dtype=jnp.float32)
    )(folded, x_all))

    # scales calibrated once on the first 8 (the serving default's
    # n_scale_calib); only the SCORING sample size varies below.
    scales = calibrate_folded(folded, x_all[:8], model.ops, percentile="auto")

    print(f"{'tail':>5} " + "".join(f"{f'err@{n}':>9}" for n in (16, 32, 64, 96)))
    for tail in (0, 1, 2, 3, 4, 5, 6, 8):
        q = quantize_folded(folded, x_all[:8], model.ops, act_scales=scales,
                            bf16_tail_blocks=tail)
        q = jax.device_put(q)
        # close over qparams: mixed-tail trees carry a static `tail_start`
        # int that must not trace (bench.py `chained` comment)
        head = np.asarray(jax.jit(
            lambda xi, w=q: model.apply_quant(w, xi)
        )(x_all))
        errs = []
        for n in (16, 32, 64, 96):
            scorer = detection_box_f1_scorer(cfg)
            errs.append(scorer(ref_all[:n], head[:n]))
        print(f"{tail:>5} " + "".join(f"{e:>9.4f}" for e in errs), flush=True)


if __name__ == "__main__":
    main()
