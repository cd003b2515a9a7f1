"""Distillation-QAT int8 AP probe on a trained checkpoint.

Measures whether a short label-free QAT refinement (models/qat.py — fake-quant
student matched to the f32 teacher's head outputs) closes the residual
full-int8 mAP gap that plain PTQ leaves on trained checkpoints (−0.012 mAP on
the bench checkpoint; the bf16-tail alternative costs 4-9% throughput,
PROFILE.md).

The distillation set is TRAIN-split images; AP is measured on the held-out
val split — the refinement never sees the images it is scored on.

Usage: python scripts/probe_qat.py [workdir] [steps[:tail_blocks] ...]
(defaults: workdir=.bench_cache, sweep "0 100:4 300:4"; tail_blocks
restricts training to the last N residual blocks — 0/absent = all convs,
which measurably collapses AP on this checkpoint family)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else ".bench_cache"

    def parse(a):  # "steps[:tail_blocks]"
        s, _, t = a.partition(":")
        return int(s), int(t or 0)

    steps_sweep = [parse(a) for a in sys.argv[2:]] or [(0, 0), (100, 4), (300, 4)]

    from face_vijnana_yolov3_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()

    from face_vijnana_yolov3_tpu.api.config import FdConf
    from face_vijnana_yolov3_tpu.api.face_detection import FaceDetectorPipeline
    from face_vijnana_yolov3_tpu.evals.detection import map_sweep
    from face_vijnana_yolov3_tpu.ops.letterbox import letterbox_host
    from face_vijnana_yolov3_tpu.utils.io import imread

    valdir = os.path.join(workdir, "valset")
    S = 416

    # distillation/calibration batch from the TRAIN split
    tr_files = sorted(
        f for f in os.listdir(workdir) if f.startswith("tr_")
        and f.endswith(".jpg")
    )[:48]
    assert tr_files, f"no tr_*.jpg under {workdir}"
    calib = np.stack([
        letterbox_host(imread(os.path.join(workdir, f)) / 255, S, "cubic")[0]
        for f in tr_files
    ]).astype(np.float32)
    print(f"calib/distill set: {len(tr_files)} train images", flush=True)

    rows = [("float32", None)] + [("int8", st) for st in steps_sweep]
    for precision, qat_cfg in rows:
        if qat_cfg is None:
            tag = precision
        else:
            qat_steps, qat_tail = qat_cfg
            tag = (f"int8-qat{qat_steps}" +
                   (f"t{qat_tail}" if qat_tail else "")) if qat_steps else "int8"
        sol = os.path.join(workdir, f"solution_fd_{tag}.csv")
        conf = FdConf(
            test_path=valdir,
            output_file_path=sol,
            weights_path="missing.weights",
            model_path=os.path.join(workdir, "fd_ckpt"),
            model_loading=True,
        )
        conf.hps.face_conf_th = 0.5
        # FVY_QAT_PERC overrides the calibration scheme (e.g. "msegrid" for
        # the deterministic grid calibrator)
        conf.int8_calib_percentile = os.environ.get(
            "FVY_QAT_PERC", conf.int8_calib_percentile)
        if qat_cfg is not None:
            conf.int8_qat_steps = qat_steps
            conf.int8_qat_tail = qat_tail
        fd = FaceDetectorPipeline(conf, precision=precision)
        t0 = time.time()
        if precision == "int8":
            fd.calibrate_int8(calib)
        t_cal = time.time() - t0
        fd.test()
        if os.path.getsize(sol) == 0:
            print(f"{tag:14s}: NO DETECTIONS", flush=True)
            continue
        ps, rs, maps = map_sweep(
            os.path.join(valdir, "validation.csv"), sol, out_h5=None
        )
        print(f"{tag:14s}: AP50 {maps[0]:.4f}  mAP {np.mean(maps):.4f}  "
              f"(calib+qat {t_cal:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
