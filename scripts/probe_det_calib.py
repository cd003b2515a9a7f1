"""Sweep deterministic calibration configs at FIXED bf16 tail on the bench
checkpoint, scoring held-out AP50 — the experiment behind the msegrid
default (VERDICT r3 #1: reclaim full-int8 as the headline).

Usage:
    python scripts/probe_det_calib.py [workdir] [tail] cfg1 cfg2 ...

cfg syntax: <percentile>[+bc]  where percentile is one of
    maxabs | auto | 99.99 | msegrid | msegrid:<tol>
and +bc enables DFQ bias correction. tail defaults to 0 (full int8).

Each config drives the REAL int8 pipeline test mode over the workdir's
val set and reports AP50 / mAP (evals/detection.map_sweep).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from face_vijnana_yolov3_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    import numpy as np

    from face_vijnana_yolov3_tpu.api.config import FdConf
    from face_vijnana_yolov3_tpu.api.face_detection import FaceDetectorPipeline
    from face_vijnana_yolov3_tpu.evals.detection import map_sweep

    args = sys.argv[1:]
    workdir = args.pop(0) if args and os.path.isdir(args[0]) else \
        "/root/repo/.bench_cache"
    tail = int(args.pop(0)) if args and args[0].isdigit() else 0
    cfgs = args or ["auto", "msegrid"]
    valdir = os.path.join(workdir, "valset")
    ckpt = os.path.join(workdir, "fd_ckpt")

    results = {}
    for cfg in cfgs:
        perc, bc = (cfg[:-3], True) if cfg.endswith("+bc") else (cfg, False)
        if perc == "maxabs":
            perc_val = 0.0  # falsy -> None -> exact maxabs
        else:
            try:
                perc_val = float(perc)
            except ValueError:
                perc_val = perc
        sol = os.path.join(workdir, f"solution_calibsweep.csv")
        conf = FdConf(
            test_path=valdir,
            output_file_path=sol,
            weights_path="missing.weights",
            model_path=ckpt,
            model_loading=True,
        )
        conf.int8_tail_auto = False
        conf.int8_bf16_tail = tail
        conf.int8_calib_percentile = perc_val
        conf.int8_bias_correct = bc
        t0 = time.monotonic()
        fd = FaceDetectorPipeline(conf, precision="int8")
        fd.test()
        dt = time.monotonic() - t0
        if os.path.getsize(sol):
            _, _, maps = map_sweep(
                os.path.join(valdir, "validation.csv"), sol, out_h5=None)
            ap50, mmap = float(maps[0]), float(np.mean(maps))
        else:
            ap50, mmap = 0.0, 0.0
        results[cfg] = {"ap50": round(ap50, 4), "map": round(mmap, 4),
                        "tail": tail, "s": round(dt, 1)}
        print(f"## {cfg} tail{tail}: AP50 {ap50:.4f} mAP {mmap:.4f} "
              f"({dt:.0f}s)", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
