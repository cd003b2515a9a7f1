"""Score mixed int8 configs — bf16 tail + selective bf16 islands — on the
bench checkpoint's held-out AP50.

Motivation (round-4 localizer evidence, scripts/probe_int8_localize.py):
tails 1-4 stay flat at AP50 ~0.74 while tail 8 recovers, and conv_62 (the
stage-5 downsample, the largest single jump in the error profile) is int8
under tail 4 but bf16 under tail 8 — so "tail4 + island{62}" tests whether
most of tail8's recovery comes from that one conv at a fraction of its
throughput cost.

Usage: python scripts/probe_int8_mix.py [workdir] cfg ...
       cfg syntax: "<tail>[+op,op,...][@percentile]", e.g. "4+62"  "8@auto"
       (percentile defaults to msegrid)
       default sweep: 4+62 2+62 0+62
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from face_vijnana_yolov3_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()

    from face_vijnana_yolov3_tpu.api.config import FdConf
    from face_vijnana_yolov3_tpu.api.face_detection import FaceDetectorPipeline
    from face_vijnana_yolov3_tpu.evals.detection import map_sweep

    args = sys.argv[1:]
    workdir = args.pop(0) if args and os.path.isdir(args[0]) else \
        "/root/repo/.bench_cache"
    cfgs = args or ["4+62", "2+62", "0+62"]
    valdir = os.path.join(workdir, "valset")
    ckpt = os.path.join(workdir, "fd_ckpt")

    results = {}
    for cfg in cfgs:
        body, _, perc = cfg.partition("@")
        perc = perc or "msegrid"
        tail_s, _, ops_s = body.partition("+")
        tail = int(tail_s)
        ops = tuple(int(o) for o in ops_s.split(",")) if ops_s else ()
        sol = os.path.join(workdir, "solution_mix.csv")
        conf = FdConf(
            test_path=valdir, output_file_path=sol,
            weights_path="missing.weights", model_path=ckpt,
            model_loading=True,
        )
        conf.int8_tail_auto = False
        conf.int8_bf16_tail = tail
        conf.int8_bf16_ops = ops
        conf.int8_calib_percentile = (
            0.0 if perc == "maxabs" else perc)
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
        results[cfg] = {"ap50": round(ap50, 4), "map": round(mmap, 4)}
        print(f"## tail{tail}+ops{list(ops)}: AP50 {ap50:.4f} "
              f"mAP {mmap:.4f} ({dt:.0f}s)", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
