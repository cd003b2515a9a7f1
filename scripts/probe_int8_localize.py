"""Localize the int8 damage layers on a trained checkpoint and score
selective bf16 islands (VERDICT r4: quantize the outlier layers by name).

Stage 1: int8_error_profile — one jitted twin-walk (int8 vs f32) over the
calibration batch, per-conv relative error in graph order. Damage layers
show as JUMPS over their input error.

Stage 2: for k in ks, serve with bf16_ops = the top-k jump layers and
measure held-out AP50 through the REAL int8 pipeline test mode (same
machinery as probe_det_calib).

Usage: python scripts/probe_int8_localize.py [workdir] [percentile] [k ...]
       defaults: .bench_cache msegrid 2 4 6
"""

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from face_vijnana_yolov3_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from face_vijnana_yolov3_tpu.api.config import FdConf
    from face_vijnana_yolov3_tpu.api.face_detection import FaceDetectorPipeline
    from face_vijnana_yolov3_tpu.core.checkpoints import load_checkpoint
    from face_vijnana_yolov3_tpu.evals.detection import map_sweep
    from face_vijnana_yolov3_tpu.models import quant
    from face_vijnana_yolov3_tpu.models.detector import FaceDetectorModel
    from face_vijnana_yolov3_tpu.ops.letterbox import letterbox_host
    from face_vijnana_yolov3_tpu.utils.io import imread

    args = sys.argv[1:]
    workdir = args.pop(0) if args else "/root/repo/.bench_cache"
    percentile = args.pop(0) if args else "msegrid"
    ks = [int(a) for a in args] or [2, 4, 6]
    valdir = os.path.join(workdir, "valset")
    ckpt = os.path.join(workdir, "fd_ckpt")

    loaded = load_checkpoint(ckpt)
    model = FaceDetectorModel()
    folded = model.fold(loaded["params"], loaded["state"])
    folded["head"] = loaded["params"]["head"]

    val_files = sorted(glob.glob(os.path.join(workdir, "val_*.jpg")))[:32]
    x = jnp.asarray(np.stack([
        letterbox_host(imread(f) / 255.0, 416, "cubic")[0] for f in val_files
    ]).astype(np.float32))

    perc = None if percentile in ("maxabs", "0", "0.0") else percentile
    q0 = model.quantize(folded, x[:16], percentile=perc)
    prof = quant.int8_error_profile(jax.device_put(q0), folded, x, model.ops)

    # graph-order table with jump = err − err_of_previous_conv
    idxs = list(prof.keys())
    prev = 0.0
    jumps = {}
    print(f"{'conv':>6} {'rel_err':>9} {'jump':>9}")
    for i in idxs:
        jumps[i] = prof[i] - prev
        print(f"{i:>6} {prof[i]:>9.4f} {jumps[i]:>+9.4f}")
        prev = prof[i]
    ranked = sorted(jumps, key=lambda i: -jumps[i])
    print("top jumps:", [(i, round(jumps[i], 4)) for i in ranked[:8]])

    def ap_for(bf16_ops):
        sol = os.path.join(workdir, "solution_localize.csv")
        conf = FdConf(
            test_path=valdir, output_file_path=sol,
            weights_path="missing.weights", model_path=ckpt,
            model_loading=True,
        )
        conf.int8_tail_auto = False
        conf.int8_calib_percentile = 0.0 if perc is None else perc
        conf.int8_bf16_ops = tuple(bf16_ops)
        t0 = time.monotonic()
        fd = FaceDetectorPipeline(conf, precision="int8")
        fd.test()
        dt = time.monotonic() - t0
        if not os.path.getsize(sol):
            return 0.0, 0.0, dt
        _, _, maps = map_sweep(
            os.path.join(valdir, "validation.csv"), sol, out_h5=None)
        return float(maps[0]), float(np.mean(maps)), dt

    results = {"percentile": percentile,
               "profile_top": [(i, round(jumps[i], 4)) for i in ranked[:8]]}
    for k in ks:
        sel = sorted(ranked[:k])
        ap50, mmap, dt = ap_for(sel)
        print(f"## bf16_ops top{k} {sel}: AP50 {ap50:.4f} mAP {mmap:.4f} "
              f"({dt:.0f}s)", flush=True)
        results[f"top{k}"] = {"ops": sel, "ap50": round(ap50, 4),
                              "map": round(mmap, 4)}
    print(json.dumps(results))


if __name__ == "__main__":
    main()
