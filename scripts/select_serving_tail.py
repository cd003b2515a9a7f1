"""Release-time int8 serving-tail selection: measure, then PIN the artifact.

The label-free calibration self-check cannot resolve the int8/bf16-tail
frontier on QAT-trained checkpoints: measured round 5 on the 400-epoch QAT
artifact, the detection-level self-check errs sit flat at 0.03-0.05 across
tail configs whose held-out AP50 spans 0.346 (tail1) to 0.9114 (tail5) —
and the frontier is non-monotonic (tail0 0.776 > tail1 0.346 < tail5
0.911 vs f32 0.873), so no threshold or improve-margin rule over that
signal can find the right config. What CAN find it is one held-out AP
measurement per candidate at release time.

This tool measures the frontier on a labeled val split (the bench layout:
<workdir>/valset + <workdir>/<ckpt>), picks the FASTEST tail whose AP50
drift vs f32 clears `drift_bar` (throughput falls monotonically with tail
depth: 4266 img/s at tail0 → 3478 at tail8, b1024 v5e), and writes the
choice into the checkpoint's trainmeta sidecar (`int8_tail`), which
api/face_detection.calibrate_int8 honors over any heuristic. The pin
travels WITH the artifact — serving hosts need no labels and no frontier
search.

Usage: python scripts/select_serving_tail.py [workdir] [ckpt_name]
       [--tails 0,3,4,5,6,8] [--drift-bar -0.02]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DRIFT_BAR = -0.02
CANDIDATE_TAILS = (0, 3, 4, 5, 6, 8)  # throughput order, fastest first


def measure_tail_ap(workdir: str, ckpt_name: str, tail: int | None):
    """Held-out AP50 of the full test mode at one explicit config.

    tail None = float32 reference; tail >= 0 = int8 with that bf16 tail.
    """
    import numpy as np

    from face_vijnana_yolov3_tpu.api.config import FdConf
    from face_vijnana_yolov3_tpu.api.face_detection import FaceDetectorPipeline
    from face_vijnana_yolov3_tpu.evals.detection import map_sweep

    valdir = os.path.join(workdir, "valset")
    tag = "f32" if tail is None else f"tail{tail}"
    sol = os.path.join(workdir, f"solution_seltail_{tag}.csv")
    conf = FdConf(
        test_path=valdir,
        output_file_path=sol,
        weights_path="missing.weights",
        model_path=os.path.join(workdir, ckpt_name),
        model_loading=True,
    )
    if tail is not None:
        conf.int8_bf16_tail = int(tail)
        conf.int8_tail_auto = False  # explicit candidate, no escalation
    precision = "float32" if tail is None else "int8"
    fd = FaceDetectorPipeline(conf, precision=precision)
    fd.test()
    if os.path.getsize(sol) == 0:
        return 0.0
    _, _, maps = map_sweep(os.path.join(valdir, "validation.csv"), sol,
                          out_h5=None)
    return float(maps[0])


def select_tail(workdir: str, ckpt_name: str,
                tails=CANDIDATE_TAILS, drift_bar: float = DRIFT_BAR,
                f32_ap50: float | None = None, log=print):
    """Walk `tails` fastest-first, return (chosen_tail, table) at the first
    candidate whose AP50 drift vs f32 clears `drift_bar`; falls back to the
    best-drift candidate when none clears (table rows: tail -> ap50)."""
    if f32_ap50 is None:
        f32_ap50 = measure_tail_ap(workdir, ckpt_name, None)
        log(f"[select_tail] f32 AP50 {f32_ap50:.4f}")
    table = {}
    best = None
    for t in tails:
        ap = measure_tail_ap(workdir, ckpt_name, t)
        table[int(t)] = round(ap, 4)
        drift = ap - f32_ap50
        log(f"[select_tail] tail {t}: AP50 {ap:.4f} (drift {drift:+.4f})")
        if best is None or ap > table[best]:
            best = int(t)
        if drift >= drift_bar:
            return int(t), table
    log(f"[select_tail] no candidate clears drift {drift_bar}; "
        f"falling back to best tail {best}")
    return best, table


def main():
    args = sys.argv[1:]

    def opt(name, default):
        if name in args:
            i = args.index(name)
            v = args[i + 1]
            del args[i:i + 2]
            return v
        return default

    tails = tuple(int(t) for t in opt("--tails", None).split(",")) \
        if "--tails" in args else CANDIDATE_TAILS
    drift_bar = float(opt("--drift-bar", str(DRIFT_BAR)))
    workdir = args[0] if args else ".bench_cache"
    ckpt_name = args[1] if len(args) > 1 else "fd_ckpt_qat"

    from face_vijnana_yolov3_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()

    from face_vijnana_yolov3_tpu.core.checkpoints import update_train_meta

    tail, table = select_tail(workdir, ckpt_name, tails, drift_bar)
    meta = update_train_meta(
        os.path.join(workdir, ckpt_name),
        int8_tail=tail, int8_tail_table=table,
    )
    print(f"[select_tail] pinned int8_tail={tail} into "
          f"{ckpt_name}.trainmeta.json ({meta})")


if __name__ == "__main__":
    main()
