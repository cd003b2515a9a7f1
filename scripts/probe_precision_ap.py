"""AP parity across serving precisions on a trained checkpoint.

Loads a trained detector checkpoint, runs the full evaluate mode (fused
letterbox+detect+NMS -> solution_fd.csv) at float32 / bfloat16 / int8-PTQ,
and scores each against held-out GT with the real mAP harness — the
end-to-end accuracy evidence for the quantized serving paths.

Usage: python scripts/probe_precision_ap.py <workdir-with-valset-and-ckpt>
(defaults to the synthetic_e2e layout: <workdir>/valset + <workdir>/fd_ckpt)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fvy_synth_big"

    from face_vijnana_yolov3_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()

    from face_vijnana_yolov3_tpu.api.config import FdConf
    from face_vijnana_yolov3_tpu.api.face_detection import FaceDetectorPipeline
    from face_vijnana_yolov3_tpu.evals.detection import map_sweep

    valdir = os.path.join(workdir, "valset")
    args = sys.argv[2:]
    only = None
    if "--only" in args:
        i = args.index("--only")
        only = args[i + 1]
        args = args[:i] + args[i + 2:]
    ckpt_name = "fd_ckpt"
    if "--ckpt" in args:  # e.g. --ckpt fd_ckpt_qat (the recipe-v2 artifact)
        i = args.index("--ckpt")
        ckpt_name = args[i + 1]
        args = args[:i] + args[i + 2:]
    tails = (1, 2, 4, 8)
    if "--tails" in args:  # bf16-tail sweep depths, e.g. --tails 2,4,5,6,8
        i = args.index("--tails")
        tails = tuple(int(t) for t in args[i + 1].split(",") if t)
        args = args[:i] + args[i + 2:]
    def parse_pct(a):
        # "<pct>[+bc]" — +bc turns on PTQ bias correction (quant.py)
        bc = a.endswith("+bc")
        if bc:
            a = a[:-3]
        return (a if a == "auto" else float(a)), bc

    pcts = [parse_pct(a) for a in args] or [
        (0.0, False), ("auto", False), (99.99, False), (99.9, False),
        (99.5, False)]
    # rows: (precision, int8 pct, int8 bf16-tail, bf16 f32-front, front mode,
    #        bias_correct)
    rows = ([("float32", 0.0, 0, 0, "f32", False)]
            # bf16 f32-front sweep (FdConf.bf16_f32_front; default 2):
            # front=0 is the round-1 all-bf16 trunk that collapses on rare
            # images (scripts/probe_bf16_degen.py)
            + [("bfloat16", 0.0, 0, f, "f32", False) for f in (0, 1, 2)]
            # int8-front hybrid (FdConf.bf16_front_mode="int8") — measured
            # NEGATIVE result: AP50 0.0957/0.1731 on the bench checkpoint
            # (int8's absolute grid noise in the brittle front, amplified by
            # the bf16 tail; full int8's requant grids absorb the same noise)
            + [("bfloat16", 99.99, 0, f, "int8", False) for f in (1, 2)]
            + [("int8", p, 0, 0, "f32", bc) for p, bc in pcts]
            # mixed bf16 tail (models/quant.py bf16_tail_blocks) at the
            # shipped default calibration ("auto")
            + [("int8", "auto", t, 0, "f32", False) for t in tails])
    for precision, pct, tail, front, front_mode, bc in rows:
        tag = precision if not pct else f"{precision}-p{pct}"
        if bc:
            tag += "-bc"
        if tail:
            tag += f"-tail{tail}"
        if precision == "bfloat16":
            tag += f"-front{front}"
            if front_mode != "f32":
                tag += f"-{front_mode}front"
        if only and only not in tag:
            continue
        sol = os.path.join(workdir, f"solution_fd_{tag}.csv")
        conf = FdConf(
            test_path=valdir,
            output_file_path=sol,
            weights_path="missing.weights",
            model_path=os.path.join(workdir, ckpt_name),
            model_loading=True,
        )
        conf.hps.face_conf_th = 0.5
        conf.int8_calib_percentile = pct
        conf.int8_bias_correct = bc
        conf.int8_bf16_tail = tail
        # Rows probe EXPLICIT configs; the self-checking escalation
        # (int8_tail_auto) would silently change what a tail-0 row measures.
        conf.int8_tail_auto = False
        conf.bf16_f32_front = front
        conf.bf16_front_mode = front_mode
        fd = FaceDetectorPipeline(conf, precision=precision)
        fd.test()  # CSV only, no drawing
        if os.path.getsize(sol) == 0:
            print(f"{tag:14s}: NO DETECTIONS (empty solution)", flush=True)
            continue
        ps, rs, maps = map_sweep(
            os.path.join(valdir, "validation.csv"), sol, out_h5=None
        )
        print(f"{tag:14s}: AP50 {maps[0]:.4f}  mAP {np.mean(maps):.4f}",
              flush=True)


if __name__ == "__main__":
    main()
