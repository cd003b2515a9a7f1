"""Accuracy probe: int8 PTQ vs bf16 serving AP on a trained synthetic model.

Trains the detector to overfit a small synthetic set (as in the overfit sanity
run, STATUS.md), then scores the SAME trained weights through the f32, bf16,
and int8 detect paths with the real mAP harness. Run on the TPU.

Usage: python scripts/probe_int8_acc.py [workdir] [epochs]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from face_vijnana_yolov3_tpu.utils.runtime import enable_compile_cache

enable_compile_cache()

from scripts.synthetic_e2e import make_dataset  # noqa: E402
from face_vijnana_yolov3_tpu.api.config import FdConf  # noqa: E402
from face_vijnana_yolov3_tpu.api.face_detection import (  # noqa: E402
    FaceDetectorPipeline,
)
from face_vijnana_yolov3_tpu.evals.detection import map_sweep  # noqa: E402


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fvy_int8_acc"
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 300

    make_dataset(workdir, n_train=8, n_val=1)
    # Overfit protocol: eval on the training images (train=eval).
    import pandas as pd

    tr = pd.read_csv(os.path.join(workdir, "training.csv"))
    tr.to_csv(os.path.join(workdir, "validation.csv"), index=False)
    for f in os.listdir(workdir):
        if f.startswith("val_") and f.endswith(".jpg"):
            os.remove(os.path.join(workdir, f))

    conf = FdConf(
        raw_data_path=workdir,
        test_path=workdir,
        output_file_path=os.path.join(workdir, "solution_fd.csv"),
        weights_path="missing.weights",
        model_path=os.path.join(workdir, "fd_ckpt"),
    )
    conf.hps.lr = 1e-3
    conf.hps.epochs = epochs
    conf.hps.batch_size = 8
    conf.hps.face_conf_th = 0.5

    fd = FaceDetectorPipeline(conf)
    losses = fd.train()
    print(f"loss: first {losses[0]:.4f} -> last {losses[-1]:.4f}", flush=True)

    conf.model_loading = True
    gt = os.path.join(workdir, "validation.csv")
    for precision in ("float32", "bfloat16", "int8"):
        conf.output_file_path = os.path.join(workdir, f"solution_{precision}.csv")
        pipe = FaceDetectorPipeline(conf, precision=precision)
        pipe.evaluate()
        _, _, maps = map_sweep(
            gt, conf.output_file_path,
            out_h5=os.path.join(workdir, f"prc_{precision}.h5"),
        )
        print(f"{precision:9s}: AP50 {maps[0]:.4f}  mAP {np.mean(maps):.4f}",
              flush=True)


if __name__ == "__main__":
    main()
