"""End-to-end system demonstration on synthetic data (no UCCS needed).

Generates a synthetic face-like dataset (bright blobs on textured noise),
trains the detector FROM RANDOM INIT through the real training pipeline
(DetectionDataset → SPMD train step), runs the real evaluate mode
(solution_fd.csv) and scores it with the real mAP harness — the full
train→detect→NMS→CSV→AP loop the reference publishes numbers for, exercised
as one system.

Usage: python scripts/synthetic_e2e.py [workdir] [epochs] [n_train] [n_val] [precision]
Prints the per-threshold APs; at the defaults (25 epochs, 160 train images)
~3-4 minutes on a v5e chip. Larger n_train/epochs approach the reference's
training recipe scale (~19k steps) for a real generalization check.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_dataset(root: str, n_train: int = 160, n_val: int = 40,
                 image_size: int = 416, seed: int = 0):
    import pandas as pd
    from face_vijnana_yolov3_tpu.utils.io import imsave

    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)

    def gen_split(prefix, n):
        rows = []
        fid = 0
        for i in range(n):
            # Textured background.
            img = rng.uniform(40, 90, (image_size, image_size, 3))
            img += rng.normal(0, 12, (image_size, image_size, 3))
            name = f"{prefix}_{i}.jpg"
            for _ in range(int(rng.integers(1, 4))):
                r = int(rng.integers(24, 56))
                cx = int(rng.integers(r + 2, image_size - r - 2))
                cy = int(rng.integers(r + 2, image_size - r - 2))
                yy, xx = np.mgrid[0:image_size, 0:image_size]
                mask = (xx - cx) ** 2 + (yy - cy) ** 2 <= r * r
                img[mask] = [220, 190, 160]  # skin-ish bright disk
                rows.append({
                    "FACE_ID": fid, "FILE": name, "SUBJECT_ID": 1,
                    "FACE_X": cx - r, "FACE_Y": cy - r,
                    "FACE_WIDTH": 2 * r, "FACE_HEIGHT": 2 * r,
                })
                fid += 1
            imsave(os.path.join(root, name),
                   np.clip(img, 0, 255).astype(np.uint8))
        return pd.DataFrame(rows)

    gen_split("tr", n_train).to_csv(os.path.join(root, "training.csv"),
                                    index=False)
    val = gen_split("val", n_val)
    val.to_csv(os.path.join(root, "validation.csv"), index=False)
    return root


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fvy_synth"
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    n_train = int(sys.argv[3]) if len(sys.argv) > 3 else 160
    n_val = int(sys.argv[4]) if len(sys.argv) > 4 else 40
    precision = sys.argv[5] if len(sys.argv) > 5 else "float32"

    from face_vijnana_yolov3_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()

    from face_vijnana_yolov3_tpu.api.config import FdConf
    from face_vijnana_yolov3_tpu.api.face_detection import FaceDetectorPipeline
    from face_vijnana_yolov3_tpu.evals.detection import map_sweep

    print(f"dataset → {workdir} ({n_train} train / {n_val} val)")
    make_dataset(workdir, n_train=n_train, n_val=n_val)

    conf = FdConf(
        raw_data_path=workdir,
        test_path=workdir,
        output_file_path=os.path.join(workdir, "solution_fd.csv"),
        weights_path="missing.weights",  # train from random init
        model_path=os.path.join(workdir, "fd_ckpt"),
    )
    conf.hps.lr = 1e-3
    conf.hps.epochs = epochs
    conf.hps.batch_size = 16
    conf.hps.face_conf_th = 0.5
    conf.checkpoint_every = 10       # kill-resume for long runs
    conf.dataset_cache = "samples"   # 1-core host: don't re-decode per epoch
    from face_vijnana_yolov3_tpu.core.checkpoints import checkpoint_exists

    if checkpoint_exists(conf.model_path):
        print("resuming from", conf.model_path)
        conf.model_loading = True

    fd = FaceDetectorPipeline(conf, precision=precision)
    losses = fd.train()
    print(f"loss: first {losses[0]:.4f} → last {losses[-1]:.4f}")

    # Validation solution: restrict the glob to val images by pointing
    # test_path at a symlink dir of val files.
    valdir = os.path.join(workdir, "valset")
    os.makedirs(valdir, exist_ok=True)
    import glob as _g
    import shutil

    for f in _g.glob(os.path.join(workdir, "val_*.jpg")):
        dst = os.path.join(valdir, os.path.basename(f))
        if not os.path.exists(dst):
            shutil.copy(f, dst)
    import pandas as pd

    pd.read_csv(os.path.join(workdir, "validation.csv")).to_csv(
        os.path.join(valdir, "validation.csv"), index=False
    )
    conf.test_path = valdir
    fd._jit_detect = None  # rebuild with trained params
    fd.evaluate()

    try:
        ps, rs, maps = map_sweep(
            os.path.join(valdir, "validation.csv"),
            conf.output_file_path,
            out_h5=os.path.join(workdir, "p_r_curve.h5"),
        )
    except ValueError as e:
        # Short quick-check runs sometimes clear face_conf_th on zero val
        # images — a truthful (if useless) result of undertraining, not a
        # pipeline failure. Report AP 0 instead of a crash; scale
        # epochs/n_train up for a real generalization run. Only the two
        # "nothing to score" errors qualify — any other ValueError (malformed
        # rows etc.) is a genuine failure and must propagate.
        if "to score" not in str(e):
            raise
        print(f"scoring: {e}")
        print("AP50 = 0.0000  mAP = 0.0000  (no detections above "
              f"face_conf_th={conf.hps.face_conf_th})")
        return
    print("AP50..AP95:", [round(float(m), 4) for m in maps])
    print(f"AP50 = {maps[0]:.4f}  mAP = {np.mean(maps):.4f}")


if __name__ == "__main__":
    main()
