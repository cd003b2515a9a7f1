"""Diagnose int8 PTQ accuracy collapse on a trained checkpoint.

Compares f32 folded vs int8 head outputs on real val images, for maxabs and
percentile calibrations, and localizes error growth along the trunk.

Usage: python scripts/probe_int8_collapse.py [workdir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fvy_synth_big"

    from face_vijnana_yolov3_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from face_vijnana_yolov3_tpu.core.checkpoints import load_checkpoint
    from face_vijnana_yolov3_tpu.models.detector import FaceDetectorModel
    from face_vijnana_yolov3_tpu.ops.letterbox import letterbox_host
    from face_vijnana_yolov3_tpu.utils.io import imread

    ckpt = load_checkpoint(os.path.join(workdir, "fd_ckpt"))
    model = FaceDetectorModel()
    folded = jax.device_put(model.fold(ckpt["params"], ckpt["state"]))

    import glob

    files = sorted(glob.glob(os.path.join(workdir, "valset", "*.jpg")))[:16]
    imgs = np.stack(
        [letterbox_host(imread(f) / 255, 416, "cubic")[0] for f in files]
    ).astype(np.float32)
    x = jnp.asarray(imgs)

    head_f32 = np.asarray(jax.jit(
        lambda w, x: model.apply_folded(w, x, compute_dtype=jnp.float32)
    )(folded, x))

    for pct in (None, 99.99, 99.9, 99.5):
        qparams = jax.device_put(model.quantize(folded, x[:8], percentile=pct))
        head_q = np.asarray(jax.jit(model.apply_quant)(qparams, x))
        err = np.abs(head_q - head_f32)
        # the postprocess thresholds sigmoid(ch0)*sigmoid(ch5); logit errors
        # around 0 matter most
        print(f"pct={pct}: head MAE {err.mean():.4f}  max {err.max():.3f}  "
              f"obj-ch MAE {err[..., 0].mean():.4f}", flush=True)

    # localize: activation ranges along the graph from calibration
    from face_vijnana_yolov3_tpu.models.quant import calibrate_folded

    scales = calibrate_folded(folded, x[:8], model.ops)
    # per-channel calibration yields ragged (C_i,) vectors; reduce each to its
    # max before stacking (np.asarray on the ragged list raises on numpy>=1.24)
    mx = np.array([float(np.max(v)) for v in scales]) * 127.0
    order = np.argsort(mx)[::-1][:8]
    print("largest activation maxabs positions:",
          [(int(i), float(mx[i])) for i in order], flush=True)


if __name__ == "__main__":
    main()
