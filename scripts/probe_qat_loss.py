"""Diagnose the QAT distillation loss trajectory on the bench checkpoint.

probe_qat.py showed QAT-refined int8 COLLAPSES AP (0.80 -> 0.36 at 100 steps)
on the robust checkpoint. This probe watches the distill MSE itself under a
few (lr, trainable-subset) settings to separate "objective decreasing but
mis-deployed" (a bug) from "objective not decreasing, STE random walk at the
quantization noise floor" (an optimization reality on a
perturbation-sensitive checkpoint).

Usage: python scripts/probe_qat_loss.py [workdir] [steps] [lr[:tail_blocks] ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else ".bench_cache"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 100

    def parse(a):  # "lr[:tail_blocks]"
        s, _, t = a.partition(":")
        return float(s), int(t or 0)

    settings = [parse(a) for a in sys.argv[3:]] or [(1e-5, 0), (1e-5, 4)]

    from face_vijnana_yolov3_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()

    import jax.numpy as jnp

    from face_vijnana_yolov3_tpu.api.config import FdConf
    from face_vijnana_yolov3_tpu.api.face_detection import FaceDetectorPipeline
    from face_vijnana_yolov3_tpu.models import qat, quant
    from face_vijnana_yolov3_tpu.models.detector import _head_conv
    from face_vijnana_yolov3_tpu.ops.letterbox import letterbox_host
    from face_vijnana_yolov3_tpu.utils.io import imread

    S = 416
    t0 = time.time()
    tr_files = sorted(
        f for f in os.listdir(workdir)
        if f.startswith("tr_") and f.endswith(".jpg")
    )[:48]
    images = np.stack([
        letterbox_host(imread(os.path.join(workdir, f)) / 255, S, "cubic")[0]
        for f in tr_files
    ]).astype(np.float32)
    print(f"[{time.time()-t0:5.0f}s] {len(tr_files)} images letterboxed",
          flush=True)

    conf = FdConf(weights_path="missing.weights",
                  model_path=os.path.join(workdir, "fd_ckpt"),
                  model_loading=True)
    pipe = FaceDetectorPipeline(conf, precision="float32")
    print(f"[{time.time()-t0:5.0f}s] checkpoint loaded", flush=True)
    folded = pipe.model.fold(pipe.params, pipe.state)
    scales = quant.calibrate_folded(folded, jnp.asarray(images[:16]),
                                    pipe.model.ops, percentile=99.99)
    print(f"[{time.time()-t0:5.0f}s] calibrated", flush=True)

    def head_fn(outs, prm):
        return _head_conv(outs["trunk"], prm["head"], jnp.float32)

    for lr, tail in settings:
        sub = f"last {tail} blocks" if tail else "all blocks"
        print(f"\n=== lr={lr} steps={steps} ({sub} trainable) ===", flush=True)
        qat.distill_folded(
            folded, images, pipe.model.ops, act_scales=scales,
            head_fn=head_fn, steps=steps, lr=lr, tail_blocks=tail,
            log_every=max(1, steps // 20),
        )
        print(f"[{time.time()-t0:5.0f}s] lr={lr} tail={tail} done", flush=True)


if __name__ == "__main__":
    main()
