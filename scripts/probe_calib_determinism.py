"""Root-cause probe: WHERE does int8 calibration nondeterminism live?

Round-3 finding (STATUS.md): nominally identical calibrations of the same
400-epoch bench checkpoint scored held-out AP50 0.67 vs 0.84 — suspected
per-channel auto-calib margin ties amplified by float reduction noise, but
never isolated. This probe bisects the chain stage by stage, bitwise:

  A. fold(params, state)              — run twice, compare folded params
  B. calibrate_folded (auto)          — run 3x, compare scale vectors
  C. quantize_folded (fixed scales)   — run twice, compare int8 kernels
  D. apply_quant (fixed qparams)      — run twice, compare heads
  E. quantize_autotail (full chain)   — run twice, compare (tail, err)
  F. cross-process: save B's scales to --state; a second invocation
     compares against the saved ones.

Usage:  python scripts/probe_calib_determinism.py [workdir] [--state FILE]
        workdir defaults to /root/repo/.bench_cache
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bitcmp(tree_a, tree_b):
    """Max abs diff + count of differing elements across two pytrees."""
    import jax

    leaves_a = jax.tree_util.tree_leaves(tree_a)
    leaves_b = jax.tree_util.tree_leaves(tree_b)
    assert len(leaves_a) == len(leaves_b)
    n_diff, max_abs = 0, 0.0
    for a, b in zip(leaves_a, leaves_b):
        a = np.asarray(a)
        b = np.asarray(b)
        neq = a != b
        n_diff += int(np.sum(neq))
        if np.any(neq):
            d = np.abs(a.astype(np.float64) - b.astype(np.float64))
            max_abs = max(max_abs, float(d.max()))
    return n_diff, max_abs


def main():
    from face_vijnana_yolov3_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from face_vijnana_yolov3_tpu.core.checkpoints import load_checkpoint
    from face_vijnana_yolov3_tpu.models import quant
    from face_vijnana_yolov3_tpu.models.detector import FaceDetectorModel
    from face_vijnana_yolov3_tpu.ops.letterbox import letterbox_host
    from face_vijnana_yolov3_tpu.ops.postprocess import FacePostprocessConfig
    from face_vijnana_yolov3_tpu.utils.io import imread

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    workdir = args[0] if args else "/root/repo/.bench_cache"
    state_file = None
    for a in sys.argv[1:]:
        if a.startswith("--state="):
            state_file = a.split("=", 1)[1]

    loaded = load_checkpoint(os.path.join(workdir, "fd_ckpt"))
    params, state = loaded["params"], loaded["state"]
    model = FaceDetectorModel()

    val_files = sorted(glob.glob(os.path.join(workdir, "val_*.jpg")))[:32]
    x_calib = jnp.asarray(
        np.stack(
            [letterbox_host(imread(f) / 255.0, 416, "cubic")[0] for f in val_files]
        ).astype(np.float32)
    )
    print(f"# calib batch {x_calib.shape} from {len(val_files)} files")

    # A. fold twice
    f1 = jax.device_get(model.fold(params, state))
    f2 = jax.device_get(model.fold(params, state))
    print("A fold x2:", bitcmp(f1, f2))
    folded = model.fold(params, state)

    # B. calibrate_folded (auto) 3x
    scales = []
    for _ in range(3):
        s = quant.calibrate_folded(folded, x_calib[:16], model.ops, percentile="auto")
        scales.append(s)
    print("B calibrate x3 (1v2):", bitcmp(scales[0], scales[1]),
          "(1v3):", bitcmp(scales[0], scales[2]))

    # C. quantize_folded with FIXED scales, twice
    q1 = quant.quantize_folded(folded, None, model.ops, act_scales=scales[0])
    q2 = quant.quantize_folded(folded, None, model.ops, act_scales=scales[0])
    print("C quantize x2:", bitcmp(
        {k: v for k, v in q1.items() if k != "act_scales"},
        {k: v for k, v in q2.items() if k != "act_scales"}))

    # D. apply_quant with FIXED qparams, twice
    qd = jax.device_put(q1)
    h1 = np.asarray(model.apply_quant(qd, x_calib))
    h2 = np.asarray(model.apply_quant(qd, x_calib))
    print("D apply_quant x2:", bitcmp(h1, h2))

    # E. full quantize_autotail chain, twice
    cfg = FacePostprocessConfig()
    for trial in range(2):
        q, tail, err = quant.quantize_autotail(
            model, folded, x_calib,
            scorer=quant.detection_box_f1_scorer(cfg))
        print(f"E autotail trial {trial}: tail={tail} err={err:.6f}")

    # F. cross-process comparison of the B scales
    if state_file:
        flat = np.concatenate([np.asarray(s, np.float64) for s in scales[0]])
        if os.path.exists(state_file):
            prev = np.load(state_file)["scales"]
            neq = int(np.sum(prev != flat))
            print(f"F cross-process: {neq} of {flat.size} scale entries "
                  f"differ (max abs diff "
                  f"{np.abs(prev - flat).max() if neq else 0.0:.3e})")
        else:
            np.savez(state_file, scales=flat)
            print(f"F saved scales to {state_file}; run again to compare")


if __name__ == "__main__":
    main()
