"""Localize the bf16 serving collapse on a trained checkpoint.

probe_precision_ap on the 220-epoch .bench_cache checkpoint found bf16 AP50
0.0017 vs f32 0.3830 (int8 survives at 0.17-0.31) — the bf16 detect path is
numerically destroyed on this checkpoint while round-1's overfit checkpoint
served bf16 at AP parity. This probe bisects the folded trunk: run ops[:t] in
one dtype and ops[t:] in the other, measure head-logit error and
score-threshold flips vs the f32 reference, for boundaries at every residual
block opener.

Usage: python scripts/probe_bf16_bisect.py [workdir=.bench_cache] [img ...]

Extra args select specific valset images (default: first 8 sorted). Round-2
finding (scripts/probe_bf16_degen.py): bf16-trunk amplification is
INPUT-specific — the first-8 images are tame on the 400-epoch checkpoint
while val_55/val_23/val_31 blow up 2-4x; bisect those by name.
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench_cache")

    from face_vijnana_yolov3_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from face_vijnana_yolov3_tpu.core.checkpoints import load_checkpoint
    from face_vijnana_yolov3_tpu.models import darknet
    from face_vijnana_yolov3_tpu.models.detector import FaceDetectorModel, _head_conv
    from face_vijnana_yolov3_tpu.ops.letterbox import letterbox_host
    from face_vijnana_yolov3_tpu.utils.io import imread

    model = FaceDetectorModel()
    ckpt = load_checkpoint(os.path.join(workdir, "fd_ckpt"))
    params, state = ckpt["params"], ckpt["state"]
    folded = model.fold(params, state)
    folded["head"] = params["head"]
    folded = jax.device_put(folded)

    if len(sys.argv) > 2:
        files = [os.path.join(workdir, "valset", n + ".jpg")
                 for n in sys.argv[2:]]
    else:
        files = sorted(glob.glob(os.path.join(workdir, "valset", "*.jpg")))[:8]
    x = jnp.asarray(np.stack([
        letterbox_host(imread(f) / 255.0, 416, "cubic")[0] for f in files
    ]).astype(np.float32))

    ops = model.ops
    starts = [i for i, op in enumerate(ops) if op[0] == "save"]
    cuts = [0] + starts + [len(ops) - 1]  # trunk output op at the end

    def hybrid(folded, x, t, first_dtype, second_dtype):
        """ops[:t] in first_dtype, ops[t:] in second_dtype, f32 head."""
        outs = darknet.apply_graph_folded(
            folded, x, list(ops[:t]) + [("output", "__cut")],
            compute_dtype=first_dtype,
        ) if t > 0 else {"__cut": x}
        h = outs["__cut"].astype(jnp.float32)
        outs2 = darknet.apply_graph_folded(
            folded, h, list(ops[t:]), compute_dtype=second_dtype
        )
        feat = outs2["trunk"].astype(jnp.float32)
        return _head_conv(feat, folded["head"], jnp.float32)

    ref = np.asarray(jax.jit(
        lambda w, v: hybrid(w, v, 0, jnp.float32, jnp.float32)
    )(folded, x))
    obj_ref = 1 / (1 + np.exp(-ref[..., 0]))
    score_ref = obj_ref / (1 + np.exp(-ref[..., 5]))
    above = score_ref >= 0.5
    print(f"f32 reference: {above.sum()} cells above th over {len(files)} imgs")

    # magnitude along the trunk (f32): where do activations blow up?
    probe_ops = []
    for i, op in enumerate(ops):
        probe_ops.append(op)
        if op[0] == "add":
            probe_ops.append(("output", f"pos_{i}"))
    probe_ops.append(("output", "trunk"))
    mags = jax.jit(lambda w, v: jax.tree.map(
        lambda t: jnp.max(jnp.abs(t)),
        darknet.apply_graph_folded(w, v, probe_ops, compute_dtype=jnp.float32),
    ))(folded, x)
    mags = {k: float(v) for k, v in mags.items()}
    print("post-add |act| maxes:",
          {k: round(v, 1) for k, v in sorted(mags.items())}, flush=True)

    for label, (d1, d2) in (("bf16 FRONT (f32 tail)", (jnp.bfloat16, jnp.float32)),
                            ("bf16 TAIL (f32 front)", (jnp.float32, jnp.bfloat16))):
        print(f"--- {label}: boundary sweep")
        for t in cuts:
            out = np.asarray(jax.jit(
                lambda w, v, tt=t: hybrid(w, v, tt, d1, d2)
            )(folded, x))
            mae = np.abs(out - ref).mean()
            obj = 1 / (1 + np.exp(-out[..., 0]))
            sc = obj / (1 + np.exp(-out[..., 5]))
            flips = int((above != (sc >= 0.5)).sum())
            print(f"  t={t:3d}: head MAE {mae:9.4f}  th-flips {flips}",
                  flush=True)


if __name__ == "__main__":
    main()
