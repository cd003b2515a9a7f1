"""Localize the bf16 serving collapse to trunk vs head on the bad images.

bench.py round-2 run: f32 AP50 0.7932, bf16 0.4548 on the 400-epoch robust
checkpoint. The bf16 solution CSV shows bursts of degenerate boxes (w/h == 0,
score ~1.0) on specific images (val_55, val_23, val_31 ...) that the earlier
probe_bf16_bisect (first 8 val images only, f32 head) never saw.

This probe runs the REAL serving composition (fold -> apply_folded) on those
images in four dtype hybrids:
  f32/f32 (reference), bf16/bf16 (serving), bf16 trunk + f32 head,
  f32 trunk + bf16 head
and reports per-image score-threshold cell counts + max score + the head
channel magnitudes at flipped cells.

Usage: python scripts/probe_bf16_degen.py [img ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BAD = ["val_55", "val_23", "val_31", "val_0", "val_1", "val_2"]


def main():
    from face_vijnana_yolov3_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from face_vijnana_yolov3_tpu.core.checkpoints import load_checkpoint
    from face_vijnana_yolov3_tpu.models import darknet
    from face_vijnana_yolov3_tpu.models.detector import (
        FaceDetectorModel,
        _head_conv,
    )
    from face_vijnana_yolov3_tpu.ops.letterbox import letterbox_host
    from face_vijnana_yolov3_tpu.utils.io import imread

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    valdir = os.path.join(repo, ".bench_cache", "valset")
    names = sys.argv[1:] or BAD
    files = [os.path.join(valdir, n + ".jpg") for n in names]

    model = FaceDetectorModel()
    ckpt = load_checkpoint(os.path.join(repo, ".bench_cache", "fd_ckpt"))
    folded = jax.device_put(model.fold(ckpt["params"], ckpt["state"]))

    x = jnp.asarray(np.stack([
        letterbox_host(imread(f) / 255.0, 416, "cubic")[0] for f in files
    ]).astype(np.float32))

    def run(trunk_dtype, head_dtype):
        def f(w, v):
            outs = darknet.apply_graph_folded(
                w, v, model.ops, compute_dtype=trunk_dtype
            )
            feat = outs["trunk"].astype(head_dtype)
            return _head_conv(feat, w["head"], head_dtype).astype(jnp.float32)

        return np.asarray(jax.jit(f)(folded, x))

    variants = {
        "f32/f32 ": (jnp.float32, jnp.float32),
        "bf16/bf16": (jnp.bfloat16, jnp.bfloat16),
        "bf16/f32 ": (jnp.bfloat16, jnp.float32),
        "f32/bf16 ": (jnp.float32, jnp.bfloat16),
    }
    heads = {k: run(*v) for k, v in variants.items()}
    ref = heads["f32/f32 "]

    def scores(h):
        obj = 1 / (1 + np.exp(-h[..., 0]))
        return obj / (1 + np.exp(-h[..., 5]))

    sc_ref = scores(ref)
    for label, h in heads.items():
        sc = scores(h)
        print(f"== {label}")
        for i, n in enumerate(names):
            above = int((sc[i] >= 0.5).sum())
            flips = int(((sc[i] >= 0.5) != (sc_ref[i] >= 0.5)).sum())
            mae = float(np.abs(h[i] - ref[i]).mean())
            print(
                f"  {n:8s}: cells>=th {above:3d} (flips {flips:3d})  "
                f"max score {sc[i].max():.4f}  head MAE {mae:.4f}  "
                f"head |max| {np.abs(h[i]).max():.1f}"
            )
    # where do the bf16/bf16 flips sit, and what do their channels look like?
    h = heads["bf16/bf16"]
    sc = scores(h)
    for i, n in enumerate(names):
        fl = np.argwhere((sc[i] >= 0.5) & (sc_ref[i] < 0.5))
        if len(fl):
            print(f"-- {n}: {len(fl)} new cells; first 5:")
            for r, c in fl[:5]:
                print(
                    f"   cell ({r:2d},{c:2d}) bf16 ch={np.round(h[i, r, c], 2)}"
                    f" | f32 ch={np.round(ref[i, r, c], 2)}"
                )


if __name__ == "__main__":
    main()
