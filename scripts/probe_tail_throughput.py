"""Serving throughput of mixed int8 configs (bf16 tail / islands) at b1024 —
the bench.py scan-chained methodology on the bench checkpoint.

Usage: python scripts/probe_tail_throughput.py [workdir] cfg ...
       cfg syntax like probe_int8_mix: "<tail>[+ops][@percentile]"
       default: 8@auto 6@auto 5@auto
"""

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_ITER = 10


def main():
    from face_vijnana_yolov3_tpu.utils.runtime import (
        enable_compile_cache,
        tpu_compiler_options,
    )

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from face_vijnana_yolov3_tpu.core.checkpoints import load_checkpoint
    from face_vijnana_yolov3_tpu.models.detector import FaceDetectorModel
    from face_vijnana_yolov3_tpu.ops.letterbox import letterbox_host
    from face_vijnana_yolov3_tpu.ops.postprocess import (
        FacePostprocessConfig,
        face_postprocess,
    )
    from face_vijnana_yolov3_tpu.utils.io import imread

    args = sys.argv[1:]
    workdir = args.pop(0) if args and os.path.isdir(args[0]) else \
        "/root/repo/.bench_cache"
    cfgs = args or ["8@auto", "6@auto", "5@auto"]
    batch = 1024

    loaded = load_checkpoint(os.path.join(workdir, "fd_ckpt"))
    model = FaceDetectorModel()
    folded = jax.device_put(model.fold(loaded["params"], loaded["state"]))
    cfg_pp = FacePostprocessConfig()

    val_files = sorted(glob.glob(os.path.join(workdir, "val_*.jpg")))[:16]
    x_calib = jnp.asarray(np.stack([
        letterbox_host(imread(f) / 255.0, 416, "cubic")[0] for f in val_files
    ]).astype(np.float32))

    x = jax.random.uniform(jax.random.PRNGKey(0), (batch, 416, 416, 3),
                           jnp.bfloat16)
    results = {}
    for cfg in cfgs:
        body, _, perc = cfg.partition("@")
        perc = perc or "msegrid"
        tail_s, _, ops_s = body.partition("+")
        tail = int(tail_s)
        ops = tuple(int(o) for o in ops_s.split(",")) if ops_s else ()
        q = model.quantize(
            folded, x_calib,
            percentile=(None if perc == "maxabs" else perc),
            bf16_tail_blocks=tail, bf16_ops=ops,
        )
        w = jax.device_put(q)
        tail_start = q.get("tail_start")
        if tail_start is not None:
            w["tail_start"] = int(tail_start)

        from functools import partial

        @partial(jax.jit, compiler_options=tpu_compiler_options("serving"))
        def run(images):
            def body_fn(carry, _):
                xi = images + (0.0 * carry[0]).astype(images.dtype)
                head = model.apply_quant(w, xi)
                cands, counts = jax.vmap(
                    lambda h: face_postprocess(h, cfg_pp))(head)
                return counts.astype(jnp.float32), cands[:, 0, 0]

            _, outs = jax.lax.scan(
                body_fn, jnp.zeros((batch,), jnp.float32), None,
                length=N_ITER)
            return outs

        jax.block_until_ready(run(x))
        t0 = time.perf_counter()
        jax.block_until_ready(run(x))
        dt = (time.perf_counter() - t0) / N_ITER
        ips = batch / dt
        print(f"## {cfg}: {ips:.0f} img/s (b{batch})", flush=True)
        results[cfg] = round(ips, 1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
