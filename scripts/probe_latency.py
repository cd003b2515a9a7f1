"""Single-image / small-batch 416^2 fused-detect LATENCY on the real chip.

The throughput headline (bench.py) runs b512-b1024; the reference's actual
use case is one image per call (reference src/space/face_detection.py:885 —
`detect` takes a single letterboxed image). This probe records the device-side
program latency at serving batch sizes 1/4/8 for the three serving
precisions, via the same chained-lax.scan methodology as bench.py (identical
re-executions get deduped by this runtime, and eager per-call dispatch over
the tunneled device would measure RPC latency, not the program — a local host
dispatches in ~us).

Usage: python scripts/probe_latency.py [batches...]   (default 1 4 8)
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_ITER = 20


def main():
    batches = [int(a) for a in sys.argv[1:]] or [1, 4, 8]

    from face_vijnana_yolov3_tpu.utils.runtime import (
        enable_compile_cache,
        tpu_compiler_options,
    )

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from face_vijnana_yolov3_tpu.models.detector import FaceDetectorModel
    from face_vijnana_yolov3_tpu.ops.postprocess import (
        FacePostprocessConfig, face_postprocess,
    )

    model = FaceDetectorModel()
    params, state = model.init(jax.random.PRNGKey(0))
    folded = jax.device_put(model.fold(params, state))
    cfg = FacePostprocessConfig()
    x_calib = jax.random.uniform(
        jax.random.PRNGKey(1), (8, 416, 416, 3), jnp.float32
    )
    qparams = jax.device_put(model.quantize(folded, x_calib))

    paths = {
        "int8": (qparams, lambda w, xi: model.apply_quant(w, xi)),
        "bf16+f32front2": (
            folded,
            lambda w, xi: model.apply_folded(
                w, xi, compute_dtype=jnp.bfloat16, f32_front_blocks=2
            ),
        ),
        "bf16": (
            folded,
            lambda w, xi: model.apply_folded(w, xi, compute_dtype=jnp.bfloat16),
        ),
    }

    for batch in batches:
        x = jax.random.uniform(
            jax.random.PRNGKey(0), (batch, 416, 416, 3), jnp.bfloat16
        )
        for name, (w, fwd) in paths.items():

            @partial(jax.jit,
                     compiler_options=tpu_compiler_options("serving"))
            def run(w, images):
                def body(carry, _):
                    xi = images + (0.0 * carry[0]).astype(images.dtype)
                    head = fwd(w, xi)
                    cands, counts = jax.vmap(
                        lambda h: face_postprocess(h, cfg)
                    )(head)
                    return counts.astype(jnp.float32), cands[:, 0, 0]

                _, outs = jax.lax.scan(
                    body, jnp.zeros((batch,), jnp.float32), None,
                    length=N_ITER,
                )
                return outs

            jax.block_until_ready(run(w, x))
            t0 = time.perf_counter()
            jax.block_until_ready(run(w, x))
            dt = (time.perf_counter() - t0) / N_ITER
            print(f"416^2 fused detect b{batch} {name:>14}: "
                  f"{dt * 1e3:6.2f} ms/step ({batch / dt:7.1f} img/s)",
                  flush=True)


if __name__ == "__main__":
    main()
