"""High-resolution (832^2) fused-detect latency/throughput on the real chip.

Single-chip baseline for the spatial-sharding axis (parallel/spatial.py): SP
over N chips divides this step time ~N ways (halo exchange is 1-row per 3x3
conv, negligible vs conv FLOPs); the multi-chip program itself is validated
exactly on the virtual mesh (tests/test_parallel_spatial.py 832^2 test).

Usage: python scripts/probe_832.py [batches...]   (default 1 2 8)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_ITER = 6


def main():
    batches = [int(a) for a in sys.argv[1:]] or [1, 2, 8]

    from face_vijnana_yolov3_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from face_vijnana_yolov3_tpu.models.detector import FaceDetectorModel
    from face_vijnana_yolov3_tpu.ops.postprocess import (
        FacePostprocessConfig, face_postprocess,
    )

    model = FaceDetectorModel(image_size=832)
    params, state = model.init(jax.random.PRNGKey(0))
    folded = jax.device_put(model.fold(params, state))
    cfg = FacePostprocessConfig(image_size=832, grid=26)

    for batch in batches:
        x = jax.random.uniform(
            jax.random.PRNGKey(0), (batch, 832, 832, 3), jnp.bfloat16
        )

        @jax.jit
        def run(w, images):
            # chained executions (identical reruns get deduped — PROFILE.md)
            def body(carry, _):
                xi = images + (0.0 * carry[0]).astype(images.dtype)
                head = model.apply_folded(w, xi, compute_dtype=jnp.bfloat16)
                cands, counts = jax.vmap(
                    lambda h: face_postprocess(h, cfg)
                )(head)
                return counts.astype(jnp.float32), cands[:, 0, 0]

            _, outs = jax.lax.scan(
                body, jnp.zeros((batch,), jnp.float32), None, length=N_ITER
            )
            return outs

        jax.block_until_ready(run(folded, x))
        t0 = time.perf_counter()
        jax.block_until_ready(run(folded, x))
        dt = (time.perf_counter() - t0) / N_ITER
        print(f"832^2 fused detect b{batch}: {dt * 1e3:.1f} ms/step "
              f"({batch / dt:.1f} img/s)  "
              f"[SP over N chips divides this ~N ways]", flush=True)


if __name__ == "__main__":
    main()
