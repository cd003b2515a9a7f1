"""Benchmark: fused 416² face detect+NMS throughput on one TPU chip.

Measures the flagship serving path — folded bf16 Darknet-53 trunk + 6ch head +
fused on-device decode/NMS/top-k postprocess — in images/sec on the attached
chip. The reference runs this pipeline one image at a time with host-side numpy
decode/NMS (reference src/space/face_detection.py:885-949); the rebuild target
from BASELINE.json is ≥5000 img/s on a v5e-8, i.e. 625 img/s/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import jax
    from face_vijnana_yolov3_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from face_vijnana_yolov3_tpu.models.detector import FaceDetectorModel
    from face_vijnana_yolov3_tpu.ops.postprocess import (
        FacePostprocessConfig,
        face_postprocess,
    )

    model = FaceDetectorModel()
    params, state = model.init(jax.random.PRNGKey(0))
    folded = model.fold(params, state)
    folded = jax.device_put(folded)
    cfg = FacePostprocessConfig()

    @jax.jit
    def detect(folded, images):
        head = model.apply_folded(folded, images, compute_dtype=jnp.bfloat16)
        return jax.vmap(lambda h: face_postprocess(h, cfg))(head)

    best = 0.0
    best_batch = 0
    for batch in (64, 128):
        try:
            # Generate inputs on device: host-side RNG for 416² batches is slow
            # on this 1-core host and irrelevant to the measured path.
            x = jax.random.uniform(
                jax.random.PRNGKey(0), (batch, 416, 416, 3), jnp.bfloat16
            )
            cands, counts = detect(folded, x)
            jax.block_until_ready((cands, counts))
            n_iter = 10
            t0 = time.perf_counter()
            for _ in range(n_iter):
                cands, counts = detect(folded, x)
            jax.block_until_ready((cands, counts))
            dt = time.perf_counter() - t0
            ips = batch * n_iter / dt
            if ips > best:
                best, best_batch = ips, batch
        except Exception as e:  # OOM at large batch etc.
            print(f"# batch {batch} failed: {e}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "416^2 images/sec/chip (detect+NMS fused, bf16)",
                "value": round(best, 1),
                "unit": "images/sec/chip",
                "vs_baseline": round(best / 625.0, 3),
                "batch": best_batch,
            }
        )
    )


if __name__ == "__main__":
    main()
