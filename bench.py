"""Benchmark: fused 416² face detect+NMS throughput on one TPU chip.

Measures the flagship serving path — folded Darknet-53 trunk + 6ch head +
fused on-device decode/NMS/top-k postprocess — in images/sec on the attached
chip, for both the bf16 path and the calibrated int8 PTQ path
(models/quant.py; int8 MXU is 2x bf16 peak on v5e and halves HBM traffic).
The reference runs this pipeline one image at a time with host-side numpy
decode/NMS (reference src/space/face_detection.py:885-949); the rebuild target
from BASELINE.json is ≥5000 img/s on a v5e-8, i.e. 625 img/s/chip.

Methodology: iterations are chained inside ONE jitted lax.scan with a data
dependency between steps (input perturbed by the previous step's counts).
A naive repeat-same-args timing loop is invalid on this runtime — identical
executions are deduped (an 8192³ matmul "measures" 6 PFLOP/s) — and per-step
eager dispatches over the tunneled TPU would add host latency that a local
host would not see. int8 accuracy: AP parity vs bf16 verified on a trained
model by scripts/probe_int8_acc.py; closeness unit-tested in tests/test_quant.py.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

N_ITER = 10


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
    folded = jax.device_put(model.fold(params, state))
    cfg = FacePostprocessConfig()
    x_calib = jax.random.uniform(
        jax.random.PRNGKey(0), (8, 416, 416, 3), jnp.float32
    )
    qparams = jax.device_put(model.quantize(folded, x_calib))

    def step_bf16(w, images):
        head = model.apply_folded(w, images, compute_dtype=jnp.bfloat16)
        return jax.vmap(lambda h: face_postprocess(h, cfg))(head)

    def step_int8(w, images):
        head = model.apply_quant(w, images)
        return jax.vmap(lambda h: face_postprocess(h, cfg))(head)

    def chained(step, batch):
        @jax.jit
        def run(w, images):
            def body(carry, _):
                xi = images + (0.0 * carry[0]).astype(images.dtype)
                cands, counts = step(w, xi)
                return counts.astype(jnp.float32), cands[:, 0, 0]

            _, outs = jax.lax.scan(
                body, jnp.zeros((batch,), jnp.float32), None, length=N_ITER
            )
            return outs

        return run

    def measure(step, w, batch):
        x = jax.random.uniform(
            jax.random.PRNGKey(0), (batch, 416, 416, 3), jnp.bfloat16
        )
        run = chained(step, batch)
        jax.block_until_ready(run(w, x))  # compile
        t0 = time.perf_counter()
        out = run(w, x)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / N_ITER
        return batch / dt

    best, best_path, best_batch = 0.0, "", 0
    for path, step, w, batches in (
        ("bf16", step_bf16, folded, (128,)),
        ("int8", step_int8, qparams, (512, 1024)),
    ):
        for batch in batches:
            try:
                ips = measure(step, w, batch)
            except Exception as e:  # OOM at large batch etc.
                print(f"# {path} b{batch} failed: {e}", file=sys.stderr)
                continue
            print(f"# {path} b{batch}: {ips:.0f} img/s", file=sys.stderr)
            if ips > best:
                best, best_path, best_batch = ips, path, batch

    print(
        json.dumps(
            {
                "metric": f"416^2 images/sec/chip (detect+NMS fused, {best_path} PTQ)"
                if best_path == "int8"
                else "416^2 images/sec/chip (detect+NMS fused, bf16)",
                "value": round(best, 1),
                "unit": "images/sec/chip",
                "vs_baseline": round(best / 625.0, 3),
                "batch": best_batch,
            }
        )
    )


if __name__ == "__main__":
    main()
