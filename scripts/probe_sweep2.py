"""Probe: int8 detect batch sweep beyond 512, and train-step batch sweep.

Usage: python scripts/probe_sweep2.py [detect|train]

Methodology per CLAUDE.md: lax.scan-chained distinct executions (the runtime
dedupes identical ones); train steps use donated jits.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from face_vijnana_yolov3_tpu.utils.runtime import enable_compile_cache

enable_compile_cache()

N_ITER = 10


def detect_sweep():
    from face_vijnana_yolov3_tpu.models.detector import FaceDetectorModel
    from face_vijnana_yolov3_tpu.ops.postprocess import (
        FacePostprocessConfig,
        face_postprocess,
    )

    model = FaceDetectorModel()
    params, state = model.init(jax.random.PRNGKey(0))
    folded = jax.device_put(model.fold(params, state))
    x_calib = jax.random.uniform(jax.random.PRNGKey(0), (8, 416, 416, 3), jnp.float32)
    qparams = jax.device_put(model.quantize(folded, x_calib))
    cfg = FacePostprocessConfig()

    def step_int8(w, images):
        head = model.apply_quant(w, images)
        return jax.vmap(lambda h: face_postprocess(h, cfg))(head)

    for batch in (1280, 1536):
        x = jax.random.uniform(jax.random.PRNGKey(0), (batch, 416, 416, 3), jnp.bfloat16)

        @jax.jit
        def run(w, images):
            def body(carry, _):
                xi = images + (0.0 * carry[0]).astype(images.dtype)
                cands, counts = step_int8(w, xi)
                return counts.astype(jnp.float32), cands[:, 0, 0]

            _, outs = jax.lax.scan(body, jnp.zeros((batch,), jnp.float32), None, length=N_ITER)
            return outs

        try:
            jax.block_until_ready(run(qparams, x))
            t0 = time.perf_counter()
            jax.block_until_ready(run(qparams, x))
            dt = (time.perf_counter() - t0) / N_ITER
            print(f"int8 b{batch}: {batch / dt:.0f} img/s", flush=True)
        except Exception as e:
            print(f"int8 b{batch}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)


def train_sweep():
    import numpy as np

    from face_vijnana_yolov3_tpu.models.detector import FaceDetectorModel
    from face_vijnana_yolov3_tpu.train.optimizer import keras_adam

    model = FaceDetectorModel()
    params, state = model.init(jax.random.PRNGKey(0))
    tx = keras_adam(1e-4, 0.99, 0.99, 0.0)
    opt_state = tx.init(params)
    params, state, opt_state = jax.device_put((params, state, opt_state))

    def loss_and_step(p, s, o, images, gts):
        def loss_fn(prm):
            out, new_s = model.apply(
                prm, s, images, train=True, compute_dtype=jnp.bfloat16
            )
            return jnp.mean((out.astype(jnp.float32) - gts) ** 2), new_s

        (loss, new_s), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
        updates, new_o = tx.update(grads, o, p)
        import optax

        new_p = optax.apply_updates(p, updates)
        return new_p, new_s, new_o, loss

    batches = (
        tuple(int(b) for b in sys.argv[2:]) if len(sys.argv) > 2 else (128, 192, 256)
    )
    for batch in batches:
        images = np.random.rand(batch, 416, 416, 3).astype(np.float32)
        gts = np.random.rand(batch, 13, 13, 6).astype(np.float32)
        images_d, gts_d = jax.device_put((images, gts))

        @jax.jit
        def chained(p, s, o, images, gts):
            def body(carry, _):
                p, s, o = carry
                xi = images + (0.0 * jax.tree_util.tree_leaves(p)[0].reshape(-1)[0])
                p, s, o, loss = loss_and_step(p, s, o, xi, gts)
                return (p, s, o), loss

            (p, s, o), losses = jax.lax.scan(body, (p, s, o), None, length=N_ITER)
            return p, s, o, losses

        donated = jax.jit(chained, donate_argnums=(0, 1, 2))
        try:
            out = donated(params, state, opt_state, images_d, gts_d)
            jax.block_until_ready(out)
            p2, s2, o2 = out[0], out[1], out[2]
            t0 = time.perf_counter()
            out = donated(p2, s2, o2, images_d, gts_d)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / N_ITER
            params, state, opt_state = out[0], out[1], out[2]
            print(f"train bf16 b{batch}: {batch / dt:.0f} img/s ({dt * 1e3:.0f} ms/step)", flush=True)
        except Exception as e:
            print(f"train b{batch}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
            params, state = model.init(jax.random.PRNGKey(0))
            opt_state = tx.init(params)
            params, state, opt_state = jax.device_put((params, state, opt_state))


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "detect"
    if mode == "detect":
        detect_sweep()
    else:
        train_sweep()
