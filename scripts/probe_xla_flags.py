"""Probe: per-program XLA compiler-option sweep on the two hot programs.

Sweeps TPU compiler knobs (scoped VMEM limit, latency-hiding scheduler) via
`jax.jit(...).lower(...).compile(compiler_options=...)` — these ride the PJRT
compile call, so they work over the tunneled axon device where env XLA_FLAGS
may not reach the server-side compiler. Programs measured exactly like
scripts/probe_sweep2.py (scan-chained distinct executions; donated train
step), so numbers are comparable to PROFILE.md's tables.

Usage: python scripts/probe_xla_flags.py [detect|train] [batch]
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

SWEEPS = [
    ("baseline", {}),
    ("vmem32m", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("vmem64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("vmem96m", {"xla_tpu_scoped_vmem_limit_kib": "98304"}),
    ("lhs_off", {"xla_tpu_enable_latency_hiding_scheduler": "false"}),
    ("lhs_on", {"xla_tpu_enable_latency_hiding_scheduler": "true"}),
    (
        "vmem64m+lhs",
        {
            "xla_tpu_scoped_vmem_limit_kib": "65536",
            "xla_tpu_enable_latency_hiding_scheduler": "true",
        },
    ),
]


def _measure(compiled, args, batch):
    out = compiled(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = compiled(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / N_ITER
    return batch / dt, out


def detect_sweep(batch, precision="int8"):
    from face_vijnana_yolov3_tpu.models.detector import FaceDetectorModel
    from face_vijnana_yolov3_tpu.ops.postprocess import (
        FacePostprocessConfig,
        face_postprocess,
    )

    model = FaceDetectorModel()
    params, state = model.init(jax.random.PRNGKey(0))
    folded = jax.device_put(model.fold(params, state))
    x_calib = jax.random.uniform(
        jax.random.PRNGKey(0), (8, 416, 416, 3), jnp.float32
    )
    qparams = jax.device_put(model.quantize(folded, x_calib))
    cfg = FacePostprocessConfig()
    x = jax.random.uniform(
        jax.random.PRNGKey(0), (batch, 416, 416, 3), jnp.bfloat16
    )

    if precision == "int8":
        weights = qparams

        def fwd(w, xi):
            return model.apply_quant(w, xi)
    else:  # the bf16 serving default: folded + f32 front guard (2 segments)
        weights = folded

        def fwd(w, xi):
            return model.apply_folded(
                w, xi, compute_dtype=jnp.bfloat16, f32_front_blocks=2
            )

    def run(w, images):
        def body(carry, _):
            xi = images + (0.0 * carry[0]).astype(images.dtype)
            head = fwd(w, xi)
            cands, counts = jax.vmap(lambda h: face_postprocess(h, cfg))(head)
            return counts.astype(jnp.float32), cands[:, 0, 0]

        _, outs = jax.lax.scan(
            body, jnp.zeros((batch,), jnp.float32), None, length=N_ITER
        )
        return outs

    lowered = jax.jit(run).lower(weights, x)
    for name, opts in SWEEPS:
        try:
            compiled = lowered.compile(compiler_options=opts or None)
            rate, _ = _measure(compiled, (weights, x), batch)
            print(
                f"detect {precision} b{batch} {name}: {rate:.0f} img/s",
                flush=True,
            )
        except Exception as e:
            print(
                f"detect {precision} b{batch} {name}: FAILED "
                f"{type(e).__name__}: {str(e)[:160]}",
                flush=True,
            )


def train_sweep(batch):
    import numpy as np
    import optax

    from face_vijnana_yolov3_tpu.models.detector import FaceDetectorModel
    from face_vijnana_yolov3_tpu.train.optimizer import keras_adam

    model = FaceDetectorModel()
    params0, state0 = model.init(jax.random.PRNGKey(0))
    tx = keras_adam(1e-4, 0.99, 0.99, 0.0)

    def chained(p, s, o, images, gts):
        def body(carry, _):
            p, s, o = carry
            xi = images + (0.0 * jax.tree_util.tree_leaves(p)[0].reshape(-1)[0])

            def loss_fn(prm):
                out, new_s = model.apply(
                    prm, s, xi, train=True, compute_dtype=jnp.bfloat16
                )
                return jnp.mean((out.astype(jnp.float32) - gts) ** 2), new_s

            (loss, new_s), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(p)
            updates, new_o = tx.update(grads, o, p)
            return (optax.apply_updates(p, updates), new_s, new_o), loss

        (p, s, o), losses = jax.lax.scan(body, (p, s, o), None, length=N_ITER)
        return p, s, o, losses

    images = np.random.rand(batch, 416, 416, 3).astype(np.float32)
    gts = np.random.rand(batch, 13, 13, 6).astype(np.float32)
    images_d, gts_d = jax.device_put((images, gts))

    for name, opts in SWEEPS:
        params, state = jax.device_put(
            jax.tree.map(lambda a: a.copy(), (params0, state0))
        )
        opt_state = jax.device_put(tx.init(params0))
        try:
            lowered = jax.jit(chained, donate_argnums=(0, 1, 2)).lower(
                params, state, opt_state, images_d, gts_d
            )
            compiled = lowered.compile(compiler_options=opts or None)
            out = compiled(params, state, opt_state, images_d, gts_d)
            jax.block_until_ready(out)
            p2, s2, o2 = out[0], out[1], out[2]
            t0 = time.perf_counter()
            out = compiled(p2, s2, o2, images_d, gts_d)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / N_ITER
            print(
                f"train bf16 b{batch} {name}: {batch / dt:.0f} img/s "
                f"({dt * 1e3:.0f} ms/step)",
                flush=True,
            )
        except Exception as e:
            print(
                f"train b{batch} {name}: FAILED "
                f"{type(e).__name__}: {str(e)[:160]}",
                flush=True,
            )


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "detect"
    b = int(sys.argv[2]) if len(sys.argv) > 2 else (128 if mode == "train" else 1024)
    if mode == "detect":
        detect_sweep(b, "int8")
    elif mode == "detect_bf16":
        detect_sweep(b, "bfloat16")
    else:
        train_sweep(b)
