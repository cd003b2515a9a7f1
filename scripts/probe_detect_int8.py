"""Probe: full fused detect program, bf16 vs int8 trunk, batch 128.

Iterations are chained *inside* one jitted lax.scan (input perturbed by the
previous step's counts) — this defeats the runtime's identical-execution
dedup without per-iteration eager dispatches over the axon tunnel.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
from face_vijnana_yolov3_tpu.utils.runtime import enable_compile_cache

enable_compile_cache()
import jax
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

B = 128
N = 10
x = jax.random.uniform(jax.random.PRNGKey(0), (B, 416, 416, 3), jnp.bfloat16)
x_calib = x[:8].astype(jnp.float32)
q = jax.device_put(model.quantize(folded, x_calib))


def chain(step):
    @jax.jit
    def run(w, images):
        def body(carry, _):
            xi = images + (0.0 * carry[0]).astype(images.dtype)
            cands, counts = step(w, xi)
            return counts.astype(jnp.float32), cands[:, 0, 0]

        _, outs = jax.lax.scan(
            body, jnp.zeros((B,), jnp.float32), None, length=N)
        return outs

    return run


def step_bf16(folded, images):
    head = model.apply_folded(folded, images, compute_dtype=jnp.bfloat16)
    return jax.vmap(lambda h: face_postprocess(h, cfg))(head)


def step_int8(q, images):
    head = model.apply_quant(q, images)
    return jax.vmap(lambda h: face_postprocess(h, cfg))(head)


def bench(fn, w, x):
    out = fn(w, x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(w, x)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / N
    return B / dt


run_b = chain(step_bf16)
run_q = chain(step_int8)
ips_b = bench(run_b, folded, x)
ips_q = bench(run_q, q, x)
print(f"bf16:  {ips_b:.0f} img/s", flush=True)
print(f"int8:  {ips_q:.0f} img/s  ({ips_q/ips_b:.2f}x)", flush=True)
