"""Probe: int8 vs bf16 conv throughput on the attached TPU (dependent chains).

The naive repeat-same-call timing loop is invalid on this runtime (identical
executions appear to be deduped — a 8192^3 matmul 'measures' 6 PFLOP/s), so
every measurement here chains iterations through lax.scan with a data
dependency. Shapes are the profile's top ops (PROFILE.md).
"""
import sys
import time

sys.path.insert(0, "/root/repo")
from face_vijnana_yolov3_tpu.utils.runtime import enable_compile_cache

enable_compile_cache()
import jax
import jax.numpy as jnp

B = 128
N = 20  # scan length


def time_chain(fn, x, n_ops, flops_per_op):
    f = jax.jit(fn)
    jax.block_until_ready(f(x))
    t0 = time.perf_counter()
    out = f(x)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_ops
    return dt * 1e3, flops_per_op / dt / 1e12


def conv(x, w, stride=1, preferred=None):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred)


k = jax.random.PRNGKey(0)

# ---- square residual-style pair: H x H, c <-> 2c (stage 3/4/5 shapes)
for H, c in ((52, 128), (26, 256), (13, 512)):
    wb1 = jax.random.uniform(k, (3, 3, c, 2 * c), jnp.bfloat16) * 0.02
    wb2 = jax.random.uniform(k, (3, 3, 2 * c, c), jnp.bfloat16) * 0.02
    xb = jax.random.uniform(k, (B, H, H, c), jnp.bfloat16)
    w81 = (wb1 * 500).astype(jnp.int8)
    w82 = (wb2 * 500).astype(jnp.int8)
    x8 = (xb * 100).astype(jnp.int8)
    flops = B * H * H * c * 2 * c * 9 * 2  # per conv

    def bf_body(h, _):
        h2 = conv(h, wb1)
        return conv(h2, wb2), ()

    def i8_body(h, _):
        y = conv(h, w81, preferred=jnp.int32)
        y = jnp.clip(jnp.round(y.astype(jnp.float32) * 2e-4), -127, 127
                     ).astype(jnp.int8)
        y = conv(y, w82, preferred=jnp.int32)
        return jnp.clip(jnp.round(y.astype(jnp.float32) * 2e-4), -127, 127
                        ).astype(jnp.int8), ()

    ms_b, tf_b = time_chain(
        lambda x: jax.lax.scan(bf_body, x, None, length=N)[0], xb, 2 * N, flops)
    ms_8, tf_8 = time_chain(
        lambda x: jax.lax.scan(i8_body, x, None, length=N)[0], x8, 2 * N, flops)
    print(f"{H}x{H} {c}<->{2*c}: bf16 {ms_b:.3f} ms ({tf_b:.0f} TF/s) | "
          f"int8+requant {ms_8:.3f} ms ({tf_8:.0f} TOP/s) | "
          f"speedup {ms_b/ms_8:.2f}x", flush=True)

# ---- early HBM-bound shape: 208^2, 64ch 3x3 s1 pairs (conv_1/2-like traffic)
H, c = 208, 64
wb1 = jax.random.uniform(k, (3, 3, c, c), jnp.bfloat16) * 0.05
xb = jax.random.uniform(k, (B, H, H, c), jnp.bfloat16)
w81 = (wb1 * 500).astype(jnp.int8)
x8 = (xb * 100).astype(jnp.int8)
flops = B * H * H * c * c * 9 * 2


def bf_body(h, _):
    return conv(h, wb1), ()


def i8_body(h, _):
    y = conv(h, w81, preferred=jnp.int32)
    return jnp.clip(jnp.round(y.astype(jnp.float32) * 2e-4), -127, 127
                    ).astype(jnp.int8), ()


ms_b, tf_b = time_chain(
    lambda x: jax.lax.scan(bf_body, x, None, length=N)[0], xb, N, flops)
ms_8, tf_8 = time_chain(
    lambda x: jax.lax.scan(i8_body, x, None, length=N)[0], x8, N, flops)
print(f"{H}x{H} {c}->{c}: bf16 {ms_b:.3f} ms ({tf_b:.0f} TF/s) | "
      f"int8+requant {ms_8:.3f} ms ({tf_8:.0f} TOP/s) | "
      f"speedup {ms_b/ms_8:.2f}x", flush=True)
