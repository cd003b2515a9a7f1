"""Calibrate the timing harness: known-FLOP matmul + dependent-chain conv."""
import sys
import time

sys.path.insert(0, "/root/repo")
from face_vijnana_yolov3_tpu.utils.runtime import enable_compile_cache

enable_compile_cache()
import jax
import jax.numpy as jnp

print(jax.devices(), flush=True)

# 1) 8192^3 matmul bf16: 1.10 TFLOP. v5e peak 197 TFLOP/s -> >=5.6 ms.
k = jax.random.PRNGKey(0)
a = jax.random.uniform(k, (8192, 8192), jnp.bfloat16)
b = jax.random.uniform(k, (8192, 8192), jnp.bfloat16)
mm = jax.jit(lambda a, b: a @ b)
jax.block_until_ready(mm(a, b))
t0 = time.perf_counter()
for _ in range(20):
    out = mm(a, b)
jax.block_until_ready(out)
dt = (time.perf_counter() - t0) / 20
print(f"matmul 8192^3: {dt*1e3:.2f} ms -> {2*8192**3/dt/1e12:.1f} TFLOP/s", flush=True)

# int8 matmul
a8 = (a * 100).astype(jnp.int8)
b8 = (b * 100).astype(jnp.int8)
mm8 = jax.jit(lambda a, b: jax.lax.dot(a, b, preferred_element_type=jnp.int32))
jax.block_until_ready(mm8(a8, b8))
t0 = time.perf_counter()
for _ in range(20):
    out = mm8(a8, b8)
jax.block_until_ready(out)
dt = (time.perf_counter() - t0) / 20
print(f"matmul int8 8192^3: {dt*1e3:.2f} ms -> {2*8192**3/dt/1e12:.1f} TOP/s", flush=True)

# 2) dependent-chain conv timing: scan so iteration i+1 consumes iteration i.
B = 128
x = jax.random.uniform(k, (B, 26, 26, 256), jnp.bfloat16)
w = jax.random.uniform(k, (3, 3, 256, 512), jnp.bfloat16) * 0.01
w2 = jax.random.uniform(k, (3, 3, 512, 256), jnp.bfloat16) * 0.01


def body(h, _):
    y = jax.lax.conv_general_dilated(
        h, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    h = jax.lax.conv_general_dilated(
        y, w2, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return h, ()


chain = jax.jit(lambda x: jax.lax.scan(body, x, None, length=40)[0])
jax.block_until_ready(chain(x))
t0 = time.perf_counter()
out = chain(x)
jax.block_until_ready(out)
dt = (time.perf_counter() - t0) / 80  # 80 convs
flops = B * 26 * 26 * 512 * 256 * 9 * 2
print(f"26x26 256<->512 conv (chained): {dt*1e3:.3f} ms/conv -> "
      f"{flops/dt/1e12:.1f} TFLOP/s", flush=True)
