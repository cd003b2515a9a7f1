"""Probe: front conv pair (conv_0+conv_1) in stock-int8 vs s2d-int8 vs s2d-bf16.

The bf16 s2d rewrite was neutral (PROFILE.md: the pair is HBM-bound and s2d
only fixes MXU utilization). int8 halves the HBM traffic, which may shift the
balance — this probe decides whether an int8 s2d front path is worth wiring.

Chained-scan timing methodology as bench.py (dedup-safe, dispatch-free).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from face_vijnana_yolov3_tpu.utils.runtime import enable_compile_cache

enable_compile_cache()

from face_vijnana_yolov3_tpu.models.detector import FaceDetectorModel
from face_vijnana_yolov3_tpu.models import s2d as s2d_lib
from face_vijnana_yolov3_tpu.models.quant import _conv_int8, _quant
from face_vijnana_yolov3_tpu.models.darknet import LEAKY_ALPHA

N_ITER = 20
BATCH = 128

model = FaceDetectorModel()
params, state = model.init(jax.random.PRNGKey(0))
folded = model.fold(params, state)
x_calib = jax.random.uniform(jax.random.PRNGKey(0), (8, 416, 416, 3), jnp.float32)
qp = model.quantize(folded, x_calib)
folded_s2d = s2d_lib.build_s2d_folded(folded)
# This probe predates (and is independent of) the per-channel activation
# scheme: it quantizes its own front kernels with per-TENSOR scalar scales,
# which is what its recorded findings measured. Scalars = channel-max of the
# calibrated per-channel vectors.
s = [float(np.max(v)) for v in qp["act_scales"][:3]]
_fh = jax.device_get(folded)


def quant_kernel(kernel):
    k = np.asarray(kernel, np.float32)
    w_scale = np.maximum(np.abs(k).max(axis=(0, 1, 2)), 1e-8) / 127.0
    kq = np.clip(np.round(k / w_scale), -127, 127).astype(np.int8)
    return jnp.asarray(kq), jnp.asarray(w_scale.astype(np.float32))


k0q_s2d, w0s_s2d = quant_kernel(folded_s2d["s2d_conv0"]["kernel"])
k1q_s2d, w1s_s2d = quant_kernel(folded_s2d["s2d_conv1"]["kernel"])
b0_s2d = jnp.asarray(folded_s2d["s2d_conv0"]["bias"])
b1_s2d = jnp.asarray(folded_s2d["s2d_conv1"]["bias"])
k0q_st, w0s_st = quant_kernel(_fh["conv_0"]["kernel"])
k1q_st, w1s_st = quant_kernel(_fh["conv_1"]["kernel"])
b0_st = jnp.asarray(np.asarray(_fh["conv_0"]["bias"], np.float32))
b1_st = jnp.asarray(np.asarray(_fh["conv_1"]["bias"], np.float32))


def leaky(h):
    return jnp.where(h > 0, h, LEAKY_ALPHA * h)


def front_stock_int8(x):
    h_q = _quant(x.astype(jnp.float32), s[0])
    y = _conv_int8(h_q, k0q_st, 1, 3)
    h = leaky(y.astype(jnp.float32) * (s[0] * w0s_st) + b0_st)
    h_q = _quant(h, s[1])
    y = _conv_int8(h_q, k1q_st, 2, 3)
    h = leaky(y.astype(jnp.float32) * (s[1] * w1s_st) + b1_st)
    return _quant(h, s[2])


def conv_int8_pad(x_q, kernel_q, stride, pad):
    return jax.lax.conv_general_dilated(
        x_q, kernel_q, window_strides=(stride, stride), padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


def front_s2d_int8(x):
    h_q = _quant(s2d_lib._space_to_depth2(x.astype(jnp.float32)), s[0])
    y = conv_int8_pad(h_q, k0q_s2d, 1, ((1, 1), (1, 1)))
    h = leaky(y.astype(jnp.float32) * (s[0] * w0s_s2d) + b0_s2d)
    h_q = _quant(h, s[1])
    y = conv_int8_pad(h_q, k1q_s2d, 1, ((1, 0), (1, 0)))
    h = leaky(y.astype(jnp.float32) * (s[1] * w1s_s2d) + b1_s2d)
    return _quant(h, s[2])


def front_s2d_bf16(x):
    h = s2d_lib._space_to_depth2(x.astype(jnp.bfloat16))
    for p, pad in ((folded_s2d["s2d_conv0"], ((1, 1), (1, 1))),
                   (folded_s2d["s2d_conv1"], ((1, 0), (1, 0)))):
        h = jax.lax.conv_general_dilated(
            h.astype(jnp.bfloat16), p["kernel"].astype(jnp.bfloat16),
            window_strides=(1, 1), padding=pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + p["bias"]
        h = leaky(h).astype(jnp.bfloat16)
    return _quant(h.astype(jnp.float32), s[2])


def timeit(front, name):
    @jax.jit
    def run(x):
        def body(carry, _):
            xi = x + (0.0 * carry).astype(x.dtype)
            out = front(xi)
            return out.astype(jnp.float32).mean(), out[0, 0, 0, 0]

        _, outs = jax.lax.scan(body, jnp.float32(0.0), None, length=N_ITER)
        return outs

    x = jax.random.uniform(jax.random.PRNGKey(1), (BATCH, 416, 416, 3), jnp.bfloat16)
    jax.block_until_ready(run(x))
    t0 = time.perf_counter()
    jax.block_until_ready(run(x))
    dt = (time.perf_counter() - t0) / N_ITER
    print(f"{name}: {dt * 1e3:.2f} ms/iter (b{BATCH})")
    return dt


# Correctness cross-check first (s2d-int8 vs stock-int8 use the same scales,
# but int8 rounding of rearranged kernels differs slightly — compare loosely).
xs = jax.random.uniform(jax.random.PRNGKey(2), (2, 416, 416, 3), jnp.float32)
a = np.asarray(front_stock_int8(xs), np.float32) * s[2]
b = np.asarray(front_s2d_int8(xs), np.float32) * s[2]
rel = np.abs(a - b).mean() / (np.abs(a).mean() + 1e-9)
print(f"stock-int8 vs s2d-int8 mean rel diff: {rel:.4f}")

timeit(front_stock_int8, "front stock int8")
timeit(front_s2d_int8, "front s2d   int8")
timeit(front_s2d_bf16, "front s2d   bf16")
