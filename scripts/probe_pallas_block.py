"""Probe: fused Pallas int8 residual block vs the stock XLA int8 path.

Per-stage exactness + timing on the attached chip. Methodology per CLAUDE.md:
iterations are chained inside one jitted lax.scan with a data dependency
between steps (identical executions get deduped by this runtime).

Usage: python scripts/probe_pallas_block.py [batch ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from face_vijnana_yolov3_tpu.models import quant
from face_vijnana_yolov3_tpu.utils.runtime import enable_compile_cache

N_ITER = 20

# (label, H, C, CH): the three Pallas-eligible trunk block shapes.
STAGES = (
    ("stage3 52^2x256", 52, 256, 128),
    ("stage4 26^2x512", 26, 512, 256),
    ("stage5 13^2x1024", 13, 1024, 512),
)


N_BLOCKS = 4  # chained blocks per stage probe: amortizes the shared input
# quantize pass so the per-block delta dominates the measurement


def make_block(rng, H, C, CH):
    ops, folded = [], {}
    for b in range(N_BLOCKS):
        i1, i2 = 2 * b, 2 * b + 1
        ops += [("save", "skip"),
                ("conv", i1, CH, 1, 1, True, True),
                ("conv", i2, C, 3, 1, True, True),
                ("add", "skip")]
        folded[f"conv_{i1}"] = {
            "kernel": jnp.asarray(rng.normal(0, 0.08, (1, 1, C, CH)),
                                  jnp.float32),
            "bias": jnp.asarray(rng.normal(0, 0.1, (CH,)), jnp.float32)}
        folded[f"conv_{i2}"] = {
            "kernel": jnp.asarray(rng.normal(0, 0.04, (3, 3, CH, C)),
                                  jnp.float32),
            "bias": jnp.asarray(rng.normal(0, 0.1, (C,)), jnp.float32)}
    ops.append(("output", "trunk"))
    x_cal = rng.normal(0, 1, (2, H, H, C)).astype(np.float32)
    qp = quant.quantize_folded(folded, x_cal, ops)
    return ops, jax.device_put(qp)


def chained(step, batch, H, C):
    from functools import partial

    from face_vijnana_yolov3_tpu.utils.runtime import tpu_compiler_options

    # serving-jit compile options: the roll-mode kernel's int32 tap product
    # needs ~16.8M of scoped VMEM at stage3 b128 — over the 16M default,
    # within the raised serving budget (FVY_XLA_VMEM_KIB)
    @partial(jax.jit, compiler_options=tpu_compiler_options("serving"))
    def run(qp, x):
        def body(carry, _):
            xi = x + (0.0 * carry).astype(x.dtype)
            out = step(qp, xi)
            return out.astype(jnp.float32).mean(), out[0, 0, 0, 0]

        _, outs = jax.lax.scan(body, jnp.float32(0), None, length=N_ITER)
        return outs

    return run


def main():
    enable_compile_cache()
    batches = [int(b) for b in sys.argv[1:]] or [128, 512]
    rng = np.random.default_rng(0)
    for label, H, C, CH in STAGES:
        ops, qp = make_block(rng, H, C, CH)

        def step_xla(qp, x):
            return quant.apply_graph_quant(qp, x, ops)["trunk"]

        def step_pallas(qp, x):
            return quant.apply_graph_quant(qp, x, ops, pallas_blocks=True)["trunk"]

        def step_roll(qp, x):
            return quant.apply_graph_quant(
                qp, x, ops, pallas_blocks=True,
                pallas_shift_mode="roll")["trunk"]

        # exactness at a small batch
        x_small = jnp.asarray(rng.normal(0, 1, (4, H, H, C)), jnp.float32)
        a = np.asarray(jax.jit(step_xla)(qp, x_small))
        b = np.asarray(jax.jit(step_pallas)(qp, x_small))
        c = np.asarray(jax.jit(step_roll)(qp, x_small))
        exact = np.array_equal(a, b) and np.array_equal(a, c)
        print(f"{label}: exact={exact} (concat max|d|={np.abs(a - b).max():.3g}"
              f" roll max|d|={np.abs(a - c).max():.3g})")
        if not exact:
            continue
        for batch in batches:
            x = jnp.asarray(rng.normal(0, 1, (batch, H, H, C)), jnp.float32)
            row = [f"{label} b{batch}:"]
            for name, step in (("xla", step_xla), ("pallas", step_pallas),
                               ("roll", step_roll)):
                run = chained(step, batch, H, C)
                jax.block_until_ready(run(qp, x))
                t0 = time.perf_counter()
                jax.block_until_ready(run(qp, x))
                dt = (time.perf_counter() - t0) / N_ITER
                row.append(f"{name} {dt * 1e3:.3f} ms")
            print("  ".join(row))


if __name__ == "__main__":
    main()
