"""Probe: host-RSS leak per h2d transfer in the tunneled axon TPU client.

Each jax.device_put of a host array leaks ~that array's bytes of host RSS
(measured ~33 MB per 33 MB f32 batch; same with jnp.asarray and with the same
ndarray object reused). A multi-thousand-step streaming training run therefore
leaks steps x batch_bytes — a 152-epoch x 40-step bf16 run reached 130 GB RSS
and was OOM-killed. The device-resident dataset path
(train.trainer device_data, one upload total) is the workaround; on standard
(non-tunneled) TPU runtimes no such leak is expected.

Usage: python scripts/probe_h2d_leak.py
"""

import gc
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import psutil

    p = psutil.Process()

    def rss():
        return p.memory_info().rss / 1e9

    x_np = np.random.rand(16, 416, 416, 3).astype(np.float32)  # 33 MB
    f = jax.jit(lambda x: (x * 2).sum())
    print("backend:", jax.default_backend(), f"rss0={rss():.2f} GB")
    r = None
    for i in range(60):
        xd = jax.device_put(x_np)
        r = f(xd)
        del xd
        if i % 20 == 19:
            jax.block_until_ready(r)
            gc.collect()
            print(f"iter {i + 1}: rss={rss():.2f} GB "
                  f"(leak/iter ~{(rss() - 0.25) / (i + 1) * 1e3:.0f} MB)")


if __name__ == "__main__":
    main()
