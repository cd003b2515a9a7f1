"""Validate serialized serving artifacts (core/export.py) on the real chip.

Exports the fused int8 detect at full 416² scale (random-init trunk — this
probes the program path, not accuracy), reloads it, runs it on the attached
device, and checks bit-exactness vs the live jitted pipeline plus steady-state
throughput parity. The deploy claim being tested: the artifact's "tpu"
lowering compiles and runs on the axon-tunneled chip.

Usage: python scripts/probe_export.py [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_ITER = 10


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128

    from face_vijnana_yolov3_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from face_vijnana_yolov3_tpu.api.config import Conf
    from face_vijnana_yolov3_tpu.api.face_detection import FaceDetectorPipeline
    from face_vijnana_yolov3_tpu.core.export import (
        export_detector,
        load_artifact,
    )

    conf = Conf()
    conf.fd_conf.weights_path = "missing.weights"
    fd = FaceDetectorPipeline(conf.fd_conf, precision="int8")
    rng = np.random.default_rng(0)
    fd.calibrate_int8(rng.random((8, 416, 416, 3)).astype(np.float32))

    path = "/tmp/fvy_detect_int8.fvyx"
    t0 = time.perf_counter()
    header = export_detector(fd, path)  # symbolic batch, (tpu, cpu)
    t_export = time.perf_counter() - t0
    size_mb = os.path.getsize(path) / 1e6
    print(f"export: {t_export:.1f}s, {size_mb:.1f} MB, header={header}")

    art = load_artifact(path)
    x = rng.random((batch, 416, 416, 3)).astype(np.float32)

    cands_live, counts_live = fd.detect_batch(x)
    xd = jnp.asarray(x)
    t0 = time.perf_counter()
    cands_art, counts_art = jax.block_until_ready(art(xd))
    print(f"artifact first call (compile): {time.perf_counter() - t0:.1f}s")

    exact = (np.array_equal(np.asarray(cands_art), cands_live)
             and np.array_equal(np.asarray(counts_art), counts_live))
    print(f"bit-exact vs live pipeline: {exact}")
    if not exact:
        d = np.abs(np.asarray(cands_art) - cands_live)
        print(f"  max |Δcands| = {d.max()}, mismatched counts = "
              f"{int((np.asarray(counts_art) != counts_live).sum())}")

    # Steady-state: distinct executions (identical reps get deduped by the
    # runtime — PROFILE.md methodology); eager per-call dispatch includes the
    # tunnel RPC, same for both paths, so the comparison is fair.
    variants = [jnp.asarray(rng.random((batch, 416, 416, 3)), jnp.float32)
                for _ in range(N_ITER)]
    for name, call in (("live jit", fd._jit_detect), ("artifact", art)):
        jax.block_until_ready(call(variants[0]))
        t0 = time.perf_counter()
        for v in variants:
            out = call(v)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / N_ITER
        print(f"{name:>9}: {dt * 1e3:7.2f} ms/call ({batch / dt:7.1f} img/s) "
              f"eager-dispatch b{batch}")


if __name__ == "__main__":
    main()
