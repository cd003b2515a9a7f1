"""Identifier triplet-training throughput on the attached chip (VERDICT r2 #2).

Measures the REAL train_identifier path (donated scan-chained epochs over
device-resident a/p/n stacks, keras_adam, BN state updates, bf16 mixed
precision) at 416² in triplets/s and img-equivalents/s (= 3x triplets/s:
each triplet pushes three images through the 40M-param trunk — the
FLOP-honest unit against the detector step's img/s). Sweeps batch size and
remat granularity (True = checkpoint every residual block, int N = first N
segments only, False = none). Reference analog: the fit_generator triplet
loop, /root/reference/src/space/face_identification.py:616-643.

Usage: python scripts/probe_fi_train_perf.py [--profile DIR] [--quick]
Each config is ONE train_identifier call (one h2d upload, one compile);
per-epoch wall times come from the trainer's epoch_times hook — epoch 0 pays
the compile, steady state = min of the rest.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


class SyntheticTriplets:
    """Minimal TripletDataset twin: deterministic random crops, n triplets."""

    def __init__(self, n: int, image_size: int = 416, seed: int = 0):
        rng = np.random.default_rng(seed)
        self.n = n
        self.a = rng.integers(0, 256, (n, image_size, image_size, 3), np.uint8)
        self.p = rng.integers(0, 256, (n, image_size, image_size, 3), np.uint8)
        self.ng = rng.integers(0, 256, (n, image_size, image_size, 3), np.uint8)

    def steps(self, batch_size: int) -> int:
        return max(1, self.n // batch_size)

    def batch(self, i: int, batch_size: int):
        s = slice(i * batch_size, (i + 1) * batch_size)
        f = np.float32(1.0 / 255.0)
        return (self.a[s].astype(np.float32) * f,
                self.p[s].astype(np.float32) * f,
                self.ng[s].astype(np.float32) * f)


def main():
    profile_dir = None
    quick = "--quick" in sys.argv
    if "--profile" in sys.argv:
        profile_dir = sys.argv[sys.argv.index("--profile") + 1]

    from face_vijnana_yolov3_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from face_vijnana_yolov3_tpu.models.identifier import FaceIdentifierModel
    from face_vijnana_yolov3_tpu.train.trainer import train_identifier

    model = FaceIdentifierModel()
    params0, state0 = model.init(jax.random.PRNGKey(0))

    configs = [
        (16, True, "all"),
        (16, 8, "first8"),
        (16, False, "off"),
        (32, True, "all"),
        (32, 8, "first8"),
        (32, False, "off"),
        (64, True, "all"),
        (64, 8, "first8"),
        (64, False, "off"),
    ]
    if quick:
        configs = configs[:1]

    n_steps = 4  # one epoch = one donated scan of n_steps on-device batches
    # (small: each config re-uploads b*n_steps*3 images over the ~5 MB/s
    # tunnel — n_steps only has to amortize the scan's per-epoch dispatch)
    n_epochs = 4
    print(f"backend={jax.default_backend()}  devices={jax.devices()}")
    print(f"{'batch':>5} {'remat':>8} {'s/epoch':>9} {'triplets/s':>11} "
          f"{'img-eq/s':>9}")
    results = []
    for batch, remat, label in configs:
        ds = SyntheticTriplets(batch * n_steps)
        hps = {"lr": 1e-4, "beta_1": 0.99, "beta_2": 0.99, "decay": 0.0,
               "batch_size": batch, "epochs": n_epochs}
        epoch_times: list = []
        try:
            ctx = jax.profiler.trace(profile_dir) if profile_dir else None
            if ctx:
                ctx.__enter__()
            train_identifier(
                model, params0, state0, ds, hps,
                compute_dtype=jnp.bfloat16,
                finalize_bn=False,
                device_data=True,
                remat=remat,
                epoch_times=epoch_times,
            )
            if ctx:
                ctx.__exit__(None, None, None)
        except Exception as e:
            print(f"{batch:>5} {label:>8}  FAILED: {type(e).__name__}: {e}")
            continue
        dt = min(epoch_times[1:])  # epoch 0 pays the compile
        tps = batch * n_steps / dt
        results.append((batch, label, dt, tps))
        print(f"{batch:>5} {label:>8} {dt:>9.3f} {tps:>11.1f} "
              f"{3 * tps:>9.1f}   (epochs: "
              + " ".join(f"{t:.2f}s" for t in epoch_times) + ")")

    if results:
        best = max(results, key=lambda r: r[3])
        print(f"\nbest: b{best[0]} remat={best[1]} -> {best[3]:.1f} "
              f"triplets/s = {3 * best[3]:.1f} img-eq/s")


if __name__ == "__main__":
    main()
