"""End-to-end FI streaming bench: JPEG files on disk -> solution_fi.csv.

The FI twin of bench_streaming.py: times the full identification serving
loop the reference runs one crop per device round-trip (reference
src/space/face_identification.py:772-1153) — glob jpgs, decode, letterbox,
detect, crop every face, embed, match against the registry, write CSV —
comparing the host-crop path against the device-fused ROI path
(FVY_DEVICE_ROI=1, ops/roi.py) with the same fused detect underneath.

Uses the bench cache's trained detector + 416² valset (real boxes; run
`python bench.py` once to create it) and a synthetic 200-subject registry —
embedding VALUES are irrelevant to throughput, box geometry is not.

Usage: python scripts/bench_fi_streaming.py [precision]
"""

import glob
import os
import pickle
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("FVY_DEVICE_LETTERBOX", "1")  # same detect both paths

from face_vijnana_yolov3_tpu.utils.runtime import enable_compile_cache

enable_compile_cache()

import numpy as np

CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".bench_cache",
)


def main():
    precision = sys.argv[1] if len(sys.argv) > 1 else "bfloat16"
    valset = os.path.join(CACHE, "valset")
    ckpt = os.path.join(CACHE, "fd_ckpt")
    if not os.path.isdir(valset):
        sys.exit("run `python bench.py` once first (creates .bench_cache)")

    work = "/tmp/fi_stream_bench"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    for f in glob.glob(os.path.join(valset, "*.jpg")):
        shutil.copy(f, work)
    n_files = len(glob.glob(os.path.join(work, "*.jpg")))

    rng = np.random.default_rng(0)
    reg = rng.normal(size=(200, 64)).astype(np.float32)
    reg /= np.linalg.norm(reg, axis=1, keepdims=True)
    os.chdir(work)
    with open("ref_facial_id_db.pickle", "wb") as f:
        pickle.dump({i: reg[i] for i in range(len(reg))}, f)

    from face_vijnana_yolov3_tpu.api.config import Conf
    from face_vijnana_yolov3_tpu.api.face_identification import (
        FaceIdentifierPipeline,
    )

    conf = Conf()
    conf.fd_conf.model_path = ckpt
    conf.fd_conf.model_loading = True
    conf.fd_conf.hps.batch_size = 32
    conf.fi_conf.weights_path = "missing.weights"
    conf.fi_conf.test_path = work
    conf.fi_conf.hps.sim_th = 10.0  # accept all: maximize identify work
    fi = FaceIdentifierPipeline(conf, precision=precision)

    def run(device_roi: bool) -> tuple[float, int]:
        os.environ["FVY_DEVICE_ROI"] = "1" if device_roi else "0"
        conf.fi_conf.output_file_path = os.path.join(
            work, f"solution_{'dev' if device_roi else 'host'}.csv"
        )
        fi.test()  # warm (compiles)
        t0 = time.perf_counter()
        fi.test()
        dt = time.perf_counter() - t0
        rows = sum(1 for _ in open(conf.fi_conf.output_file_path))
        return dt, rows

    t_host, rows_h = run(False)
    t_dev, rows_d = run(True)
    print(f"precision={precision} images={n_files} "
          f"rows host/dev = {rows_h}/{rows_d}")
    print(f"host-crop identify : {t_host:.2f}s  {n_files / t_host:.1f} img/s")
    print(f"device-fused ROI   : {t_dev:.2f}s  {n_files / t_dev:.1f} img/s")
    print(f"speedup: {t_host / t_dev:.2f}x")


if __name__ == "__main__":
    main()
