"""End-to-end streaming bench: JPEG files on disk -> solution_fd.csv.

Times the REAL serving loop the reference runs one image at a time
(reference src/space/face_detection.py:783-883): glob jpgs, decode, letterbox,
detect, write CSV rows — here with the native libjpeg thread-pool loader
(native/fvy_loader.cpp), device-side strict letterbox, and the fused
detect+NMS program, overlapped via the prefetch pipeline. This is the honest
system number including the single host CPU core this environment has.

Usage: python scripts/bench_streaming.py [n_images] [precision]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("FVY_DEVICE_LETTERBOX", "1")
# uniform 720p stream: tight staging buckets cut the zero-pad upload waste
# (api/face_detection._stage_bucket)
os.environ.setdefault("FVY_STAGE_BUCKET", "16")

from face_vijnana_yolov3_tpu.utils.runtime import enable_compile_cache

enable_compile_cache()

import numpy as np


def make_jpegs(d: str, n: int, h: int = 720, w: int = 1280) -> None:
    from PIL import Image

    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(0)
    base = (rng.uniform(0, 255, (h, w, 3))).astype(np.uint8)
    for i in range(n):
        # cheap variation; content does not matter for throughput
        im = np.roll(base, i * 7, axis=1)
        Image.fromarray(im).save(os.path.join(d, f"img_{i:04d}.jpg"), quality=90)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    precision = sys.argv[2] if len(sys.argv) > 2 else "int8"
    work = "/tmp/fvy_stream_bench"
    img_dir = os.path.join(work, "imgs")
    if not os.path.isdir(img_dir) or len(os.listdir(img_dir)) != n:
        import shutil

        shutil.rmtree(work, ignore_errors=True)
        make_jpegs(img_dir, n)

    from face_vijnana_yolov3_tpu.api.config import FdConf
    from face_vijnana_yolov3_tpu.api.face_detection import FaceDetectorPipeline
    from face_vijnana_yolov3_tpu.data import native_loader

    conf = FdConf(weights_path=os.path.join(work, "missing.weights"))
    conf.test_path = img_dir
    conf.output_file_path = os.path.join(work, "solution_fd.csv")
    conf.hps.batch_size = 64
    fd = FaceDetectorPipeline(conf, precision=precision)

    print(f"native loader available: {native_loader.native_available()}")
    fd.test()  # warm-up: compiles + calibrates
    t0 = time.perf_counter()
    fd.test()
    dt = time.perf_counter() - t0
    print(
        f"streaming e2e ({precision}, 720p jpgs, device letterbox): "
        f"{n / dt:.0f} img/s  ({dt * 1e3 / n:.2f} ms/img, {n} images)"
    )


if __name__ == "__main__":
    main()
