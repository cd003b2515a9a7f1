"""FI serving probe: host-crop identify vs the device-fused ROI path.

Measures `_identify_image` (host numpy crop + single-core cv2 cubic resize +
f32 crop upload + batched embed) against `_identify_image_device`
(ops/roi.py: crop+letterbox as MXU matmuls fused with embed + registry match)
on the attached chip, for a UCCS-like workload: 720p images with many detected
faces each.

The reference runs the identify chain one crop per device round trip
(reference src/space/face_identification.py:872-925); the host path here is
already batched, so whatever this probe shows is pure crop/resize/transfer
overhead moved onto the device.

Usage: python scripts/probe_fi_roi.py [n_images] [boxes_per_image] [precision]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from face_vijnana_yolov3_tpu.utils.runtime import enable_compile_cache

enable_compile_cache()

import numpy as np
import jax.numpy as jnp


def main():
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_boxes = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    precision = sys.argv[3] if len(sys.argv) > 3 else "bfloat16"

    from face_vijnana_yolov3_tpu.api.config import Conf
    from face_vijnana_yolov3_tpu.api.face_identification import (
        FaceIdentifierPipeline,
    )

    conf = Conf()
    conf.fi_conf.weights_path = "missing.weights"
    conf.fd_conf.weights_path = "missing.weights"
    fi = FaceIdentifierPipeline(conf, precision=precision)

    rng = np.random.default_rng(0)
    h, w = 720, 1280
    image = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
    boxes = np.zeros((n_boxes, 5))
    for k in range(n_boxes):
        x = 1 + (k * 37) % (w - 200)
        y = 1 + (k * 53) % (h - 200)
        s = 40 + (k * 13) % 150  # mixed crop sizes, like real detections
        boxes[k] = [x, y, x + s, y + s, 0.9]
    reg = rng.normal(size=(200, 64)).astype(np.float32)
    reg /= np.linalg.norm(reg, axis=1, keepdims=True)
    subject_ids = list(range(200))
    reg_dev = jnp.asarray(reg)

    chunk = 16  # detect-chunk size for the chunk-fused path
    all_imgs = [np.roll(image, i * 3, axis=1) for i in range(n_images)]

    # warm all paths (compiles + int8 calibration if any)
    fi._identify_image(image, boxes, subject_ids, reg)
    fi._identify_image_device(image, boxes, subject_ids, reg_dev)
    fi._identify_chunk_device(
        all_imgs[:chunk], [boxes] * chunk, subject_ids, reg_dev
    )
    tail = n_images % chunk
    if tail:
        # the short last chunk stages a different batch dim → its own
        # compiled program; warm it too or a cold compile lands in t_chunk
        fi._identify_chunk_device(
            all_imgs[:tail], [boxes] * tail, subject_ids, reg_dev
        )

    t0 = time.perf_counter()
    for img in all_imgs:
        fi._identify_image(img, boxes, subject_ids, reg)
    t_host = time.perf_counter() - t0

    t0 = time.perf_counter()
    for img in all_imgs:
        fi._identify_image_device(img, boxes, subject_ids, reg_dev)
    t_dev = time.perf_counter() - t0

    t0 = time.perf_counter()
    for s in range(0, n_images, chunk):
        imgs = all_imgs[s : s + chunk]
        fi._identify_chunk_device(
            imgs, [boxes] * len(imgs), subject_ids, reg_dev
        )
    t_chunk = time.perf_counter() - t0

    crops = n_images * n_boxes
    print(f"precision={precision} images={n_images} boxes/img={n_boxes}")
    print(f"host-crop identify    : {t_host:.2f}s  "
          f"{crops / t_host:.0f} crops/s  {n_images / t_host:.2f} img/s")
    print(f"device ROI (per-image): {t_dev:.2f}s  "
          f"{crops / t_dev:.0f} crops/s  {n_images / t_dev:.2f} img/s")
    print(f"device ROI (chunk {chunk:2d}) : {t_chunk:.2f}s  "
          f"{crops / t_chunk:.0f} crops/s  {n_images / t_chunk:.2f} img/s")
    print(f"speedup: per-image {t_host / t_dev:.2f}x  "
          f"chunked {t_host / t_chunk:.2f}x")


if __name__ == "__main__":
    main()
