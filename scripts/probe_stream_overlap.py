"""Streaming-pipeline overlap diagnosis (VERDICT r2 #6 follow-up).

probe_decode_roofline puts the decode-only ceiling at ~91 img/s while the
round-2 streaming number is 53 — pipeline efficiency 58%. This probe wraps
the two stages of the real test-mode loop with wall-clock accumulators:

  decode_s  — time inside native decode calls (prefetch thread)
  fused_s   — time inside detect_batch_fused (consumer thread: pad + h2d +
              fused letterbox/detect program + d2h)
  total_s   — end-to-end

overlap achieved = decode_s + fused_s − total_s (perfect pipelining ⇒
total ≈ max(decode_s, fused_s); zero overlap ⇒ total ≈ sum).

Usage: python scripts/probe_stream_overlap.py [n_images] [precision]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("FVY_DEVICE_LETTERBOX", "1")
os.environ.setdefault("FVY_JPEG_SCALED_DECODE", "1")
os.environ.setdefault("FVY_STAGE_BUCKET", "16")

from face_vijnana_yolov3_tpu.utils.runtime import enable_compile_cache

enable_compile_cache()


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    precision = sys.argv[2] if len(sys.argv) > 2 else "int8"
    from bench_streaming import make_jpegs

    work = "/tmp/fvy_stream_bench"
    img_dir = os.path.join(work, "imgs")
    if not os.path.isdir(img_dir) or len(os.listdir(img_dir)) != n:
        import shutil

        shutil.rmtree(work, ignore_errors=True)
        make_jpegs(img_dir, n)

    from face_vijnana_yolov3_tpu.api.config import FdConf
    from face_vijnana_yolov3_tpu.api.face_detection import FaceDetectorPipeline
    from face_vijnana_yolov3_tpu.data import native_loader

    stats = {"decode_s": 0.0, "fused_s": 0.0, "post_s": 0.0, "csv_s": 0.0,
             "decode_calls": 0}

    real_scaled = native_loader.decode_batch_staged_scaled

    def timed_scaled(*a, **k):
        t0 = time.perf_counter()
        out = real_scaled(*a, **k)
        stats["decode_s"] += time.perf_counter() - t0
        stats["decode_calls"] += 1
        return out

    native_loader.decode_batch_staged_scaled = timed_scaled

    # consumer post-processing: chunk unletterbox + CSV row emission
    from face_vijnana_yolov3_tpu.api import face_detection as fd_mod

    real_ub = fd_mod.unletterbox_boxes_chunk

    def timed_ub(*a, **k):
        t0 = time.perf_counter()
        out = real_ub(*a, **k)
        stats["post_s"] += time.perf_counter() - t0
        return out

    fd_mod.unletterbox_boxes_chunk = timed_ub

    conf = FdConf(weights_path=os.path.join(work, "missing.weights"))
    conf.test_path = img_dir
    conf.output_file_path = os.path.join(work, "solution_fd.csv")
    conf.hps.batch_size = 64
    fd = FaceDetectorPipeline(conf, precision=precision)

    real_fused = fd.detect_batch_fused

    def timed_fused(*a, **k):
        t0 = time.perf_counter()
        out = real_fused(*a, **k)
        stats["fused_s"] += time.perf_counter() - t0
        return out

    fd.detect_batch_fused = timed_fused

    real_rows = fd._write_rows

    def timed_rows(*a, **k):
        t0 = time.perf_counter()
        out = real_rows(*a, **k)
        stats["csv_s"] += time.perf_counter() - t0
        return out

    fd._write_rows = timed_rows

    fd.test()  # warm-up: compiles + calibrates
    for k in stats:
        stats[k] = 0
    t0 = time.perf_counter()
    fd.test()
    total = time.perf_counter() - t0
    d, f = stats["decode_s"], stats["fused_s"]
    print(f"\n{n} images, chunk 64, {precision}:")
    print(f"  total     {total:6.2f}s   ({n / total:.1f} img/s)")
    print(f"  decode    {d:6.2f}s   ({stats['decode_calls']} calls; "
          f"{n / d:.1f} img/s ceiling)")
    print(f"  fused     {f:6.2f}s   ({n / f:.1f} img/s ceiling)")
    print(f"  postproc  {stats['post_s']:6.3f}s  (chunk unletterbox)")
    print(f"  csv       {stats['csv_s']:6.3f}s  (row emission)")
    print(f"  overlap   {d + f - total:6.2f}s achieved "
          f"(perfect = {min(d, f):.2f}s; other host work = "
          f"{total - max(d, f):.2f}s beyond the slower stage)")


if __name__ == "__main__":
    main()
