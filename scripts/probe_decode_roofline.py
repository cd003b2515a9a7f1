"""Decode-only roofline for the streaming pipeline (VERDICT r2 #6).

The round-2 streaming number is 53 img/s (720p JPEGs → solution_fd.csv, DCT
3/8-scaled decode, device letterbox, int8 detect; scripts/bench_streaming.py).
This probe answers whether 53 is the single-core host's DECODE ceiling or
pipeline overhead: it times the native batched decode ALONE (no device, no
letterbox, no CSV) on the same 720p files at the same picked M/8 scale, plus
full-resolution decode for reference. pipeline efficiency = streaming img/s
÷ decode-only img/s; ≥90% means the prefetch overlap is doing its job and
the host core is the ceiling.

Usage: python scripts/probe_decode_roofline.py [n_images]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    work = "/tmp/fvy_stream_bench"
    img_dir = os.path.join(work, "imgs")
    if not os.path.isdir(img_dir) or len(os.listdir(img_dir)) != n:
        import shutil

        from bench_streaming import make_jpegs

        shutil.rmtree(work, ignore_errors=True)
        make_jpegs(img_dir, n)
    files = sorted(
        os.path.join(img_dir, f) for f in os.listdir(img_dir)
    )

    from face_vijnana_yolov3_tpu.data import native_loader

    if not native_loader.native_available():
        raise SystemExit("native loader unavailable — build native/ first")

    h, w = native_loader.jpeg_size(files[0])
    m = native_loader.pick_scale_num(h, w, 416)
    print(f"{n} JPEGs {w}x{h}, target 416 -> scale {m}/8")

    def timed(label, fn):
        fn(files[:8])  # warm the thread pool / page cache
        t0 = time.perf_counter()
        fn(files)
        dt = time.perf_counter() - t0
        print(f"{label:>28}: {n / dt:7.1f} img/s  ({dt:.2f}s)")
        return n / dt

    full = timed(
        "full-res decode only",
        lambda fs: native_loader.decode_batch_staged(fs, h, w),
    )
    scaled = timed(
        f"scaled {m}/8 decode only",
        lambda fs: native_loader.decode_batch_staged_scaled(fs, 416),
    )
    if m > 1:
        # VERDICT r4 #4: one-notch-coarser decode (e.g. 2/8 for 720p->416).
        # The scaled long side falls BELOW the letterbox target, so the
        # device resize would upsample — accuracy-affecting, never picked by
        # pick_scale_num; this row only measures whether the decode ceiling
        # would move if that trade were accepted.
        coarse_target = (max(h, w) * (m - 1)) // 8
        timed(
            f"coarser {m - 1}/8 decode only (accuracy-affecting)",
            lambda fs: native_loader.decode_batch_staged_scaled(
                fs, coarse_target),
        )
    print(f"\npipeline efficiency = <streaming img/s> / {scaled:.1f} "
          "(run scripts/bench_streaming.py for the numerator)")


if __name__ == "__main__":
    main()
