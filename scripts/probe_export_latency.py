"""Export-artifact serving ergonomics: cold-load + first-call latency
(VERDICT r2 #8).

Measures, for the full-416² int8 detect artifact (the headline serving
default), on BOTH the attached TPU and the CPU lowering of the same file:
  t_load   — open+deserialize the .fvyx (jax.export deserialization)
  t_first  — first call at b8 (compile of the symbolic-batch program for
             this platform; the persistent compile cache applies on TPU)
  t_warm   — second call (steady dispatch)
This is the TPU-native answer to the reference's bake-weights-into-Docker
deploy (reference docker/code/Dockerfile:11-15): the serving host runs
nothing but jax + this file. Numbers go into STATUS.md's export section.

Usage: python scripts/probe_export_latency.py [artifact.fvyx]
Builds the artifact from the bench checkpoint when no path is given
(requires /root/repo/.bench_cache — run bench.py first).
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def build_default_artifact(path: str) -> None:
    import glob

    import jax.numpy as jnp

    from face_vijnana_yolov3_tpu.api.config import FdConf
    from face_vijnana_yolov3_tpu.api.face_detection import FaceDetectorPipeline
    from face_vijnana_yolov3_tpu.core.export import export_detector
    from face_vijnana_yolov3_tpu.ops.letterbox import letterbox_host
    from face_vijnana_yolov3_tpu.utils.io import imread

    cache = os.path.join(REPO, ".bench_cache")
    conf = FdConf(
        weights_path="missing.weights",
        model_path=os.path.join(cache, "fd_ckpt"),
        model_loading=True,
    )
    fd = FaceDetectorPipeline(conf, precision="int8")
    val = sorted(glob.glob(os.path.join(cache, "valset", "*.jpg")))[:8]
    calib = np.stack([
        letterbox_host(imread(f) / 255.0, 416, "cubic")[0] for f in val
    ]).astype(np.float32)
    fd.calibrate_int8(jnp.asarray(calib))
    export_detector(fd, path, platforms=("tpu", "cpu"))


def measure(path: str, platform_label: str):
    # measured in a SUBPROCESS so every run is a true cold process
    import subprocess

    script = f"""
import time, numpy as np
t0 = time.perf_counter()
import jax
{'jax.config.update("jax_platforms", "cpu")' if platform_label == 'cpu' else ''}
import sys; sys.path.insert(0, {REPO!r})
from face_vijnana_yolov3_tpu.utils.runtime import enable_compile_cache
enable_compile_cache()
from face_vijnana_yolov3_tpu.core.export import load_artifact
art = load_artifact({path!r})
t_load = time.perf_counter() - t0
x = np.random.default_rng(0).random((8, 416, 416, 3)).astype(np.float32)
t1 = time.perf_counter(); out = art(x); np.asarray(out[1])
t_first = time.perf_counter() - t1
t2 = time.perf_counter(); out = art(x + np.float32(1/255)); np.asarray(out[1])
t_warm = time.perf_counter() - t2
print(f"RESULT {{t_load:.2f}} {{t_first:.2f}} {{t_warm:.3f}}")
"""
    out = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True,
        timeout=900,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("RESULT")]
    if not line:
        print(f"{platform_label}: FAILED\n{out.stderr[-800:]}")
        return
    t_load, t_first, t_warm = map(float, line[0].split()[1:])
    print(f"{platform_label:>4}: load {t_load:6.2f}s   first-call(b8) "
          f"{t_first:6.2f}s   warm-call {t_warm:6.3f}s")


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fvy_detect_int8.fvyx"
    if len(sys.argv) <= 1 and not os.path.exists(path):
        print("building artifact from the bench checkpoint ...")
        build_default_artifact(path)
    print(f"artifact: {path} ({os.path.getsize(path) / 1e6:.1f} MB)")
    measure(path, "tpu")
    measure(path, "cpu")


if __name__ == "__main__":
    main()
