"""`fvy-export`: serialize a serving program into a portable artifact.

Deploy-time counterpart of the reference's bake-weights-into-Docker flow
(reference docker/code/Dockerfile:11-15): instead of shipping a Python stack
plus checkpoint files, export ONE self-contained StableHLO artifact
(core/export.py) that any JAX runtime can load and call.

    fvy-export --target detect --out face_detect.fvyx \
        [--conf face_vijnana_yolov3.json] [--set fd_conf.model_path=...] \
        [--precision int8 --calib 'val/*.jpg'] [--batch 8] [--platforms tpu,cpu]

Targets:
  detect    fused detector: letterboxed images -> (cands, counts)
  embed     fid extractor: crops -> embeddings
  identify  embed + registry match: (crops, registry) -> (emb, idx, dist)

int8 exports need representative calibration images (--calib glob of JPEGs,
letterboxed here exactly like the evaluate path letterboxes them).

Serving precision default (when --precision is omitted): int8-auto if --calib
is given (the headline path — faster AND more accurate than guarded bf16 on
trained checkpoints), else the guarded-bf16 fallback. --precision float32
keeps reference-parity arithmetic.
"""

from __future__ import annotations

import glob
import sys

import numpy as np

from face_vijnana_yolov3_tpu.api.config import apply_overrides, load_conf


def _load_calib(pattern: str, image_size: int, limit: int = 32) -> np.ndarray:
    """Glob JPEGs -> (N,S,S,3) f32 letterboxed batch (reference /255-then-
    resize order, face_detection.py:113)."""
    from face_vijnana_yolov3_tpu.ops.letterbox import letterbox_host
    from face_vijnana_yolov3_tpu.utils.io import imread

    files = sorted(glob.glob(pattern))[:limit]
    if not files:
        raise SystemExit(f"--calib {pattern!r} matched no files")
    batch = [
        letterbox_host(imread(f).astype(np.float32) / 255.0, image_size)[0]
        for f in files
    ]
    return np.stack(batch)


def main(argv: list[str] | None = None):
    from face_vijnana_yolov3_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    argv = sys.argv[1:] if argv is None else argv

    conf_path = None
    overrides: list[str] = []
    target = out = calib = None
    precision: str | None = None
    batch: int | None = None
    platforms = ("tpu", "cpu")

    it = iter(argv)
    for a in it:
        def _val(flag=a):
            nxt = next(it, None)
            if nxt is None:
                raise SystemExit(f"{flag} requires an argument")
            return nxt

        if a.startswith("--conf="):
            conf_path = a.split("=", 1)[1]
        elif a == "--conf":
            conf_path = _val()
        elif a == "--set":
            overrides.append(_val())
        elif a.startswith("--set="):
            overrides.append(a.split("=", 1)[1])
        elif a == "--target":
            target = _val()
        elif a.startswith("--target="):
            target = a.split("=", 1)[1]
        elif a == "--out":
            out = _val()
        elif a.startswith("--out="):
            out = a.split("=", 1)[1]
        elif a == "--precision":
            precision = _val()
        elif a.startswith("--precision="):
            precision = a.split("=", 1)[1]
        elif a == "--batch":
            batch = int(_val())
        elif a.startswith("--batch="):
            batch = int(a.split("=", 1)[1])
        elif a == "--calib":
            calib = _val()
        elif a.startswith("--calib="):
            calib = a.split("=", 1)[1]
        elif a == "--platforms":
            platforms = tuple(_val().split(","))
        elif a.startswith("--platforms="):
            platforms = tuple(a.split("=", 1)[1].split(","))
        else:
            raise SystemExit(f"unknown argument {a!r}")

    if target not in ("detect", "embed", "identify"):
        raise SystemExit("--target must be detect, embed, or identify")
    if not out:
        raise SystemExit("--out is required")

    auto_precision = precision is None
    if precision is None:
        # Serving default: int8-auto when calibration data exists — it beats
        # the guarded-bf16 path on BOTH axes on trained checkpoints (AP50
        # 0.8445 vs 0.7833, 4262 vs 1969 img/s; STATUS.md defaults table).
        # Guarded bf16 is the no-calibration-data fallback; pass an explicit
        # --precision float32 for reference-parity arithmetic.
        precision = "int8" if calib else "bfloat16"
        print(
            f"[fvy-export] no --precision given: defaulting to {precision} "
            + ("(int8-auto calibrated on --calib images)" if calib else
               "(guarded bf16 fallback — pass --calib for the faster, "
               "more accurate int8-auto serving default)")
        )

    conf = load_conf(conf_path)
    apply_overrides(conf, overrides)

    from face_vijnana_yolov3_tpu.core import export as fvy_export

    if target == "detect":
        from face_vijnana_yolov3_tpu.api.face_detection import (
            FaceDetectorPipeline,
        )

        fd = FaceDetectorPipeline(conf.fd_conf, precision=precision)
        if precision == "int8":
            if calib is None:
                raise SystemExit("--precision int8 requires --calib")
            fd.calibrate_int8(_load_calib(calib, fd.image_size))
            # Calibration self-check verdict (quantize_autotail): int8 PTQ
            # damage can sit in blocks no bf16 tail covers (an epoch-3xx
            # bench artifact collapsed to AP50 0.0 at EVERY tail depth —
            # PROFILE.md). When even the deepest tail leaves the int8 head
            # far from the f32 head, exporting it would ship a silently
            # broken model: fall back to the guarded-bf16 serving path.
            err = getattr(fd, "int8_calib_err", 0.0)
            if err > 0.05:
                msg = (
                    f"int8 calibration self-check FAILED (1-boxF1 "
                    f"{err:.3f} at bf16 tail "
                    f"{getattr(fd, 'int8_tail_chosen', 0)}) — this "
                    "checkpoint does not serve accurately in int8"
                )
                if auto_precision:
                    print(f"[fvy-export] {msg}; falling back to guarded "
                          "bf16")
                    precision = "bfloat16"
                    fd = FaceDetectorPipeline(
                        conf.fd_conf, precision="bfloat16")
                else:
                    print(f"[fvy-export] WARNING: {msg}; exporting the "
                          "explicitly requested int8 anyway")
        header = fvy_export.export_detector(
            fd, out, batch=batch, platforms=platforms
        )
    else:
        from face_vijnana_yolov3_tpu.api.face_identification import (
            FaceIdentifierPipeline,
        )

        fi = FaceIdentifierPipeline(conf, precision=precision)
        if precision == "int8":
            if calib is None:
                raise SystemExit("--precision int8 requires --calib")
            calib_batch = _load_calib(calib, fi.image_size)
            # embed() calibrates _q_embed on its first batch
            fi.embed(calib_batch)
            # FI int8 self-check (VERDICT r3 #4): match-flip-rate vs the f32
            # embed on the calibration crops, mirroring the detector's
            # box-F1 gate. Each int8 embedding is matched against the f32
            # embeddings of ALL calibration crops; its nearest neighbour
            # must be ITS OWN f32 twin — a flip means quantization rotated
            # the embedding past the inter-crop separation, exactly the
            # failure that flips registry argmins in serving
            # (reference match loop: face_identification.py:915-925).
            flip = _fi_int8_flip_rate(fi, conf, calib_batch)
            if flip > 0.05:
                msg = (f"FI int8 self-check FAILED (match-flip-rate "
                       f"{flip:.1%} vs f32 on {len(calib_batch)} "
                       "calibration crops)")
                if auto_precision:
                    print(f"[fvy-export] {msg}; falling back to guarded "
                          "bf16")
                    precision = "bfloat16"
                    fi = FaceIdentifierPipeline(conf, precision="bfloat16")
                else:
                    print(f"[fvy-export] WARNING: {msg}; exporting the "
                          "explicitly requested int8 anyway")
            else:
                print(f"[fvy-export] FI int8 self-check passed "
                      f"(match-flip-rate {flip:.1%})")
        header = fvy_export.export_embedder(
            fi, out, batch=batch,
            with_registry=(target == "identify"), platforms=platforms,
        )

    print(f"[fvy-export] wrote {out}: {header}")


def _fi_int8_flip_rate(fi, conf, calib_batch: np.ndarray) -> float:
    """Fraction of calibration crops whose int8 embedding's nearest f32
    embedding is NOT its own f32 twin (label-free FI quantization gate)."""
    import jax.numpy as jnp

    from face_vijnana_yolov3_tpu.api.face_identification import (
        FaceIdentifierPipeline,
    )
    from face_vijnana_yolov3_tpu.ops.similarity import match_embeddings

    fi32 = FaceIdentifierPipeline(conf, precision="float32")
    emb32 = np.asarray(fi32.embed(calib_batch))
    emb8 = np.asarray(fi.embed(calib_batch))
    idx8, _ = match_embeddings(jnp.asarray(emb8), jnp.asarray(emb32))
    return float(
        (np.asarray(idx8) != np.arange(len(calib_batch))).mean())


if __name__ == "__main__":
    main()
