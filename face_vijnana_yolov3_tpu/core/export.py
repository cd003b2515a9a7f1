"""Portable serialized serving artifacts (jax.export / StableHLO).

The reference's deploy story is baking the trained weights into a Docker
image and re-running the whole Keras stack at serving time
(reference docker/code/Dockerfile:11-15 wgets yolov3.weights + the trained
`.hd5`s into the image). The TPU-native equivalent ships ONE self-contained
file instead: the fused serving program — trunk → head → decode+NMS+top-k
for detection, trunk → dense → l2norm (→ registry match) for identification
— exported with `jax.export`, weights baked in as StableHLO constants. Any
JAX runtime (CPU or TPU) can `load_artifact()` and call it with zero
framework code, checkpoint files, or config on the serving host.

The batch dimension is exported SYMBOLICALLY (jax.export symbolic shapes),
so one artifact serves every batch size; XLA still specializes per concrete
shape at call time, exactly like jit.

File format (little-endian):
  bytes 0-3   magic b"FVYX"
  bytes 4-7   u32 header length H
  bytes 8-..  UTF-8 JSON header (kind, precision, shape contract,
              thresholds, jax version, format_version)
  rest        jax.export serialized payload
"""

from __future__ import annotations

import json
import struct
from dataclasses import dataclass
from typing import Any, Sequence

import numpy as np

_MAGIC = b"FVYX"
FORMAT_VERSION = 1

# Lowering targets baked into every artifact. "tpu" covers real TPUs
# (including the axon-tunneled chip — its PJRT compiles the tpu lowering);
# "cpu" makes the same file runnable on any dev box for verification.
DEFAULT_PLATFORMS = ("tpu", "cpu")


def _export_jit(fn, arg_specs: Sequence[Any], platforms: Sequence[str]):
    import jax
    from jax import export as jexport

    exp = jexport.export(jax.jit(fn), platforms=tuple(platforms))(*arg_specs)
    return exp


def _batch_spec(batch: int | None, trailing: tuple, dtype):
    """ShapeDtypeStruct with a symbolic leading dim when batch is None."""
    import jax
    from jax import export as jexport

    if batch is None:
        (b,) = jexport.symbolic_shape("b")
        return jax.ShapeDtypeStruct((b, *trailing), dtype)
    return jax.ShapeDtypeStruct((int(batch), *trailing), dtype)


def save_artifact(path: str, exported, header: dict) -> None:
    header = dict(header)
    header["format_version"] = FORMAT_VERSION
    import jax

    header.setdefault("jax_version", jax.__version__)
    blob = json.dumps(header).encode("utf-8")
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<I", len(blob)))
        f.write(blob)
        f.write(exported.serialize())


@dataclass
class LoadedArtifact:
    """A deserialized serving program: `meta` (the JSON header) + callable."""

    meta: dict
    exported: Any

    def __call__(self, *args):
        return self.exported.call(*args)


def load_artifact(path: str) -> LoadedArtifact:
    from jax import export as jexport

    with open(path, "rb") as f:
        magic = f.read(4)
        if magic != _MAGIC:
            raise ValueError(
                f"{path}: not a FVYX serving artifact (magic {magic!r})"
            )
        (hlen,) = struct.unpack("<I", f.read(4))
        meta = json.loads(f.read(hlen).decode("utf-8"))
        if meta.get("format_version", 0) > FORMAT_VERSION:
            raise ValueError(
                f"{path}: format_version {meta['format_version']} is newer "
                f"than this reader ({FORMAT_VERSION})"
            )
        payload = f.read()
    return LoadedArtifact(meta=meta, exported=jexport.deserialize(payload))


# --------------------------------------------------------------- detection


def export_detector(
    pipeline, path: str, *, batch: int | None = None,
    platforms: Sequence[str] = DEFAULT_PLATFORMS,
) -> dict:
    """Export a FaceDetectorPipeline's fused detect program.

    The artifact maps (B, S, S, 3) f32 letterboxed images (values in [0,1],
    reference preprocessing) → (cands (B, num_cands, 6), counts (B,)) with
    rows [xmin, ymin, xmax, ymax, objness, score] in net coords — the
    detect_batch contract (api/face_detection.py). Weights (and, for int8,
    the calibrated scales) are baked in as constants; int8 pipelines must
    have been calibrated (calibrate_int8) before exporting.

    batch=None exports a symbolic batch dimension. Returns the header dict.
    """
    if pipeline._jit_detect is None:
        pipeline._build_detect()  # raises if int8 and uncalibrated
    spec = _batch_spec(
        batch, (pipeline.image_size, pipeline.image_size, 3), np.float32
    )
    exported = _export_jit(pipeline._detect_fn, (spec,), platforms)
    header = {
        "kind": "face_detect",
        "precision": pipeline.precision,
        "image_size": pipeline.image_size,
        "batch": batch,
        "num_cands": pipeline._pp_cfg.num_cands,
        "conf_th": pipeline._pp_cfg.conf_th,
        "nms_iou_th": pipeline._pp_cfg.nms_iou_th,
        "platforms": list(platforms),
        "inputs": "images (B,S,S,3) f32 letterboxed in [0,1]",
        "outputs": "cands (B,num_cands,6) [x0,y0,x1,y1,obj,score] net "
                   "coords; counts (B,) int32",
    }
    save_artifact(path, exported, header)
    return header


# ------------------------------------------------------------ identification


def export_embedder(
    pipeline, path: str, *, batch: int | None = None,
    with_registry: bool = True,
    platforms: Sequence[str] = DEFAULT_PLATFORMS,
) -> dict:
    """Export a FaceIdentifierPipeline's embed (+ registry match) program.

    with_registry=True (default): the artifact maps
    (crops (B, S, S, 3) f32, registry (R, D) f32) →
    (embeddings (B, D), best_idx (B,) int32, best_dist (B,)) — the
    detect→crop→embed→match serving chain's device half
    (reference face_identification.py:915-925). The registry is a RUNTIME
    argument (R symbolic), so enrolling subjects never re-exports.

    with_registry=False: crops → embeddings only.

    int8 pipelines must have embedded once (or been calibrated) before
    exporting so `_q_embed` exists. Returns the header dict.
    """
    if ((pipeline.precision == "int8" or pipeline._hybrid_front)
            and getattr(pipeline, "_q_embed", None) is None):
        raise RuntimeError(
            "int8 embedder export requires calibration first — call "
            ".embed() on a representative batch before export_embedder()"
        )
    embed_fn = pipeline._embed_raw(0)
    size = pipeline.image_size
    dim = pipeline.model.dense1_dim

    if with_registry:
        import jax
        from jax import export as jexport

        from face_vijnana_yolov3_tpu.ops import similarity

        def run(crops, registry):
            emb = embed_fn(crops)
            idx, dist = similarity.match_embeddings(emb, registry)
            return emb, idx, dist

        # Both symbolic dims must come from ONE scope (jax.export scoping);
        # R (registry rows) is always symbolic so enrolling never re-exports.
        if batch is None:
            b, r = jexport.symbolic_shape("b, r")
        else:
            b, (r,) = int(batch), jexport.symbolic_shape("r")
        crop_spec = jax.ShapeDtypeStruct((b, size, size, 3), np.float32)
        reg_spec = jax.ShapeDtypeStruct((r, dim), np.float32)
        exported = _export_jit(run, (crop_spec, reg_spec), platforms)
        outputs = ("embeddings (B,D) f32; best_idx (B,) int32; "
                   "best_dist (B,) f32 — gate with hps['sim_th']")
        inputs = ("crops (B,S,S,3) f32 letterboxed in [0,1]; "
                  "registry (R,D) f32 mean embeddings")
    else:
        crop_spec = _batch_spec(batch, (size, size, 3), np.float32)
        exported = _export_jit(embed_fn, (crop_spec,), platforms)
        outputs = "embeddings (B,D) f32 (L2-normalized)"
        inputs = "crops (B,S,S,3) f32 letterboxed in [0,1]"

    header = {
        "kind": "face_embed",
        "precision": pipeline.precision,
        "image_size": size,
        "embed_dim": dim,
        "batch": batch,
        "with_registry": with_registry,
        "platforms": list(platforms),
        "inputs": inputs,
        "outputs": outputs,
    }
    save_artifact(path, exported, header)
    return header
