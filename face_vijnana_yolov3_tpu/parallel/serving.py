"""Multi-chip serving: data-parallel fused detect over a device mesh.

Scale-out for the headline int8 serving path (models/quant.py). The
reference's serving is strictly one image per host `predict` round-trip on
one GPU (reference src/space/face_detection.py:899); here the whole
preprocess→trunk→decode→NMS program is one SPMD computation, so serving N
chips is the SAME jitted program with the image batch laid out P('data') —
GSPMD replicates the (int8) weights and splits the batch, no collectives on
the forward path at all (postprocess is per-image). Throughput scales
linearly with the mesh; contrast `parallel/spatial.py`, which shards the
conv grid itself for the latency-bound high-resolution case.

Bit-parity note: the int8 trunk is integer arithmetic, so the DP-sharded
program's outputs equal the single-device jitted program's exactly
(tests/test_parallel_serving.py asserts bitwise equality on the 8-device
virtual mesh; eager differs by bf16 head rounding that jit fuses away).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from face_vijnana_yolov3_tpu.parallel.mesh import batch_sharded, replicated
from face_vijnana_yolov3_tpu.utils.runtime import tpu_compiler_options


def detect_quant_dp(model, mesh: Mesh, qparams, *, postprocess_cfg=None,
                    head_dtype=jnp.bfloat16):
    """Jitted int8 fused detect, batch data-parallel over every mesh device.

    qparams are captured at build time (replicated over the mesh) rather
    than passed per call: mixed-tail qparams (int8_bf16_tail / the hybrid
    front) carry a static `tail_start` op index that slices the op list at
    trace time — as a jit argument it would arrive traced and crash
    (TracerIntegerConversionError at quant.apply_graph_quant).

    Returns fn(images[B,S,S,3]) -> (candidates, counts) with the single-chip
    serving contract (ops/postprocess.face_postprocess), images consumed
    P('data') and outputs batch-sharded. B must be divisible by the total
    device count (the single-chip pipeline's pad_batch_to staging already
    produces fixed batch shapes). postprocess_cfg=None returns the raw
    (B,g,g,6) head.
    """
    from face_vijnana_yolov3_tpu.ops.postprocess import face_postprocess

    img_sharding = batch_sharded(mesh)
    repl = replicated(mesh)
    tail_start = qparams.get("tail_start")
    if tail_start is not None:
        # keep the op-list slice index a python int across device_put
        tail_start = int(tail_start)
    qparams = {**jax.device_put(
        {k: v for k, v in qparams.items() if k != "tail_start"}, repl)}
    if tail_start is not None:
        qparams["tail_start"] = tail_start

    def fwd(images):
        head = model.apply_quant(qparams, images, head_dtype=head_dtype)
        if postprocess_cfg is None:
            return head
        return jax.vmap(lambda h: face_postprocess(h, postprocess_cfg))(head)

    n_out = 1 if postprocess_cfg is None else 2
    return jax.jit(
        fwd,
        in_shardings=(img_sharding,),
        out_shardings=(img_sharding,) * n_out if n_out > 1 else img_sharding,
        compiler_options=tpu_compiler_options("serving"),
    )


def identify_roi_dp(embed_fn, mesh: Mesh, *, image_size: int,
                    window_h: int, window_w: int):
    """Fused ROI identify — windowed crop+letterbox matmuls → embed trunk →
    registry match — with the ROI axis data-parallel over the mesh.

    Multi-chip form of the FI serving flagship
    (api/face_identification._roi_fused_fn; the reference's counterpart is
    the one-crop-per-predict host loop at
    /root/reference/src/space/face_identification.py:872-925): the packed
    per-ROI operand array (ops/roi.pack_roi_operands layout, shape
    (n_sub, bucket, F)) shards its BUCKET axis over 'data', while the staged
    originals and the registry replicate. Every stage of the program is
    per-ROI — the dynamic-slice window gather reads the replicated staged
    batch locally, the embed trunk is batch-over-ROIs, and the registry
    argmin is per query — so the forward needs no collectives at all and
    scales linearly, exactly like detect_quant_dp.

    Args:
      embed_fn: raw (unjitted) crops→embeddings closure — e.g. the
        pipeline's `_embed_raw(bucket)`, or `model.embed_folded` bound to
        folded params. Must be un-jitted: compiler_options jits are
        top-level-only.
      image_size: letterbox target (the embed trunk's input size).
      window_h/window_w: the dynamic-slice window bucket
        (ops/roi.window_bucket of the chunk's largest crop).

    Returns fn(staged[B,maxH,maxW,C], packed[n_sub,bucket,F], reg[R,D]) ->
    (n_sub, bucket, 2) float32 [best_idx, best_dist] rows, bucket-sharded.
    `bucket` must be divisible by the 'data' axis size.
    """
    from face_vijnana_yolov3_tpu.ops.roi import (
        roi_letterbox_device_windowed,
        unpack_roi_operands,
    )
    from face_vijnana_yolov3_tpu.ops.similarity import match_embeddings

    repl = replicated(mesh)
    roi_sharding = NamedSharding(mesh, P(None, "data", None))

    def fwd(staged, packed, reg):
        def sub(p):
            org, ri, rw, ci, cw = unpack_roi_operands(p, image_size)
            crops = roi_letterbox_device_windowed(
                staged, org, ri, rw, ci, cw,
                window_h=window_h, window_w=window_w,
            )
            emb = embed_fn(crops)
            idx, dist = match_embeddings(emb, reg)
            return jnp.stack([idx.astype(jnp.float32), dist], -1)

        return jax.lax.map(sub, packed)

    return jax.jit(
        fwd,
        in_shardings=(repl, roi_sharding, repl),
        out_shardings=roi_sharding,
        compiler_options=tpu_compiler_options("serving"),
    )
