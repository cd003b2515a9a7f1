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
from jax.sharding import Mesh

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
