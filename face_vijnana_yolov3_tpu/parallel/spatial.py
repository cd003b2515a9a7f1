"""Spatial partitioning of the conv grid for high-resolution serving.

A scale-out axis the reference cannot express at all: its serving path is
one 416x416 image per `predict` call on one GPU (reference
src/space/face_detection.py:899). On TPU the fused detect program is a single
SPMD program, so activations can be sharded over the *spatial* height dim in
addition to batch: images lay out as P('data', 'model') over an NHWC batch,
and XLA's GSPMD partitioner inserts the halo exchanges every 3x3 conv needs
at shard boundaries (1-row halos riding ICI, negligible vs the conv FLOPs).

When this matters: latency-bound high-resolution detect. At 416^2 the right
axis is batch DP (throughput). But for a 720p/4K native-resolution variant —
image_size 832/1664, 4x/16x the pixels — a single chip's step time grows
linearly while DP cannot shrink it; sharding H over 'model' divides the conv
grid (and the per-chip HBM working set, which is what bounds the front convs
— see PROFILE.md) by the model-axis size.

The partitioner handles everything declaratively — strided convs, the
13x13-grid head, non-divisible shard sizes (internal padding) — so this module
is thin: shardings + a jitted runner. That thinness IS the point of the
mesh/GSPMD design; contrast with manual halo DMA a hand-rolled backend needs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from face_vijnana_yolov3_tpu.parallel.mesh import replicated
from face_vijnana_yolov3_tpu.utils.runtime import tpu_compiler_options


def spatial_batch_sharded(mesh: Mesh) -> NamedSharding:
    """Images NHWC: batch over 'data', height over 'model' (conv-grid split)."""
    return NamedSharding(mesh, P("data", "model"))


def detect_spatial(model, mesh: Mesh, *, compute_dtype=jnp.bfloat16,
                   postprocess_cfg=None, f32_front_blocks: int = 0):
    """Jitted fused detect with DP x SP sharding over `mesh`.

    Returns fn(folded_params, images[B,H,W,3]) -> (candidates, counts), the
    same contract as the single-chip serving path (ops/postprocess), with
    images consumed as P('data','model') and outputs batch-sharded. Pass
    `postprocess_cfg=None` to get the raw (B,g,g,6) head instead (g = H/32).

    f32_front_blocks: same bf16 input-noise guard as the single-chip serving
    path (FdConf.bf16_f32_front; models/darknet.apply_graph_folded) — pass 2
    when serving trained checkpoints in bf16.
    """
    from face_vijnana_yolov3_tpu.ops.postprocess import face_postprocess

    img_sharding = spatial_batch_sharded(mesh)
    repl = replicated(mesh)
    out_sharding = NamedSharding(mesh, P("data"))

    def fwd(folded, images):
        head = model.apply_folded(folded, images, compute_dtype=compute_dtype,
                                  f32_front_blocks=f32_front_blocks)
        if postprocess_cfg is None:
            return head
        # Postprocess is per-image (169 cells) — gather the head per batch
        # shard and run it data-parallel; its cost is ~1.6% of the program.
        head = jax.lax.with_sharding_constraint(head, out_sharding)
        return jax.vmap(lambda h: face_postprocess(h, postprocess_cfg))(head)

    n_out = 1 if postprocess_cfg is None else 2
    return jax.jit(
        fwd,
        in_shardings=(repl, img_sharding),
        out_shardings=(out_sharding,) * n_out if n_out > 1 else out_sharding,
        compiler_options=tpu_compiler_options("serving"),
    )
