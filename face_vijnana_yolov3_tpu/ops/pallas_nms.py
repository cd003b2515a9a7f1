"""Pallas TPU kernel for the greedy NMS suppression sweep.

The XLA path (ops/nms.py) lowers the data-dependent greedy sweep to a
169-iteration `fori_loop` of small vector ops; this kernel runs the whole sweep
inside one Pallas program per image — the IoU matrix sits in VMEM and each
iteration is a single VPU row-compare + masked store, with no per-step HLO
overhead. The surrounding sort/decode/selection stay in XLA where the compiler
already does the right thing.

Semantics are identical to nms_single_class given pre-sorted inputs: process
rows in order; a row with score 0 never suppresses; later rows with
IoU >= threshold get zeroed. NaN IoUs (degenerate boxes) never suppress
(mapped to -1 before the kernel).

Status: validated bit-exact against the XLA path on a real v5e chip. Measured
at batch 128: 4.7 ms/sweep vs 3.6 ms for XLA's ENTIRE postprocess
(decode+NMS+selection, 1.6% of the fused detect program) — the XLA lowering
already wins at this problem size (169 boxes), so it stays the production
default and this kernel remains the drop-in for larger candidate counts
(the masked-reduce scalar read is the Mosaic-compatible formulation; dynamic
scalar indexing of values is unsupported).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from face_vijnana_yolov3_tpu.ops.boxes import pairwise_iou


def _sweep_kernel(iou_ref, scores_ref, out_ref, *, n: int, iou_th: float):
    """One image: iou (1,N,N), scores (1,1,N) sorted desc → suppressed (1,1,N)."""
    out_ref[...] = scores_ref[...]
    later = jax.lax.broadcasted_iota(jnp.int32, (1, 1, iou_ref.shape[2]), 2)

    def body(i, carry):
        s = out_ref[...]
        # Scalar s[i] via masked reduce — Mosaic has no dynamic_slice on values.
        alive = jnp.sum(jnp.where(later == i, s, 0.0)) > 0.0
        row = iou_ref[0, pl.ds(i, 1), :][None]  # (1, 1, N)
        suppress = alive & (later > i) & (row >= iou_th)
        out_ref[...] = jnp.where(suppress, 0.0, s)
        return carry

    jax.lax.fori_loop(0, n, body, 0)


def nms_sweep_pallas(
    boxes_sorted: jnp.ndarray,
    scores_sorted: jnp.ndarray,
    iou_th: float,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """Suppression sweep over descending-score-sorted boxes, one Pallas call.

    Args:
      boxes_sorted: (B, N, 4) already in processing order.
      scores_sorted: (B, N) matching scores (0 = absent).
    Returns:
      (B, N) suppressed scores in the same order.
    """
    b, n = scores_sorted.shape
    n_pad = max(128, -(-n // 128) * 128)  # lane-align for Mosaic
    if n_pad != n:
        boxes_sorted = jnp.pad(boxes_sorted, ((0, 0), (0, n_pad - n), (0, 0)))
        scores_sorted = jnp.pad(scores_sorted, ((0, 0), (0, n_pad - n)))
    iou = jax.vmap(lambda bb: pairwise_iou(bb, bb))(boxes_sorted)  # (B,N,N)
    # NaN never suppresses; replace so the kernel compare stays simple.
    iou = jnp.nan_to_num(iou, nan=-1.0, posinf=-1.0, neginf=-1.0)
    kernel = functools.partial(_sweep_kernel, n=n, iou_th=float(iou_th))
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n_pad, n_pad), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, n_pad), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, n_pad), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, 1, n_pad), jnp.float32),
        interpret=interpret,
    )(iou, scores_sorted.astype(jnp.float32)[:, None, :])
    return out[:, 0, :n]


def nms_single_class_pallas(
    boxes: jnp.ndarray, scores: jnp.ndarray, iou_th: float, *,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in for ops.nms.nms_single_class on a single image via the kernel."""
    order = jnp.argsort(-scores)
    out_sorted = nms_sweep_pallas(
        boxes[order][None], scores[order][None], iou_th, interpret=interpret
    )[0]
    return jnp.zeros_like(scores).at[order].set(out_sorted)
