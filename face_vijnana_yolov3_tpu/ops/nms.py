"""Greedy IoU NMS as a fixed-shape masked device computation.

The reference's NMS is an O(n^2) host python loop over BoundBox objects
(do_nms_v2, src/space/yolov3_detect.py:446-458; multi-class do_nms :426-444). The
same greedy semantics — process boxes in descending score order, zero the score of
any later box whose IoU with a surviving box meets the threshold — are reproduced
here as: one stable argsort, one pairwise IoU matrix, and a `lax.fori_loop` sweep of
vectorized row suppressions. Everything is static-shape, so it jits, vmaps over a
batch, and fuses with the decode that feeds it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from face_vijnana_yolov3_tpu.ops.boxes import pairwise_iou


def nms_single_class(
    boxes: jnp.ndarray, scores: jnp.ndarray, iou_th: float
) -> jnp.ndarray:
    """Single-class greedy NMS (do_nms_v2 semantics, yolov3_detect.py:446-458).

    Boxes with score 0 never suppress others (the reference skips them as pivots);
    invalid candidates must be encoded by the caller as score 0 — they then behave
    exactly like boxes absent from the reference's list.

    Args:
      boxes: (N, 4) [xmin,ymin,xmax,ymax].
      scores: (N,) — reference BoundBox.classes[0].
      iou_th: suppression threshold; suppress when IoU >= iou_th.

    Returns:
      (N,) scores with suppressed entries zeroed, in the original box order.
    """
    n = scores.shape[0]
    order = jnp.argsort(-scores)  # stable sort: ties keep original (cell) order
    b_sorted = boxes[order]
    s_sorted = scores[order]
    iou = pairwise_iou(b_sorted, b_sorted)  # (N, N); NaN on 0/0 never suppresses
    later = jnp.arange(n)[None, :] > jnp.arange(n)[:, None]

    def body(i, s):
        alive = s[i] > 0.0
        suppress = alive & later[i] & (iou[i] >= iou_th)
        return jnp.where(suppress, 0.0, s)

    s_sorted = jax.lax.fori_loop(0, n, body, s_sorted)
    return jnp.zeros_like(scores).at[order].set(s_sorted)


def nms_multi_class(
    boxes: jnp.ndarray, class_scores: jnp.ndarray, iou_th: float
) -> jnp.ndarray:
    """Multi-class greedy NMS (do_nms semantics, yolov3_detect.py:426-444).

    Each class channel is suppressed independently; the IoU matrix is shared.

    Args:
      boxes: (N, 4).
      class_scores: (N, C).
      iou_th: suppress when IoU >= iou_th.

    Returns:
      (N, C) class scores with suppressed entries zeroed.
    """
    n = class_scores.shape[0]
    iou = pairwise_iou(boxes, boxes)

    def one_class(scores):
        order = jnp.argsort(-scores)
        s_sorted = scores[order]
        iou_sorted = iou[order][:, order]
        later = jnp.arange(n)[None, :] > jnp.arange(n)[:, None]

        def body(i, s):
            alive = s[i] > 0.0
            suppress = alive & later[i] & (iou_sorted[i] >= iou_th)
            return jnp.where(suppress, 0.0, s)

        s_sorted = jax.lax.fori_loop(0, n, body, s_sorted)
        return jnp.zeros_like(scores).at[order].set(s_sorted)

    return jax.vmap(one_class, in_axes=1, out_axes=1)(class_scores)
