"""Fused detection post-processing: decode + NMS + candidate selection, on device.

This is the kernel the BASELINE north-star names: the reference runs sigmoid /
threshold / box decode / NMS / candidate selection as host numpy loops after every
`predict` (src/space/face_detection.py:899-947); here the whole chain is one jitted
XLA program that runs where the conv output already lives, vmapped over the batch.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from face_vijnana_yolov3_tpu.ops.decode import (
    decode_face_head,
    decode_coco_scale,
    correct_coco_boxes,
)
from face_vijnana_yolov3_tpu.ops.nms import nms_single_class, nms_multi_class


@dataclasses.dataclass(frozen=True)
class FacePostprocessConfig:
    image_size: int = 416
    grid: int = 13
    conf_th: float = 0.5      # hps['face_conf_th']
    nms_iou_th: float = 0.5   # hps['nms_iou_th']
    num_cands: int = 60       # hps['num_cands']


def face_postprocess(head_out: jnp.ndarray, cfg: FacePostprocessConfig):
    """Decode one image's 13x13x6 head output into <=num_cands face boxes.

    Reproduces FaceDetector.detect end-to-end (face_detection.py:885-949)
    including the final-selection quirk: survivors are sorted by score
    **ascending** and the first num_cands kept (:943-947).

    Returns:
      cands: (num_cands, 6) float32 rows [xmin, ymin, xmax, ymax, objness, score]
             in net (416) coords; rows beyond `count` are zero.
      count: () int32 — number of valid candidate rows.
    """
    boxes, scores, objness, mask = decode_face_head(
        head_out, cfg.image_size, cfg.grid, cfg.conf_th
    )
    # Invalid candidates get score 0 → behave as absent from the reference's list.
    scores = jnp.where(mask, scores, 0.0)
    scores = nms_single_class(boxes, scores, cfg.nms_iou_th)

    valid = mask & (scores > 0.0)
    # get_score() clamps at 1.0 (yolov3_detect.py:155); a no-op for obj*sigmoid
    # products but kept for contract fidelity.
    sort_scores = jnp.minimum(scores, 1.0)
    key = jnp.where(valid, sort_scores, jnp.inf)  # invalid rows sort to the end
    order = jnp.argsort(key)  # ASCENDING — reference quirk (:944)
    take = order[: cfg.num_cands]
    rows = jnp.concatenate(
        [boxes, objness[:, None], sort_scores[:, None]], axis=-1
    )[take]
    taken_valid = valid[take]
    count = jnp.sum(taken_valid.astype(jnp.int32))
    cands = jnp.where(taken_valid[:, None], rows, 0.0)
    return cands, count


@partial(jax.jit, static_argnames=("cfg",))
def face_postprocess_batch(head_out: jnp.ndarray, cfg: FacePostprocessConfig):
    """vmap of `face_postprocess` over a (B, grid, grid, 6) batch."""
    return jax.vmap(lambda h: face_postprocess(h, cfg))(head_out)


# --------------------------------------------------------------------------- COCO

def coco_postprocess(
    netouts: tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
    image_h: int,
    image_w: int,
    obj_th: float = 0.5,
    nms_th: float = 0.45,
    top_k: int = 256,
    net_h: int = 416,
    net_w: int = 416,
):
    """Full-COCO demo postprocess (yolov3_detect.py:593-604 pipeline).

    Decodes the three scale outputs (with the reference's anchor-subset quirk),
    maps boxes to original-image integer coords, prefilters to the top_k candidates
    by objectness (the reference keeps all above-threshold boxes; parity holds
    whenever fewer than top_k pass, which is every practical image), then runs
    80-class greedy NMS.

    Returns:
      boxes:   (top_k, 4) int-valued float32 boxes in original-image coords.
      objness: (top_k,)
      classes: (top_k, 80) post-NMS class scores.
      valid:   (top_k,) bool objectness-gate mask.
    """
    all_boxes, all_obj, all_cls, all_mask = [], [], [], []
    for s, netout in enumerate(netouts):
        b, o, c, m = decode_coco_scale(netout, s, obj_th, net_h, net_w)
        all_boxes.append(b)
        all_obj.append(o)
        all_cls.append(c)
        all_mask.append(m)
    boxes = jnp.concatenate(all_boxes)
    obj = jnp.concatenate(all_obj)
    classes = jnp.concatenate(all_cls)
    mask = jnp.concatenate(all_mask)

    boxes = correct_coco_boxes(boxes, image_h, image_w, net_h, net_w)

    # Top-k prefilter by gated objectness.
    gated = jnp.where(mask, obj, -1.0)
    _, idx = jax.lax.top_k(gated, top_k)
    boxes_k = boxes[idx]
    obj_k = obj[idx]
    mask_k = mask[idx]
    classes_k = jnp.where(mask_k[:, None], classes[idx], 0.0)

    classes_k = nms_multi_class(boxes_k, classes_k, nms_th)
    return boxes_k, obj_k, classes_k, mask_k
