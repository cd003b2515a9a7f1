"""YOLO head decoding as fixed-shape vectorized device ops.

The reference decodes on the host with python double loops
(face detector: src/space/face_detection.py:899-932; COCO demo:
src/space/yolov3_detect.py:335-387). Here the same integer/threshold math runs as a
single fused XLA program over the whole grid — every cell decoded in parallel, with a
validity mask instead of data-dependent list building (TPU programs need static
shapes).
"""

from __future__ import annotations

import jax.numpy as jnp


def decode_face_head(
    head_out: jnp.ndarray,
    image_size: int = 416,
    grid: int = 13,
    conf_th: float = 0.5,
):
    """Decode the 13x13x6 face head into fixed-shape candidate boxes.

    Bit-compatible with FaceDetector.detect's host math
    (face_detection.py:899-932), including:
      * obj = sigmoid(ch0); score = obj * sigmoid(ch5)     (:904-905)
      * candidate gate: obj > 0 AND score >= face_conf_th  (:909)
      * bx..bh clamped at 0                                (:912-915)
      * px = min(int(bx*cell), cell-1) + cell*col  — int() truncation is floor for
        the non-negative operands here                      (:919-920)
      * pw = min(bw*S, S); half sizes int-truncated; xmin/ymin clamped at 0,
        xmax/ymax at S-1                                   (:921-928)

    Args:
      head_out: (grid, grid, 6) raw head activations (float32).
      image_size: network input size S (416).
      grid: cells per side (13).
      conf_th: hps['face_conf_th'].

    Returns:
      boxes:  (grid*grid, 4) float32 [xmin, ymin, xmax, ymax] in net coords
              (integer-valued floats).
      scores: (grid*grid,) float32 — the reference's BoundBox.classes[0].
      objness:(grid*grid,) float32.
      mask:   (grid*grid,) bool — passed the confidence gate.
    """
    cell = image_size // grid
    t = head_out.astype(jnp.float32)
    obj = 1.0 / (1.0 + jnp.exp(-t[..., 0]))
    score = obj * (1.0 / (1.0 + jnp.exp(-t[..., 5])))
    b = jnp.maximum(t[..., 1:5], 0.0)

    rows = jnp.arange(grid, dtype=jnp.int32)[:, None]  # i — y cell
    cols = jnp.arange(grid, dtype=jnp.int32)[None, :]  # j — x cell

    px = jnp.minimum(jnp.floor(b[..., 0] * cell), cell - 1).astype(jnp.int32) + cell * cols
    py = jnp.minimum(jnp.floor(b[..., 1] * cell), cell - 1).astype(jnp.int32) + cell * rows
    pw = jnp.minimum(b[..., 2] * image_size, float(image_size))
    ph = jnp.minimum(b[..., 3] * image_size, float(image_size))
    half_w = jnp.floor(pw / 2.0).astype(jnp.int32)
    half_h = jnp.floor(ph / 2.0).astype(jnp.int32)

    xmin = jnp.maximum(px - half_w, 0)
    ymin = jnp.maximum(py - half_h, 0)
    xmax = jnp.minimum(px + half_w, image_size - 1)
    ymax = jnp.minimum(py + half_h, image_size - 1)

    mask = (obj > 0.0) & (score >= conf_th)

    boxes = jnp.stack(
        [xmin.astype(jnp.float32), ymin.astype(jnp.float32),
         xmax.astype(jnp.float32), ymax.astype(jnp.float32)],
        axis=-1,
    ).reshape(-1, 4)
    return boxes, score.reshape(-1), obj.reshape(-1), mask.reshape(-1)


# Anchor table and the per-scale anchor-subset skip quirk of the reference
# (yolov3_detect.py:354-362): at scale 0 only b==1 survives, at scale 1 b==0 and
# b==2, at scale 2 only b==1.
COCO_ANCHORS = (
    (116, 90, 156, 198, 373, 326),
    (30, 61, 62, 45, 59, 119),
    (10, 13, 16, 30, 33, 23),
)
KEPT_ANCHOR_IDS = ((1,), (0, 2), (1,))


def decode_coco_scale(
    netout: jnp.ndarray,
    scale_idx: int,
    obj_th: float,
    net_h: int = 416,
    net_w: int = 416,
):
    """Decode one COCO YOLO scale output into normalized candidate boxes.

    Matches decode_netout (yolov3_detect.py:335-387): sigmoid on xy and on
    [obj, classes]; exp-anchor wh; per-scale anchor subset; gate on objectness.

    Args:
      netout: (G, G, 255) raw output of one YOLO head.
      scale_idx: 0 (stride 32), 1 (stride 16), 2 (stride 8).
      obj_th: objectness threshold.

    Returns:
      boxes:   (G*G*K, 4) normalized [xmin,ymin,xmax,ymax] (K = kept anchors).
      objness: (G*G*K,)
      classes: (G*G*K, 80) sigmoid class scores.
      mask:    (G*G*K,) bool objectness gate.
    """
    grid = netout.shape[0]
    anchors = COCO_ANCHORS[scale_idx]
    kept = KEPT_ANCHOR_IDS[scale_idx]

    t = netout.reshape(grid, grid, 3, 85).astype(jnp.float32)
    xy = 1.0 / (1.0 + jnp.exp(-t[..., 0:2]))
    obj_cls = 1.0 / (1.0 + jnp.exp(-t[..., 4:]))
    obj = obj_cls[..., 0]
    classes = obj_cls[..., 1:]

    rows = jnp.arange(grid, dtype=jnp.float32)[:, None, None]
    cols = jnp.arange(grid, dtype=jnp.float32)[None, :, None]

    x = (cols + xy[..., 0]) / grid
    y = (rows + xy[..., 1]) / grid
    aw = jnp.asarray([anchors[2 * b] for b in range(3)], dtype=jnp.float32)
    ah = jnp.asarray([anchors[2 * b + 1] for b in range(3)], dtype=jnp.float32)
    w = aw * jnp.exp(t[..., 2]) / net_w
    h = ah * jnp.exp(t[..., 3]) / net_h

    boxes = jnp.stack([x - w / 2, y - h / 2, x + w / 2, y + h / 2], axis=-1)
    mask = obj >= obj_th

    kept_idx = jnp.asarray(kept, dtype=jnp.int32)
    boxes = boxes[:, :, kept_idx, :].reshape(-1, 4)
    obj = obj[:, :, kept_idx].reshape(-1)
    classes = classes[:, :, kept_idx, :].reshape(-1, 80)
    mask = mask[:, :, kept_idx].reshape(-1)
    return boxes, obj, classes, mask


def correct_coco_boxes(
    boxes: jnp.ndarray, image_h: int, image_w: int, net_h: int = 416, net_w: int = 416
) -> jnp.ndarray:
    """Map normalized boxes back to original-image integer pixel coords.

    Matches correct_yolo_boxes (yolov3_detect.py:389-404): un-letterbox with the
    float geometry (note: the reference computes new_h/new_w as *floats* here, unlike
    the int-truncating training letterbox), then int() truncation toward zero.
    """
    if (float(net_w) / image_w) < (float(net_h) / image_h):
        new_w = float(net_w)
        new_h = (image_h * net_w) / image_w
    else:
        new_h = float(net_w)  # reference quirk: net_w, not net_h (:394)
        new_w = (image_w * net_h) / image_h
    x_offset, x_scale = (net_w - new_w) / 2.0 / net_w, new_w / net_w
    y_offset, y_scale = (net_h - new_h) / 2.0 / net_h, new_h / net_h
    x = jnp.trunc((boxes[:, 0::2] - x_offset) / x_scale * image_w)
    y = jnp.trunc((boxes[:, 1::2] - y_offset) / y_scale * image_h)
    return jnp.stack([x[:, 0], y[:, 0], x[:, 1], y[:, 1]], axis=-1)
