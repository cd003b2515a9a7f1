"""Host-side oracle implementations of the reference semantics, written loop-style
from the behavioral spec (SURVEY.md §2 C3-C5, C12) to cross-check the vectorized
device ops. These are test fixtures, not framework code.
"""

from __future__ import annotations

import numpy as np


def oracle_iou(a, b):
    """Interval-overlap IoU of two [xmin,ymin,xmax,ymax] boxes."""

    def overlap(x1, x2, x3, x4):
        if x3 < x1:
            if x4 < x1:
                return 0.0
            return min(x2, x4) - x1
        if x2 < x3:
            return 0.0
        return min(x2, x4) - x3

    iw = overlap(a[0], a[2], b[0], b[2])
    ih = overlap(a[1], a[3], b[1], b[3])
    inter = iw * ih
    union = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    if union == 0:
        # The reference would raise ZeroDivisionError here; the device op yields
        # NaN which never satisfies `>= th`. Mirror the no-suppress outcome.
        return float("nan")
    return float(inter) / union


def oracle_nms_single(boxes, scores, iou_th):
    """Greedy single-class NMS: descending-score sweep zeroing later overlaps."""
    scores = np.array(scores, dtype=np.float64)
    order = np.argsort(-scores, kind="stable")
    for ii in range(len(order)):
        i = order[ii]
        if scores[i] == 0:
            continue
        for jj in range(ii + 1, len(order)):
            j = order[jj]
            if oracle_iou(boxes[i], boxes[j]) >= iou_th:
                scores[j] = 0.0
    return scores


def oracle_face_decode(head, image_size=416, grid=13, conf_th=0.5):
    """Loop decode of the 13x13x6 face head, spec'd from SURVEY §2 C12."""

    def sigmoid(x):
        return 1.0 / (1.0 + np.exp(-x))

    cell = image_size // grid
    head = np.array(head, dtype=np.float64)
    obj = sigmoid(head[..., 0])
    score = obj * sigmoid(head[..., 5])
    out = []
    for i in range(grid):
        for j in range(grid):
            if obj[i, j] > 0.0 and score[i, j] >= conf_th:
                bx = max(head[i, j, 1], 0.0)
                by = max(head[i, j, 2], 0.0)
                bw = max(head[i, j, 3], 0.0)
                bh = max(head[i, j, 4], 0.0)
                px = min(int(bx * cell), cell - 1) + cell * j
                py = min(int(by * cell), cell - 1) + cell * i
                pw = min(bw * image_size, image_size)
                ph = min(bh * image_size, image_size)
                xmin = max(px - int(pw / 2), 0)
                ymin = max(py - int(ph / 2), 0)
                xmax = min(px + int(pw / 2), image_size - 1)
                ymax = min(py + int(ph / 2), image_size - 1)
                out.append((i, j, xmin, ymin, xmax, ymax, obj[i, j], score[i, j]))
    return out


def oracle_face_detect(head, image_size=416, grid=13, conf_th=0.5, nms_th=0.5,
                       num_cands=60):
    """Full detect() oracle: decode → NMS → score>0 filter → ASC sort → top-n."""
    cands = oracle_face_decode(head, image_size, grid, conf_th)
    if not cands:
        return []
    boxes = [(c[2], c[3], c[4], c[5]) for c in cands]
    scores = [c[7] for c in cands]
    scores = oracle_nms_single(boxes, scores, nms_th)
    keep = [(b, min(s, 1.0)) for b, s in zip(boxes, scores) if s > 0.0]
    keep.sort(key=lambda t: t[1])  # ascending-score quirk
    return keep[:num_cands]


# ----------------------------------------------------------------- COCO demo

COCO_ANCHORS = (
    (116, 90, 156, 198, 373, 326),
    (30, 61, 62, 45, 59, 119),
    (10, 13, 16, 30, 33, 23),
)


def oracle_coco_decode(netout, scale_idx, obj_th, net_h=416, net_w=416):
    """Loop decode of one COCO scale, spec'd from decode_netout
    (reference yolov3_detect.py:335-387): sigmoid xy / [obj,classes],
    exp-anchor wh, per-scale anchor-subset skip, objectness gate.

    Returns a list of dicts {xmin..ymax (normalized floats), obj, classes}.
    """

    def sigmoid(v):
        return 1.0 / (1.0 + np.exp(-v))

    grid_h, grid_w = netout.shape[:2]
    t = np.array(netout, dtype=np.float64).reshape(grid_h, grid_w, 3, -1)
    anchors = COCO_ANCHORS[scale_idx]
    out = []
    for i in range(grid_h * grid_w):
        row, col = int(i / grid_w), i % grid_w
        for b in range(3):
            # anchor-subset skip quirk (yolov3_detect.py:354-362)
            if scale_idx in (0, 2) and b in (0, 2):
                continue
            if scale_idx == 1 and b == 1:
                continue
            obj = sigmoid(t[row, col, b, 4])
            if obj < obj_th:
                continue
            x = (col + sigmoid(t[row, col, b, 0])) / grid_w
            y = (row + sigmoid(t[row, col, b, 1])) / grid_h
            w = anchors[2 * b] * np.exp(t[row, col, b, 2]) / net_w
            h = anchors[2 * b + 1] * np.exp(t[row, col, b, 3]) / net_h
            out.append({
                "xmin": x - w / 2, "ymin": y - h / 2,
                "xmax": x + w / 2, "ymax": y + h / 2,
                "obj": obj, "classes": sigmoid(t[row, col, b, 5:]),
            })
    return out


def oracle_correct_coco_boxes(boxes, image_h, image_w, net_h=416, net_w=416):
    """correct_yolo_boxes semantics (yolov3_detect.py:389-404) incl. the
    `new_h = net_w` quirk; int() truncation into original-image coords."""
    if (float(net_w) / image_w) < (float(net_h) / image_h):
        new_w = net_w
        new_h = (image_h * net_w) / image_w
    else:
        new_h = net_w  # reference quirk (:394)
        new_w = (image_w * net_h) / image_h
    x_off, x_scale = (net_w - new_w) / 2.0 / net_w, float(new_w) / net_w
    y_off, y_scale = (net_h - new_h) / 2.0 / net_h, float(new_h) / net_h
    for bx in boxes:
        bx["xmin"] = int((bx["xmin"] - x_off) / x_scale * image_w)
        bx["xmax"] = int((bx["xmax"] - x_off) / x_scale * image_w)
        bx["ymin"] = int((bx["ymin"] - y_off) / y_scale * image_h)
        bx["ymax"] = int((bx["ymax"] - y_off) / y_scale * image_h)
    return boxes


def oracle_nms_multi(boxes, nms_th):
    """do_nms semantics (yolov3_detect.py:426-444): per class, descending-score
    sweep zeroing classes[c] of suppressed boxes, in place."""
    if not boxes:
        return boxes
    nb_class = len(boxes[0]["classes"])
    coords = [(b["xmin"], b["ymin"], b["xmax"], b["ymax"]) for b in boxes]
    for c in range(nb_class):
        order = np.argsort([-b["classes"][c] for b in boxes])
        for ii in range(len(order)):
            i = order[ii]
            if boxes[i]["classes"][c] == 0:
                continue
            for jj in range(ii + 1, len(order)):
                j = order[jj]
                iou = oracle_iou(coords[i], coords[j])
                if iou >= nms_th:
                    boxes[j]["classes"][c] = 0
    return boxes
