"""Box geometry primitives as vectorized JAX ops.

Semantics follow the reference's host-side helpers (reference
src/space/yolov3_detect.py:165-194): IoU uses interval overlap with *no* +1 pixel
convention, union = area1 + area2 - intersection. Degenerate boxes (zero area on both
sides with zero intersection) produce NaN here where the reference would raise a
ZeroDivisionError; NaN compares False against any threshold so such pairs never
suppress each other.
"""

from __future__ import annotations

import jax.numpy as jnp


def _interval_overlap(a_min, a_max, b_min, b_max):
    """Vectorized interval overlap, matching yolov3_detect.py:165-178.

    The reference returns `min(x2,x4) - x1` (or `- x3`) *without* clamping at zero in
    the inner branch, but the outer conditions guarantee non-negativity except when
    the intervals are disjoint, where it returns 0. The closed form below is
    equivalent: max(0, min(a_max,b_max) - max(a_min,b_min)).
    """
    return jnp.maximum(0.0, jnp.minimum(a_max, b_max) - jnp.maximum(a_min, b_min))


def pairwise_iou(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """IoU matrix between two box sets.

    Args:
      boxes_a: (N, 4) [xmin, ymin, xmax, ymax], float.
      boxes_b: (M, 4) same layout.

    Returns:
      (N, M) IoU matrix (float32). Matches reference bbox_iou
      (yolov3_detect.py:183-194) elementwise.
    """
    a = boxes_a[:, None, :]  # (N,1,4)
    b = boxes_b[None, :, :]  # (1,M,4)
    iw = _interval_overlap(a[..., 0], a[..., 2], b[..., 0], b[..., 2])
    ih = _interval_overlap(a[..., 1], a[..., 3], b[..., 1], b[..., 3])
    intersect = iw * ih
    area_a = (a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1])
    area_b = (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])
    union = area_a + area_b - intersect
    return intersect / union


class BoundBox:
    """Compatibility record mirroring the reference BoundBox
    (yolov3_detect.py:126-163) for code migrating from the reference API.

    The framework's device paths use plain arrays; this shim exists so
    reference-style host code (metric scripts, notebooks) ports unchanged.
    """

    def __init__(self, xmin, ymin, xmax, ymax, objness=None, classes=None,
                 anchor=None, subject_id=-1):
        self.xmin = xmin
        self.ymin = ymin
        self.xmax = xmax
        self.ymax = ymax
        self.objness = objness
        self.classes = classes
        self.anchor = anchor
        self.subject_id = subject_id
        self.label = -1
        self.score = -1

    def get_label(self):
        import numpy as np

        if self.label == -1:
            self.label = int(np.argmax(self.classes))
        return self.label

    def get_score(self):
        if self.score == -1:
            self.score = self.classes[self.get_label()]
        return min(self.score, 1.0)

    def get_relative_bb(self, width, height):
        return (
            int(self.xmin / width * 100.0),
            int(self.ymin / height * 100.0),
            int((self.xmax - self.xmin) / width * 100.0),
            int((self.ymax - self.ymin) / height * 100.0),
        )


def iou_single(box_a, box_b) -> float:
    """Scalar IoU for two [xmin,ymin,xmax,ymax] boxes (host-friendly)."""
    import numpy as np

    def overlap(x1, x2, x3, x4):
        if x3 < x1:
            if x4 < x1:
                return 0.0
            return min(x2, x4) - x1
        if x2 < x3:
            return 0.0
        return min(x2, x4) - x3

    iw = overlap(box_a[0], box_a[2], box_b[0], box_b[2])
    ih = overlap(box_a[1], box_a[3], box_b[1], box_b[3])
    intersect = iw * ih
    w1, h1 = box_a[2] - box_a[0], box_a[3] - box_a[1]
    w2, h2 = box_b[2] - box_b[0], box_b[3] - box_b[1]
    union = w1 * h1 + w2 * h2 - intersect
    return float(intersect) / union
