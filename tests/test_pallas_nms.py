"""Pallas NMS kernel parity vs the XLA path.

Interpret mode here (CPU test backend); the same kernel is verified bit-exact
against nms_single_class on the real v5e chip — see ops/pallas_nms.py."""

import numpy as np
import jax.numpy as jnp

from face_vijnana_yolov3_tpu.ops.nms import nms_single_class
from face_vijnana_yolov3_tpu.ops.pallas_nms import nms_single_class_pallas


def test_pallas_nms_matches_xla_interpret():
    rng = np.random.default_rng(0)
    for trial in range(3):
        n = 169
        mins = rng.uniform(0, 300, (n, 2))
        sizes = rng.uniform(10, 120, (n, 2))
        boxes = np.concatenate([mins, mins + sizes], 1).astype(np.float32)
        scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
        scores[rng.integers(0, n, 20)] = 0.0  # absent rows
        want = np.asarray(
            nms_single_class(jnp.asarray(boxes), jnp.asarray(scores), 0.45)
        )
        got = np.asarray(
            nms_single_class_pallas(
                jnp.asarray(boxes), jnp.asarray(scores), 0.45, interpret=True
            )
        )
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_pallas_nms_degenerate_boxes_no_suppress():
    boxes = np.zeros((4, 4), np.float32)  # all degenerate → NaN IoU
    scores = np.array([0.9, 0.8, 0.7, 0.6], np.float32)
    got = np.asarray(
        nms_single_class_pallas(
            jnp.asarray(boxes), jnp.asarray(scores), 0.3, interpret=True
        )
    )
    np.testing.assert_allclose(got, scores)


def test_pallas_fused_front_matches_stock_interpret():
    """Experimental fused conv0+conv1 front kernel: exact vs stock folded."""
    import jax
    from face_vijnana_yolov3_tpu.models.detector import FaceDetectorModel
    from face_vijnana_yolov3_tpu.models import darknet
    from face_vijnana_yolov3_tpu.models.s2d import build_s2d_folded
    from face_vijnana_yolov3_tpu.ops.pallas_front import fused_front

    model = FaceDetectorModel(image_size=64)
    params, state = model.init(jax.random.PRNGKey(0))
    folded = darknet.fold_graph_params(params, state, model.ops)
    folded_s2d = build_s2d_folded(folded)
    x = jnp.asarray(
        np.random.default_rng(0).uniform(size=(2, 64, 64, 3)).astype(np.float32)
    )
    front_ops = model.ops[:2] + [("output", "t")]
    want = darknet.apply_graph_folded(
        folded, x, front_ops, compute_dtype=jnp.float32
    )["t"]
    got = fused_front(x, folded_s2d, compute_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(
        np.asarray(want), np.asarray(got), atol=5e-6
    )
