"""Model family: darknet trunk, full YOLOv3, face detector, face identifier."""

from face_vijnana_yolov3_tpu.models.darknet import (
    yolov3_graph,
    trunk_graph,
    init_graph_params,
    apply_graph,
    fold_graph_params,
    apply_graph_folded,
)
from face_vijnana_yolov3_tpu.models.detector import FaceDetectorModel
from face_vijnana_yolov3_tpu.models.identifier import FaceIdentifierModel

__all__ = [
    "yolov3_graph",
    "trunk_graph",
    "init_graph_params",
    "apply_graph",
    "fold_graph_params",
    "apply_graph_folded",
    "FaceDetectorModel",
    "FaceIdentifierModel",
]
