"""Device-side ops: letterbox, box geometry, YOLO decode, NMS, similarity."""

from face_vijnana_yolov3_tpu.ops.boxes import pairwise_iou
from face_vijnana_yolov3_tpu.ops.letterbox import (
    LetterboxGeometry,
    letterbox_geometry,
    letterbox_host,
    letterbox_device,
    unletterbox_boxes,
    unletterbox_boxes_chunk,
)
from face_vijnana_yolov3_tpu.ops.decode import decode_face_head, decode_coco_scale
from face_vijnana_yolov3_tpu.ops.nms import nms_single_class, nms_multi_class
from face_vijnana_yolov3_tpu.ops.postprocess import (
    face_postprocess,
    FacePostprocessConfig,
    coco_postprocess,
)
from face_vijnana_yolov3_tpu.ops.similarity import match_embeddings

__all__ = [
    "pairwise_iou",
    "LetterboxGeometry",
    "letterbox_geometry",
    "letterbox_host",
    "letterbox_device",
    "unletterbox_boxes",
    "unletterbox_boxes_chunk",
    "decode_face_head",
    "decode_coco_scale",
    "nms_single_class",
    "nms_multi_class",
    "face_postprocess",
    "FacePostprocessConfig",
    "coco_postprocess",
    "match_embeddings",
]
