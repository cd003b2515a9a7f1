"""Core: parameter structures, darknet weight import, checkpoints."""

from face_vijnana_yolov3_tpu.core.weights import load_darknet_weights

__all__ = ["load_darknet_weights"]
