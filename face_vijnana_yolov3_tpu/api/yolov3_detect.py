"""Self-contained COCO YOLOv3 demo CLI (reference yolov3_detect.py parity).

`python -m face_vijnana_yolov3_tpu.api.yolov3_detect -w yolov3.weights -i img.jpg`
detects the 80 COCO classes in one image and writes `<img>_detected.<ext>`
(reference src/space/yolov3_detect.py:551-614: thresholds 0.5/0.5/0.45,
letterbox with gray 0.5 padding, per-scale anchor subsets, per-class NMS,
boxes drawn for classes scoring > 0.1).

TPU-native: the whole decode→correct→NMS chain runs as one fused device program
(ops/postprocess.coco_postprocess) instead of host loops over 10k candidates.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

COCO_LABELS = [
    "person", "bicycle", "car", "motorbike", "aeroplane", "bus", "train",
    "truck", "boat", "traffic light", "fire hydrant", "stop sign",
    "parking meter", "bench", "bird", "cat", "dog", "horse", "sheep", "cow",
    "elephant", "bear", "zebra", "giraffe", "backpack", "umbrella", "handbag",
    "tie", "suitcase", "frisbee", "skis", "snowboard", "sports ball", "kite",
    "baseball bat", "baseball glove", "skateboard", "surfboard",
    "tennis racket", "bottle", "wine glass", "cup", "fork", "knife", "spoon",
    "bowl", "banana", "apple", "sandwich", "orange", "broccoli", "carrot",
    "hot dog", "pizza", "donut", "cake", "chair", "sofa", "pottedplant",
    "bed", "diningtable", "toilet", "tvmonitor", "laptop", "mouse", "remote",
    "keyboard", "cell phone", "microwave", "oven", "toaster", "sink",
    "refrigerator", "book", "clock", "vase", "scissors", "teddy bear",
    "hair drier", "toothbrush",
]


def preprocess_coco(image: np.ndarray, net_h: int = 416, net_w: int = 416):
    """The COCO demo's letterbox (yolov3_detect.py:313-333): float resize of the
    BGR-flipped /255 image into a 0.5-gray canvas.

    Note this differs from the face pipeline's letterbox: float (not int)
    geometry with ceil, gray (not black) padding, and a channel flip quirk
    (`image[:,:,::-1]` — the reference feeds BGR to a network trained on RGB;
    preserved for output parity).
    """
    import cv2 as cv

    new_h, new_w, _ = image.shape
    if (float(net_w) / new_w) < (float(net_h) / new_h):
        new_h = (new_h * net_w) / new_w
        new_w = net_w
    else:
        new_w = (new_w * net_h) / new_h
        new_h = net_h
    rh, rw = int(np.ceil(new_h)), int(np.ceil(new_w))
    resized = cv.resize(
        (image[:, :, ::-1] / 255.0).astype(np.float64), (rw, rh),
        interpolation=cv.INTER_LINEAR,
    )
    canvas = np.ones((net_h, net_w, 3)) * 0.5
    y0 = int((net_h - new_h) / 2)
    x0 = int((net_w - new_w) / 2)
    canvas[y0 : y0 + rh, x0 : x0 + rw, :] = resized
    return canvas[None].astype(np.float32)


def load_yolov3_params(path: str):
    """(params, state) for the full 3-head graph from either weight format:
    a darknet binary (`yolov3.weights`) or a Keras-layout h5
    (`yolov3_model.h5` — the demo CLI's save/load fast path, reference
    yolov3_detect.py:572-585)."""
    from face_vijnana_yolov3_tpu.models import darknet

    if path.endswith((".h5", ".hd5")):
        from face_vijnana_yolov3_tpu.core.keras_import import yolov3_from_keras_h5

        return yolov3_from_keras_h5(path)
    from face_vijnana_yolov3_tpu.core.weights import load_darknet_weights

    return load_darknet_weights(path, darknet.yolov3_graph())


def detect_coco(
    weights_path: str,
    image: np.ndarray,
    obj_thresh: float = 0.5,
    nms_thresh: float = 0.45,
    precision: str = "float32",
    net_size: int = 416,
    params_state: tuple | None = None,
):
    """Full-image COCO detection; returns (boxes, objness, classes, valid)."""
    import jax
    from functools import partial

    import jax.numpy as jnp

    from face_vijnana_yolov3_tpu.models import darknet
    from face_vijnana_yolov3_tpu.utils.runtime import tpu_compiler_options
    from face_vijnana_yolov3_tpu.ops.postprocess import coco_postprocess

    ops = darknet.yolov3_graph()
    if params_state is not None:
        params, state = params_state
    else:
        params, state = load_yolov3_params(weights_path)
    image_h, image_w = image.shape[:2]
    x = jnp.asarray(preprocess_coco(image, net_size, net_size))

    if precision == "int8":
        # Calibrated PTQ over the full 3-head graph (models/quant.py); the
        # input image itself is the calibration sample for a single-image CLI.
        from face_vijnana_yolov3_tpu.models import quant

        folded = darknet.fold_graph_params(params, state, ops)
        qparams = quant.quantize_folded(folded, x, ops)

        @partial(jax.jit,
                 compiler_options=tpu_compiler_options("serving"))
        def run(x):
            outs = quant.apply_graph_quant(qparams, x, ops)
            return coco_postprocess(
                (outs["yolo_82"][0], outs["yolo_94"][0], outs["yolo_106"][0]),
                image_h, image_w, obj_thresh, nms_thresh,
                net_h=net_size, net_w=net_size,
            )
    elif precision == "bfloat16":
        folded = darknet.fold_graph_params(params, state, ops)

        @partial(jax.jit,
                 compiler_options=tpu_compiler_options("serving"))
        def run(x):
            outs = darknet.apply_graph_folded(
                folded, x, ops, compute_dtype=jnp.bfloat16
            )
            return coco_postprocess(
                (outs["yolo_82"][0], outs["yolo_94"][0], outs["yolo_106"][0]),
                image_h, image_w, obj_thresh, nms_thresh,
                net_h=net_size, net_w=net_size,
            )
    else:

        @partial(jax.jit,
                 compiler_options=tpu_compiler_options("serving"))
        def run(x):
            outs, _ = darknet.apply_graph(params, state, x, ops)
            return coco_postprocess(
                (outs["yolo_82"][0], outs["yolo_94"][0], outs["yolo_106"][0]),
                image_h, image_w, obj_thresh, nms_thresh,
                net_h=net_size, net_w=net_size,
            )

    boxes, obj, classes, valid = run(x)
    return (np.asarray(boxes), np.asarray(obj), np.asarray(classes),
            np.asarray(valid))


def draw_coco(image: np.ndarray, boxes, objness, classes, valid,
              draw_thresh: float = 0.1) -> np.ndarray:
    """Draw per-class detections (draw_boxes semantics: any class > 0.1)."""
    from PIL import Image, ImageDraw

    im = Image.fromarray(image.astype(np.uint8), mode="RGB")
    draw = ImageDraw.Draw(im)
    h, w = image.shape[:2]
    for k in range(boxes.shape[0]):
        if not valid[k]:
            continue
        labels = [
            (COCO_LABELS[c], float(classes[k, c]))
            for c in range(classes.shape[1])
            if classes[k, c] > draw_thresh
        ]
        if not labels:
            continue
        if not np.all(np.isfinite(boxes[k])):
            continue
        x0 = float(np.clip(boxes[k, 0], 0, w - 1))
        y0 = float(np.clip(boxes[k, 1], 0, h - 1))
        x1 = float(np.clip(boxes[k, 2], 0, w - 1))
        y1 = float(np.clip(boxes[k, 3], 0, h - 1))
        if x1 <= x0 or y1 <= y0:
            continue
        draw.rectangle([x0, y0, x1, y1], outline=(0, 255, 0), width=2)
        text = " ".join(f"{n} {s:.2f}" for n, s in labels)
        draw.text((x0, max(y0 - 13, 0)), text, fill=(0, 0, 255))
    return np.asarray(im)


class YOLOV3:
    """Convenience detector mirroring the docker variant's `YOLOV3` class
    (reference docker/code/yolov3_detect.py:623-683): constructed from the
    saved model file, `detect_object` runs detect → person/bottle entropy
    filter → draw → `*_detected*` save and returns (image, boxes).

    `model_path` accepts the legacy `yolov3_model.hd5`/`.h5` (Keras-layout
    weights h5) or a darknet `yolov3.weights`.
    """

    def __init__(self, model_path: str = "yolov3_model.h5",
                 precision: str = "float32", net_size: int = 416):
        # 416 like the reference; the 256/128 variants it keeps commented
        # out (docker/code/yolov3_detect.py:630-632) are the net_size knob
        self.net_h = self.net_w = net_size
        self.labels = COCO_LABELS
        self.precision = precision
        self.params_state = load_yolov3_params(model_path)

    def _detect_boxes(self, image: np.ndarray, obj_thresh, nms_thresh):
        """BoundBox list in original-image coords (reference box API)."""
        from face_vijnana_yolov3_tpu.ops.boxes import BoundBox

        boxes, obj, classes, valid = detect_coco(
            "", image, obj_thresh, nms_thresh, self.precision,
            net_size=self.net_h, params_state=self.params_state,
        )
        out = []
        for k in range(boxes.shape[0]):
            if not valid[k] or not np.all(np.isfinite(boxes[k])):
                continue
            out.append(BoundBox(
                float(boxes[k, 0]), float(boxes[k, 1]),
                float(boxes[k, 2]), float(boxes[k, 3]),
                objness=float(obj[k]), classes=np.asarray(classes[k]),
            ))
        return out

    def detect_object(self, image_path, obj_thresh, cls_thresh, nms_thresh,
                      human_entropy_thresh, bottle_entropy_thresh):
        """docker/code/yolov3_detect.py:640-668 semantics, incl. the
        `image_path[:-5] + '_detected' + image_path[-5:]` output-name
        arithmetic (written for 5-char '.jpeg' suffixes; a '.jpg' input loses
        a stem character exactly as the reference would)."""
        from face_vijnana_yolov3_tpu.utils.io import imread, imsave
        from face_vijnana_yolov3_tpu.utils.box_select import get_person_boxes
        from face_vijnana_yolov3_tpu.utils.drawing import draw_boxes_v1

        image = imread(image_path)
        boxes = self._detect_boxes(image, obj_thresh, nms_thresh)
        boxes = get_person_boxes(boxes, self.labels, cls_thresh,
                                 human_entropy_thresh, bottle_entropy_thresh)
        image = draw_boxes_v1(image, boxes, self.labels, cls_thresh)
        imsave(image_path[:-5] + "_detected" + image_path[-5:],
               image.astype("uint8"))
        return image, boxes

    def detect_person(self, image, obj_thresh, cls_thresh, nms_thresh,
                      human_entropy_thresh, bottle_entropy_thresh):
        """In-memory variant (docker/code/yolov3_detect.py:670-683): detect on
        an array and return the entropy-filtered person boxes, no drawing."""
        from face_vijnana_yolov3_tpu.utils.box_select import get_person_boxes

        boxes = self._detect_boxes(np.asarray(image), obj_thresh, nms_thresh)
        return get_person_boxes(boxes, self.labels, cls_thresh,
                                human_entropy_thresh, bottle_entropy_thresh)


def main(argv=None):
    from face_vijnana_yolov3_tpu.utils.io import imread, imsave
    from face_vijnana_yolov3_tpu.utils.runtime import enable_compile_cache

    parser = argparse.ArgumentParser(
        description="test yolov3 network with coco weights"
    )
    parser.add_argument("-w", "--weights", default="yolov3.weights")
    parser.add_argument("-i", "--image", required=True)
    parser.add_argument("-l", "--load", default=0, type=int,
                        help="1: load yolov3_model.h5 instead of -w "
                             "(reference yolov3_detect.py:572-580)")
    parser.add_argument("-s", "--save", default=0, type=int,
                        help="1: save yolov3_model.h5 after loading "
                             "(reference yolov3_detect.py:584-585)")
    parser.add_argument("--obj-thresh", type=float, default=0.5)
    parser.add_argument("--nms-thresh", type=float, default=0.45)
    parser.add_argument("--precision", default="float32",
                        choices=["float32", "bfloat16", "int8"])
    ns = parser.parse_args(argv)

    enable_compile_cache()
    if ns.load:
        params_state = load_yolov3_params("yolov3_model.h5")
    else:
        params_state = load_yolov3_params(ns.weights)
    if ns.save:
        from face_vijnana_yolov3_tpu.core.keras_import import (
            save_yolov3_keras_h5,
        )

        save_yolov3_keras_h5(*params_state, "yolov3_model.h5")
    image = imread(ns.image)
    boxes, obj, classes, valid = detect_coco(
        "", image, ns.obj_thresh, ns.nms_thresh, ns.precision,
        params_state=params_state,
    )
    out = draw_coco(image, boxes, obj, classes, valid)
    root, ext = os.path.splitext(ns.image)
    out_path = f"{root}_detected{ext}"
    imsave(out_path, out)
    n = int(
        ((classes > 0.1).any(axis=1) & valid).sum()
    )
    print(f"{n} detections → {out_path}")


if __name__ == "__main__":
    main()
