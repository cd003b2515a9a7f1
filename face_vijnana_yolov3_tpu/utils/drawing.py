"""Box/annotation drawing (reference draw_boxes_v3 equivalent).

The reference draws GT boxes red and predictions green with
score/classes/subject_id text (reference src/space/yolov3_detect.py:515-530,
PIL rectangle width 3, arial 25). Font falls back to PIL's default when arial
isn't installed.
"""

from __future__ import annotations

import numpy as np
from PIL import Image, ImageDraw, ImageFont


def _font():
    try:
        return ImageFont.truetype("arial.ttf", 25)
    except OSError:
        return ImageFont.load_default()


def draw_boxes(
    image: np.ndarray,
    boxes: list[dict],
    color=(0, 255, 0),
) -> np.ndarray:
    """Draw boxes onto an RGB uint8 image.

    Each box dict: {xmin, ymin, xmax, ymax, score (optional), subject_id (optional)}.
    Returns a new array (input untouched).
    """
    im = Image.fromarray(np.asarray(image, dtype=np.uint8), mode="RGB")
    draw = ImageDraw.Draw(im)
    font = _font()
    for box in boxes:
        draw.rectangle(
            [box["xmin"], box["ymin"], box["xmax"], box["ymax"]],
            outline=color,
            width=3,
        )
        label = f"{box.get('score', 1.0)}, {box.get('score', 1.0)}, {box.get('subject_id', -1)}"
        draw.text((box["xmin"], box["ymin"] - 20), label, fill=color, font=font)
    return np.asarray(im)
