"""PIL visualization of detections.

Behavioral spec: reference vis.py:6-73 (plot_bounding_boxes) and
infer_wedetect.py:119-140 — colored rectangles + class/score captions.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

PALETTE = [
    (255, 56, 56), (255, 157, 151), (255, 112, 31), (255, 178, 29),
    (207, 210, 49), (72, 249, 10), (146, 204, 23), (61, 219, 134),
    (26, 147, 52), (0, 212, 187), (44, 153, 168), (0, 194, 255),
    (52, 69, 147), (100, 115, 255), (0, 24, 236), (132, 56, 255),
    (82, 0, 133), (203, 56, 255), (255, 149, 200), (255, 55, 199),
]


def draw_detections(image, boxes: np.ndarray, scores: np.ndarray,
                    labels: np.ndarray,
                    class_names: Optional[Sequence[str]] = None,
                    line_width: int = 3):
    """Draw xyxy boxes on a PIL image (returns a copy)."""
    from PIL import Image, ImageDraw

    if not isinstance(image, Image.Image):
        image = Image.fromarray(np.asarray(image))
    img = image.copy().convert("RGB")
    d = ImageDraw.Draw(img)
    for box, score, label in zip(boxes, scores, labels):
        color = PALETTE[int(label) % len(PALETTE)]
        x1, y1, x2, y2 = [float(v) for v in box]
        d.rectangle([x1, y1, x2, y2], outline=color, width=line_width)
        name = (class_names[int(label)] if class_names is not None
                else str(int(label)))
        caption = f"{name} {float(score):.2f}"
        tw = d.textlength(caption)
        th = 12
        d.rectangle([x1, max(y1 - th - 4, 0), x1 + tw + 4, max(y1, th)],
                    fill=color)
        d.text((x1 + 2, max(y1 - th - 3, 0)), caption, fill=(255,) * 3)
    return img
