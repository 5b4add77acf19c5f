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


def visualize_batch(batch, class_texts=None, out_dir="debug_vis",
                    mean=(0.0, 0.0, 0.0), std=(255.0, 255.0, 255.0)):
    """Debug dump of a training batch with gt boxes drawn.

    Behavioral spec: reference wedetect/models/utils/vis.py:9-109
    (visualize_batch): denormalize images, draw each gt box with its
    class text, save one file per image.
    """
    import os

    import numpy as np

    os.makedirs(out_dir, exist_ok=True)
    images = np.asarray(batch.images)
    paths = []
    for i in range(images.shape[0]):
        if images.dtype == np.uint8:
            img = images[i]
        else:  # normalized floats -> denormalize
            img = (images[i].astype(np.float32) * np.asarray(std)
                   + np.asarray(mean))
            img = np.clip(img, 0, 255).astype(np.uint8)
        m = np.asarray(batch.gt_mask[i])
        boxes = np.asarray(batch.gt_bboxes[i])[m]
        labels = np.asarray(batch.gt_labels[i])[m]
        drawn = draw_detections(img, boxes, np.ones(len(boxes)),
                                labels, class_names=class_texts)
        path = os.path.join(out_dir, f"batch_{i}.jpg")
        drawn.save(path)
        paths.append(path)
    return paths
