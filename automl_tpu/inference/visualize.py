"""Box/label drawing on numpy images (PIL).

Capability parity with the drawing core of efficientdet/visualize/vis_utils.py
(visualize_boxes_and_labels_on_image_array, :763) — boxes, class labels,
scores, per-class colors, score filtering, max_boxes cap. Host-side, eval/demo
only.
"""

from __future__ import annotations

import colorsys

import numpy as np

from automl_tpu.inference import label_util

_NUM_COLORS = 36


def _color(idx: int):
  h = (idx * 0.61803398875) % 1.0
  r, g, b = colorsys.hsv_to_rgb(h, 0.85, 1.0)
  return int(r * 255), int(g * 255), int(b * 255)


def visualize_image(image, boxes, classes, scores, label_map=None,
                    min_score_thresh: float = 0.3, max_boxes_to_draw: int = 100,
                    line_thickness: int = 2):
  """Draw detections on a uint8 [H,W,3] image; returns a new uint8 array.

  boxes: [N, 4] absolute (ymin, xmin, ymax, xmax); classes: [N] int ids;
  scores: [N] in [0, 1].
  """
  from PIL import Image, ImageDraw

  label_map = label_util.get_label_map(label_map)
  img = Image.fromarray(np.asarray(image, np.uint8))
  draw = ImageDraw.Draw(img)
  order = np.argsort(-np.asarray(scores))
  drawn = 0
  for i in order:
    if drawn >= max_boxes_to_draw:
      break
    score = float(scores[i])
    if score < min_score_thresh:
      continue
    ymin, xmin, ymax, xmax = [float(v) for v in boxes[i]]
    cls = int(classes[i])
    color = _color(cls % _NUM_COLORS)
    for t in range(line_thickness):
      draw.rectangle([xmin + t, ymin + t, xmax - t, ymax - t], outline=color)
    name = label_map.get(cls, str(cls))
    text = f"{name}: {int(score * 100)}%"
    th = 11
    draw.rectangle([xmin, max(ymin - th - 2, 0), xmin + 7 * len(text),
                    max(ymin, th + 2)], fill=color)
    draw.text((xmin + 2, max(ymin - th - 1, 1)), text, fill="black")
    drawn += 1
  return np.asarray(img)
