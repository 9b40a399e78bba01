"""IoU / GIoU / DIoU / CIoU losses (math parity: efficientdet/iou_utils.py:27-191).

Boxes are (ymin, xmin, ymax, xmax). All ops are elementwise-vectorized over
leading dims — no per-box loops, VPU-friendly.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def _iou_terms(b1, b2):
  ymin1, xmin1, ymax1, xmax1 = jnp.moveaxis(b1, -1, 0)
  ymin2, xmin2, ymax2, xmax2 = jnp.moveaxis(b2, -1, 0)
  h1, w1 = jnp.maximum(ymax1 - ymin1, 0), jnp.maximum(xmax1 - xmin1, 0)
  h2, w2 = jnp.maximum(ymax2 - ymin2, 0), jnp.maximum(xmax2 - xmin2, 0)
  inter_h = jnp.maximum(jnp.minimum(ymax1, ymax2) - jnp.maximum(ymin1, ymin2), 0)
  inter_w = jnp.maximum(jnp.minimum(xmax1, xmax2) - jnp.maximum(xmin1, xmin2), 0)
  inter = inter_h * inter_w
  union = h1 * w1 + h2 * w2 - inter
  iou = jnp.where(union > 0, inter / (union + 1e-9), 0.0)
  return iou, (ymin1, xmin1, ymax1, xmax1), (ymin2, xmin2, ymax2, xmax2), union


def iou_value(pred_boxes, target_boxes, iou_type: str = "iou"):
  """Elementwise IoU variant between aligned box arrays [..., 4]."""
  iou, (ymin1, xmin1, ymax1, xmax1), (ymin2, xmin2, ymax2, xmax2), union = (
      _iou_terms(pred_boxes, target_boxes))
  if iou_type == "iou":
    return iou

  # smallest enclosing box
  cymin = jnp.minimum(ymin1, ymin2)
  cxmin = jnp.minimum(xmin1, xmin2)
  cymax = jnp.maximum(ymax1, ymax2)
  cxmax = jnp.maximum(xmax1, xmax2)

  if iou_type == "giou":
    c_area = jnp.maximum(cymax - cymin, 0) * jnp.maximum(cxmax - cxmin, 0)
    return iou - jnp.where(c_area > 0, (c_area - union) / (c_area + 1e-9), 0.0)

  # center distance over diagonal of enclosing box (diou/ciou)
  diag = jnp.square(cymax - cymin) + jnp.square(cxmax - cxmin)
  cy1, cx1 = (ymin1 + ymax1) / 2, (xmin1 + xmax1) / 2
  cy2, cx2 = (ymin2 + ymax2) / 2, (xmin2 + xmax2) / 2
  dist = jnp.square(cy1 - cy2) + jnp.square(cx1 - cx2)
  diou = iou - jnp.where(diag > 0, dist / (diag + 1e-9), 0.0)
  if iou_type == "diou":
    return diou

  if iou_type == "ciou":
    h1, w1 = ymax1 - ymin1, xmax1 - xmin1
    h2, w2 = ymax2 - ymin2, xmax2 - xmin2
    v = 4 / (math.pi ** 2) * jnp.square(
        jnp.arctan(w1 / (h1 + 1e-9)) - jnp.arctan(w2 / (h2 + 1e-9)))
    # alpha treated as a constant wrt gradients (ref: iou_utils.py:47-54)
    import jax
    alpha = jax.lax.stop_gradient(v / (1 - iou + v + 1e-9))
    return diou - alpha * v
  raise ValueError(f"Unknown iou type {iou_type!r}")


def iou_loss(pred_boxes, target_boxes, iou_type: str = "iou"):
  """1 - IoU-variant, zeroed where the target box is all-zero padding."""
  loss = 1.0 - iou_value(pred_boxes, target_boxes, iou_type)
  valid = jnp.any(target_boxes != 0, axis=-1)
  return jnp.where(valid, loss, 0.0)
