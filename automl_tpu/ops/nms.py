"""Fully on-device NMS: hard / gaussian-soft, global / per-class / batched.

The reference runs per-class soft-NMS on host numpy via tf.numpy_function
(efficientdet/nms_np.py, det_model_fn.py:436, tf2/postprocess.py:549) — a
device->host->device round trip per eval step. Here NMS is a fixed-shape
iterative device op: `max_output` rounds of (argmax -> IoU row -> score decay),
a [N]-vector VPU workload per round with no data-dependent shapes, fused by
XLA and vmappable over batch and class.

Semantics parity:
  hard NMS            nms_np.py:89-128 / tf.raw_ops.NonMaxSuppressionV5 sigma=0
  gaussian soft-NMS   nms_np.py:129-193 / NonMaxSuppressionV5 soft_nms_sigma
  per-class           nms_np.py:220-264 (via class-offset trick: boxes of
                      different classes are translated far apart so suppression
                      only acts within a class — decision-equivalent)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = float(jnp.finfo(jnp.float32).min)


def _iou_one_to_many(box, boxes):
  ymin = jnp.maximum(box[0], boxes[:, 0])
  xmin = jnp.maximum(box[1], boxes[:, 1])
  ymax = jnp.minimum(box[2], boxes[:, 2])
  xmax = jnp.minimum(box[3], boxes[:, 3])
  inter = jnp.maximum(ymax - ymin, 0) * jnp.maximum(xmax - xmin, 0)
  area1 = (box[2] - box[0]) * (box[3] - box[1])
  areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
  union = area1 + areas - inter
  return jnp.where(union > 0, inter / union, 0.0)


@functools.partial(jax.jit, static_argnames=("max_output", "sigma", "iou_thresh",
                                             "score_thresh"))
def nms(boxes, scores, max_output: int, iou_thresh: float = 0.5,
        sigma: float = 0.0, score_thresh: float = float("-inf")):
  """Single-image NMS.

  Args:
    boxes: [N, 4] (ymin, xmin, ymax, xmax); padding rows should carry
      score == -inf (they are never selected).
    scores: [N].
    max_output: number of output slots (static).
    iou_thresh: suppression threshold (hard NMS, sigma == 0).
    sigma: gaussian soft-NMS sigma; > 0 enables soft decay exp(-iou^2/sigma).
    score_thresh: selections at or below this are marked invalid.

  Returns:
    (indices [max_output] int32, out_scores [max_output] f32,
     valid [max_output] bool) — invalid slots have score NEG_INF.
  """
  boxes = boxes.astype(jnp.float32)
  scores = scores.astype(jnp.float32)

  def body(i, state):
    live_scores, out_idx, out_scores = state
    best = jnp.argmax(live_scores)
    best_score = live_scores[best]
    out_idx = out_idx.at[i].set(best.astype(jnp.int32))
    out_scores = out_scores.at[i].set(best_score)
    ious = _iou_one_to_many(boxes[best], boxes)
    # TF NonMaxSuppressionV5 semantics (`is_soft_nms || sim <= threshold`):
    # with soft_nms_sigma > 0 the gaussian decay applies to ALL overlaps and
    # nothing is hard-removed; only sigma == 0 hard-suppresses above
    # iou_thresh. The reference passes sigma/2 to TF (postprocess.py:192-193)
    # making TF's exp(-iou^2/(2*sigma_tf)) equal exp(-iou^2/sigma) — which is
    # what we compute directly.
    if sigma > 0:
      live_scores = live_scores * jnp.exp(-jnp.square(ious) / sigma)
    else:
      live_scores = jnp.where(ious > iou_thresh, NEG_INF, live_scores)
    live_scores = live_scores.at[best].set(NEG_INF)
    return live_scores, out_idx, out_scores

  out_idx = jnp.zeros((max_output,), jnp.int32)
  out_scores = jnp.full((max_output,), NEG_INF, jnp.float32)
  _, out_idx, out_scores = jax.lax.fori_loop(
      0, max_output, body, (scores, out_idx, out_scores))
  # Removed/exhausted candidates carry NEG_INF; guard against score_thresh=-inf.
  valid = out_scores > max(score_thresh, NEG_INF * 0.5)
  out_scores = jnp.where(valid, out_scores, NEG_INF)
  return out_idx, out_scores, valid


def per_class_nms(boxes, scores, classes, max_output: int,
                  iou_thresh: float = 0.5, sigma: float = 0.0,
                  score_thresh: float = float("-inf")):
  """Per-class NMS via class-offset translation (suppression within class only).

  Args: boxes [N,4], scores [N], classes [N] int. Returns same contract as nms().
  """
  # Decoded boxes are unclipped and may have negative coordinates: rebase to
  # the full extent so class bands can never overlap.
  lo = jnp.min(boxes)
  span = jnp.maximum(jnp.max(boxes) - lo, 1.0) + 1.0
  offset = classes.astype(jnp.float32)[:, None] * span
  shifted = (boxes - lo) + offset
  return nms(shifted, scores, max_output, iou_thresh, sigma, score_thresh)


def batched_nms(boxes, scores, max_output: int, **kw):
  """vmap over a batch dim: boxes [B,N,4], scores [B,N]."""
  return jax.vmap(lambda b, s: nms(b, s, max_output, **kw))(boxes, scores)
