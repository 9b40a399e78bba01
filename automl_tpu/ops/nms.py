"""Fully on-device NMS: hard / gaussian / linear / diou, global / per-class.

The reference runs per-class soft-NMS on host numpy via tf.numpy_function
(efficientdet/nms_np.py, det_model_fn.py:436, tf2/postprocess.py:549) — a
device->host->device round trip per eval step. Here NMS is a fixed-shape
iterative device op: `max_output` rounds of (argmax -> IoU row -> score decay),
a [N]-vector VPU workload per round with no data-dependent shapes, fused by
XLA and vmappable over batch and class.

Semantics parity:
  hard NMS            nms_np.py:89-128 / tf.raw_ops.NonMaxSuppressionV5 sigma=0
  gaussian soft-NMS   nms_np.py:129-193 / NonMaxSuppressionV5 soft_nms_sigma
  linear soft-NMS     nms_np.py:178-180 (decay 1-iou above iou_thresh; decayed
                      candidates below score_thresh are permanently removed,
                      nms_np.py:187-189). numpy-path only in the reference
                      (tf2/postprocess.py:189 raises), so we match nms_np's
                      +1-pixel IoU convention exactly.
  diou NMS            nms_np.py:28-86 (hard suppression on
                      iou - center_dist^2 / enclosing_diag^2; +1-pixel areas).
  per-class           nms_np.py:220-264 (via class-offset trick: boxes of
                      different classes are translated far apart so suppression
                      only acts within a class — decision-equivalent; for diou
                      the cross-class diou is <= 0 so it never suppresses
                      across the band gap either)
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


def _iou_plus_one(box, boxes):
  """IoU with nms_np's +1-pixel inclusive-coordinate areas (nms_np.py:50,65-68).

  Axis order doesn't matter (symmetric), so this serves the reference's
  [x1,y1,x2,y2] math on our [ymin,xmin,ymax,xmax] boxes unchanged.
  """
  ymin = jnp.maximum(box[0], boxes[:, 0])
  xmin = jnp.maximum(box[1], boxes[:, 1])
  ymax = jnp.minimum(box[2], boxes[:, 2])
  xmax = jnp.minimum(box[3], boxes[:, 3])
  inter = (jnp.maximum(ymax - ymin + 1.0, 0)
           * jnp.maximum(xmax - xmin + 1.0, 0))
  area1 = (box[2] - box[0] + 1.0) * (box[3] - box[1] + 1.0)
  areas = ((boxes[:, 2] - boxes[:, 0] + 1.0)
           * (boxes[:, 3] - boxes[:, 1] + 1.0))
  return inter / (area1 + areas - inter)


@functools.partial(jax.jit, static_argnames=("max_output", "sigma", "iou_thresh",
                                             "score_thresh", "method"))
def nms(boxes, scores, max_output: int, iou_thresh: float = 0.5,
        sigma: float = 0.0, score_thresh: float = float("-inf"),
        method: str | None = None):
  """Single-image NMS.

  Args:
    boxes: [N, 4] (ymin, xmin, ymax, xmax); padding rows should carry
      score == -inf (they are never selected).
    scores: [N].
    max_output: number of output slots (static).
    iou_thresh: suppression threshold (hard/linear/diou methods).
    sigma: gaussian soft-NMS sigma; > 0 enables soft decay exp(-iou^2/sigma).
    score_thresh: selections at or below this are marked invalid; for the
      soft methods (gaussian/linear) decayed candidates strictly below it are
      also permanently removed (nms_np.py:187-189).
    method: 'hard' | 'gaussian' | 'linear' | 'diou'. None keeps the legacy
      sigma-based dispatch (sigma > 0 -> gaussian, else hard).

  Returns:
    (indices [max_output] int32, out_scores [max_output] f32,
     valid [max_output] bool) — invalid slots have score NEG_INF.
  """
  if method is None:
    method = "gaussian" if sigma > 0 else "hard"
  if method not in ("hard", "gaussian", "linear", "diou"):
    raise ValueError(f"Unknown NMS method: {method!r}")
  boxes = boxes.astype(jnp.float32)
  scores = scores.astype(jnp.float32)

  def body(i, state):
    live_scores, out_idx, out_scores = state
    best = jnp.argmax(live_scores)
    best_score = live_scores[best]
    out_idx = out_idx.at[i].set(best.astype(jnp.int32))
    out_scores = out_scores.at[i].set(best_score)
    # TF NonMaxSuppressionV5 semantics (`is_soft_nms || sim <= threshold`):
    # with soft_nms_sigma > 0 the gaussian decay applies to ALL overlaps and
    # nothing is hard-removed; only sigma == 0 hard-suppresses above
    # iou_thresh. The reference passes sigma/2 to TF (postprocess.py:192-193)
    # making TF's exp(-iou^2/(2*sigma_tf)) equal exp(-iou^2/sigma) — which is
    # what we compute directly.
    if method == "gaussian":
      ious = _iou_one_to_many(boxes[best], boxes)
      live_scores = live_scores * jnp.exp(-jnp.square(ious) / sigma)
    elif method == "linear":
      # nms_np.py:178-180: decay (1 - iou) only above iou_thresh; removed
      # candidates (score < score_thresh after decay) never come back.
      ious = _iou_plus_one(boxes[best], boxes)
      decay = jnp.where(ious > iou_thresh, 1.0 - ious, 1.0)
      # guard: NEG_INF * 0 (dead candidate, iou == 1) would be NaN
      live_scores = jnp.where(jnp.isfinite(live_scores),
                              live_scores * decay, live_scores)
      live_scores = jnp.where(live_scores < score_thresh, NEG_INF, live_scores)
    elif method == "diou":
      # nms_np.py:53-84: suppress where iou - d^2/c^2 > iou_thresh, with the
      # center distance d and enclosing-box diagonal c (+1e-10 stabilizer).
      ious = _iou_plus_one(boxes[best], boxes)
      cy = (boxes[:, 0] + boxes[:, 2]) * 0.5
      cx = (boxes[:, 1] + boxes[:, 3]) * 0.5
      enc_h = (jnp.maximum(boxes[best, 2], boxes[:, 2])
               - jnp.minimum(boxes[best, 0], boxes[:, 0]))
      enc_w = (jnp.maximum(boxes[best, 3], boxes[:, 3])
               - jnp.minimum(boxes[best, 1], boxes[:, 1]))
      diag_sq = enc_h ** 2 + enc_w ** 2
      dist_sq = (cy - cy[best]) ** 2 + (cx - cx[best]) ** 2
      diou = ious - dist_sq / (diag_sq + 1e-10)
      live_scores = jnp.where(diou > iou_thresh, NEG_INF, live_scores)
    else:  # hard
      ious = _iou_one_to_many(boxes[best], boxes)
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
                  score_thresh: float = float("-inf"),
                  method: str | None = None):
  """Per-class NMS via class-offset translation (suppression within class only).

  Args: boxes [N,4], scores [N], classes [N] int. Returns same contract as nms().
  """
  # Decoded boxes are unclipped and may have negative coordinates: rebase to
  # the full extent so class bands can never overlap.
  lo = jnp.min(boxes)
  span = jnp.maximum(jnp.max(boxes) - lo, 1.0) + 1.0
  offset = classes.astype(jnp.float32)[:, None] * span
  shifted = (boxes - lo) + offset
  return nms(shifted, scores, max_output, iou_thresh, sigma, score_thresh,
             method)


def batched_nms(boxes, scores, max_output: int, **kw):
  """vmap over a batch dim: boxes [B,N,4], scores [B,N]."""
  return jax.vmap(lambda b, s: nms(b, s, max_output, **kw))(boxes, scores)
