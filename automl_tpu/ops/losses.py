"""Training losses: focal, huber box loss, detection loss, smoothed xent.

Math parity refs:
  focal_loss        efficientdet/det_model_fn.py:133-169
  _box_loss (huber) efficientdet/det_model_fn.py:172-186
  detection_loss    efficientdet/det_model_fn.py:189-286
  classification    efficientnetv2/main.py:108-124 (softmax/sigmoid + smoothing)

TPU-native difference: targets arrive as flat per-anchor arrays from the
on-device AnchorLabeler ([B, A] / [B, A, 4]); head outputs are flattened and
concatenated in the same anchor order, so per-level loops disappear — the sum
over levels equals one flat masked reduction, which XLA fuses into a couple of
kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from automl_tpu.ops import anchors as anchors_lib
from automl_tpu.ops import iou as iou_lib


def focal_loss(logits, y_true, alpha: float, gamma: float, normalizer,
               label_smoothing: float = 0.0):
  """Per-element sigmoid focal loss / normalizer."""
  logits = logits.astype(jnp.float32)
  y_true = y_true.astype(jnp.float32)
  alpha_factor = y_true * alpha + (1 - y_true) * (1 - alpha)
  pred_prob = jax.nn.sigmoid(logits)
  p_t = y_true * pred_prob + (1 - y_true) * (1 - pred_prob)
  modulating = jnp.power(1.0 - p_t, gamma)
  if label_smoothing:
    y_true = y_true * (1.0 - label_smoothing) + 0.5 * label_smoothing
  ce = jnp.maximum(logits, 0) - logits * y_true + jnp.log1p(
      jnp.exp(-jnp.abs(logits)))
  return alpha_factor * modulating * ce / normalizer


def huber_loss(pred, target, delta: float):
  err = (pred - target).astype(jnp.float32)
  abs_err = jnp.abs(err)
  quad = jnp.minimum(abs_err, delta)
  return 0.5 * quad * quad + delta * (abs_err - quad)


def detection_loss(cls_outputs, box_outputs, cls_targets, box_targets,
                   num_positives, config, anchor_boxes=None, normalizer=None):
  """Total detection loss on flat per-anchor arrays.

  Args:
    cls_outputs: [B, A, num_classes] logits (all levels concatenated).
    box_outputs: [B, A, 4] regression outputs.
    cls_targets: [B, A] int32, class index or -1 for background.
    box_targets: [B, A, 4] encoded targets (0 for negatives).
    num_positives: [B] positives per image.
    config: needs alpha, gamma, delta, box_loss_weight, iou_loss_type,
      iou_loss_weight, label_smoothing, num_classes.
    anchor_boxes: [A, 4], required when iou_loss_type is set.
    normalizer: optional scalar overriding the per-batch positives sum — used
      by the train step's positives-momentum moving average
      (ref: det_model_fn.py:197-221 moving_normalizer_var).

  Returns:
    (total_loss, cls_loss, box_loss, box_iou_loss) scalars (f32).
  """
  # +1 avoids div-by-zero; mean over the global batch is the cross-replica
  # mean under GSPMD (ref: det_model_fn.py:222-230).
  if normalizer is None:
    num_positives_sum = jnp.sum(num_positives.astype(jnp.float32)) + 1.0
  else:
    num_positives_sum = normalizer

  num_classes = config.num_classes
  positive = cls_targets >= 0
  one_hot = jax.nn.one_hot(jnp.maximum(cls_targets, 0), num_classes,
                           dtype=jnp.float32)
  one_hot = one_hot * positive[..., None].astype(jnp.float32)
  cls_loss = focal_loss(cls_outputs, one_hot, config.alpha, config.gamma,
                        num_positives_sum,
                        config.get("label_smoothing", 0.0) or 0.0)
  cls_loss_total = jnp.sum(cls_loss)

  mask = positive[..., None].astype(jnp.float32)
  box_loss_total = jnp.asarray(0.0, jnp.float32)
  if config.get("box_loss_weight"):
    box_loss = huber_loss(box_outputs, box_targets, config.delta) * mask
    box_loss_total = jnp.sum(box_loss) / (num_positives_sum * 4.0)

  box_iou_loss_total = jnp.asarray(0.0, jnp.float32)
  if config.get("iou_loss_type"):
    assert anchor_boxes is not None
    pred_abs = anchors_lib.decode_box_outputs(
        box_outputs.astype(jnp.float32), anchor_boxes)
    tgt_abs = anchors_lib.decode_box_outputs(
        box_targets.astype(jnp.float32), anchor_boxes)
    tgt_abs = jnp.where(mask > 0, tgt_abs, 0.0)
    pred_abs = jnp.where(mask > 0, pred_abs, 0.0)
    box_iou_loss = iou_lib.iou_loss(pred_abs, tgt_abs, config.iou_loss_type)
    box_iou_loss_total = jnp.sum(box_iou_loss) / num_positives_sum

  total = (cls_loss_total
           + config.get("box_loss_weight", 0.0) * box_loss_total
           + config.get("iou_loss_weight", 0.0) * box_iou_loss_total)
  return total, cls_loss_total, box_loss_total, box_iou_loss_total


def cross_entropy(logits, labels_one_hot, label_smoothing: float = 0.0,
                  loss_type: str | None = None):
  """Classification loss: softmax (default) or per-class sigmoid.

  labels can be soft (mixup/cutmix). Returns mean over batch.
  """
  logits = logits.astype(jnp.float32)
  labels = labels_one_hot.astype(jnp.float32)
  if loss_type == "sigmoid":
    if label_smoothing:
      labels = labels * (1 - label_smoothing) + 0.5 * label_smoothing
    per = jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    return jnp.mean(jnp.sum(per, axis=-1))
  num_classes = logits.shape[-1]
  if label_smoothing:
    labels = labels * (1 - label_smoothing) + label_smoothing / num_classes
  logp = jax.nn.log_softmax(logits)
  return -jnp.mean(jnp.sum(labels * logp, axis=-1))


def l2_regularization(params, weight_decay: float, mask_fn=None):
  """Sum of 0.5-less L2 (tf.nn.l2_loss semantics: sum(v^2)/2) over kernels."""
  flat = jax.tree_util.tree_flatten_with_path(params)[0]
  total = 0.0
  for path, leaf in flat:
    names = [str(getattr(k, "key", k)) for k in path]
    if mask_fn is not None and not mask_fn(names):
      continue
    if any(n in ("bias", "beta", "gamma", "moving_mean", "moving_variance")
           for n in names):
      continue
    total = total + jnp.sum(jnp.square(leaf.astype(jnp.float32)))
  return weight_decay * total / 2.0
