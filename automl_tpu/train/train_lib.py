"""Train steps: one jitted function per task containing model fwd/bwd, loss,
clipping, optimizer, EMA, and BN-statistics update — nothing leaves the device.

Parity refs:
  classification step  efficientnetv2/main.py:52-315, main_tf2.py:60-117
    (xent + label smoothing + explicit L2 with exclude regex, EMA)
  detection step       efficientdet/det_model_fn.py:300-427, tf2/train_lib.py:493-732
    (focal+huber+optional IoU loss, per-var+global grad clip, EMA, l2 loss)

The reference splits this across TPUEstimator model_fns and Keras custom
train_steps; here both are pure (state, batch, rng) -> (state, metrics)
functions that jit/shard over any mesh.
"""

from __future__ import annotations

import re
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from automl_tpu import nn
from automl_tpu.models.efficientdet import flatten_predictions
from automl_tpu.ops import anchors as anchors_lib
from automl_tpu.ops import losses as losses_lib
from automl_tpu.train import optimizers as opt_lib


class TrainState(NamedTuple):
  step: jnp.ndarray
  params: Any
  opt_state: Any
  ema_params: Optional[Any] = None
  # Moving average of the focal-loss positives normalizer; active when
  # config.positives_momentum > 0 (ref: det_model_fn.py:197-221).
  normalizer: Optional[jnp.ndarray] = None


def create_train_state(params, tx, ema: bool = True,
                       moving_normalizer: bool = False) -> TrainState:
  return TrainState(
      step=jnp.zeros((), jnp.int32),
      params=params,
      opt_state=tx.init(params),
      ema_params=opt_lib.ema_init(params) if ema else None,
      normalizer=jnp.ones((), jnp.float32) if moving_normalizer else None,
  )


def _merge_state_updates(params, updates):
  """Merge collector updates; paths start at the model's name scope."""
  stripped = {path[1:]: v for path, v in updates.items()}
  return nn.apply_state_updates(params, stripped)


def _l2_mask_fn(exclude_regex):
  if not exclude_regex:
    return None
  pat = re.compile(exclude_regex)
  return lambda names: not pat.match("/".join(names))


# ---------------------------------------------------------------------------
# Classification.
# ---------------------------------------------------------------------------


def make_cls_train_step(model, tx, config, preprocess_fn=None):
  """-> train_step(state, batch{'image','label'}, rng) -> (state, metrics).

  preprocess_fn(batch, rng) -> batch runs INSIDE the jitted step (device-side
  crop/flip/RandAugment/mixup from data/preprocessing.py), so raw uint8
  canvases stream straight from the host loader.
  """
  train_cfg = config.train
  label_smoothing = train_cfg.label_smoothing
  loss_type = train_cfg.get("loss_type")
  weight_decay = train_cfg.weight_decay
  l2_mask = _l2_mask_fn(train_cfg.get("weight_decay_exclude"))
  ema_decay = train_cfg.get("ema_decay", 0.0)
  gclip = train_cfg.get("gclip", 0.0)

  def train_step(state: TrainState, batch, rng):
    step_rng = jax.random.fold_in(rng, state.step)
    if preprocess_fn is not None:
      batch = preprocess_fn(batch, jax.random.fold_in(step_rng, 1))

    def loss_fn(params):
      with nn.rng_scope(step_rng):
        logits, bn_updates = nn.run_and_collect_state(
            lambda: model(params, batch["image"], train=True))
      xent = losses_lib.cross_entropy(logits, batch["label"],
                                      label_smoothing, loss_type)
      l2 = losses_lib.l2_regularization(params, weight_decay, l2_mask)
      return xent + l2, (logits, bn_updates, xent, l2)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    (loss, (logits, bn_updates, xent, l2)), grads = grad_fn(state.params)
    if gclip:
      grads = opt_lib.clip_gradients(grads, gclip, per_var=False)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    params = _merge_state_updates(params, bn_updates)
    ema_params = state.ema_params
    if ema_params is not None and ema_decay:
      ema_params = opt_lib.ema_update(ema_params, params, ema_decay, state.step)
    metrics = {
        "loss": loss, "xent": xent, "l2": l2,
        "gnorm": optax.global_norm(grads),
        "top1": jnp.mean((jnp.argmax(logits, -1)
                          == jnp.argmax(batch["label"], -1)).astype(jnp.float32)),
    }
    return TrainState(state.step + 1, params, opt_state, ema_params,
                      state.normalizer), metrics

  return train_step


def make_cls_eval_step(model):
  def eval_step(params, batch):
    logits = model(params, batch["image"], train=False)
    labels = jnp.argmax(batch["label"], -1)
    top1 = (jnp.argmax(logits, -1) == labels).astype(jnp.float32)
    top5 = jnp.any(
        jax.lax.top_k(logits, 5)[1] == labels[:, None], axis=-1
    ).astype(jnp.float32)
    return {"top1_sum": jnp.sum(top1), "top5_sum": jnp.sum(top5),
            "count": jnp.asarray(top1.shape[0], jnp.float32)}
  return eval_step


def make_seg_train_step(model, tx, config):
  """-> train_step(state, batch{'image','mask'}, rng) -> (state, metrics).

  Semantic-segmentation training for EfficientDet with heads=['segmentation']
  (the reference's demo trainer, efficientdet/tf2/segmentation.py:75-91:
  sparse categorical xent from logits + pixel accuracy). batch['mask'] is
  [B, Hm, Wm] int32 class ids at the head's output resolution; ids < 0 are
  ignored (void pixels)."""
  weight_decay = config.get("weight_decay", 0.0) or 0.0
  l2_mask = _l2_mask_fn(config.get("weight_decay_exclude"))
  gclip = config.get("gradient_clip_norm", 0.0) or 0.0
  ema_decay = config.get("moving_average_decay", 0.0) or 0.0

  def train_step(state: TrainState, batch, rng):
    step_rng = jax.random.fold_in(rng, state.step)
    mask = batch["mask"].astype(jnp.int32)

    def loss_fn(params):
      with nn.rng_scope(step_rng):
        outputs, bn_updates = nn.run_and_collect_state(
            lambda: model(params, batch["image"], train=True))
      # segmentation is the last head output (a bare tensor when it is
      # the only head)
      seg_logits = (outputs[-1] if isinstance(outputs, (tuple, list))
                    else outputs)
      logp = jax.nn.log_softmax(seg_logits.astype(jnp.float32))
      valid = (mask >= 0).astype(jnp.float32)
      safe = jnp.maximum(mask, 0)
      nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
      xent = jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1.0)
      l2 = losses_lib.l2_regularization(params, weight_decay, l2_mask)
      return xent + l2, (seg_logits, bn_updates, xent, l2, valid)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    (loss, (seg_logits, bn_updates, xent, l2, valid)), grads = grad_fn(
        state.params)
    if gclip:
      grads = opt_lib.clip_gradients(grads, gclip, per_var=False)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    params = _merge_state_updates(params, bn_updates)
    ema_params = state.ema_params
    if ema_params is not None and ema_decay:
      ema_params = opt_lib.ema_update(ema_params, params, ema_decay,
                                      state.step)
    correct = (jnp.argmax(seg_logits, -1) == batch["mask"]).astype(
        jnp.float32) * valid
    metrics = {
        "loss": loss, "xent": xent, "l2": l2,
        "gnorm": optax.global_norm(grads),
        "pixel_acc": jnp.sum(correct) / jnp.maximum(jnp.sum(valid), 1.0),
    }
    return TrainState(state.step + 1, params, opt_state, ema_params,
                      state.normalizer), metrics

  return train_step


# ---------------------------------------------------------------------------
# Detection.
# ---------------------------------------------------------------------------


def make_det_train_step(model, tx, config, preprocess_fn=None):
  """-> train_step(state, batch, rng) -> (state, metrics).

  batch: {'image': [B,H,W,3], 'gt_boxes': [B,G,4], 'gt_classes': [B,G]}.
  Anchor labeling runs inside the step, on device, fused into the same XLA
  program as fwd/bwd (the reference labels on host CPU: dataloader.py:336).
  """
  anchors = anchors_lib.Anchors(
      config.min_level, config.max_level, config.num_scales,
      config.aspect_ratios, config.anchor_scale, config.image_size)
  labeler = anchors_lib.AnchorLabeler(anchors)
  num_classes = config.num_classes
  weight_decay = config.weight_decay
  clip_norm = config.get("clip_gradients_norm", 0.0)
  ema_decay = config.get("moving_average_decay", 0.0)
  freeze_pat = (re.compile(config.var_freeze_expr)
                if config.get("var_freeze_expr") else None)
  pos_momentum = config.get("positives_momentum", 0.0) or 0.0
  adv_mult = config.get("adv_multiplier", 0.0) or 0.0
  adv_step = config.get("adv_step_size", 0.01)

  def train_step(state: TrainState, batch, rng):
    step_rng = jax.random.fold_in(rng, state.step)
    if preprocess_fn is not None:
      batch = preprocess_fn(batch, jax.random.fold_in(step_rng, 1))
    cls_t, box_t, num_pos = labeler.label_anchors(
        batch["gt_boxes"], batch["gt_classes"])

    # Global-batch positives sum (== cross-replica mean under GSPMD), with an
    # optional momentum-smoothed moving normalizer (det_model_fn.py:197-221).
    num_pos_sum = jnp.sum(num_pos.astype(jnp.float32)) + 1.0
    moving_normalizer = state.normalizer
    if pos_momentum > 0:
      if moving_normalizer is None:
        raise ValueError(
            "positives_momentum > 0 needs create_train_state("
            "moving_normalizer=True)")
      moving_normalizer = (pos_momentum * moving_normalizer
                           + (1.0 - pos_momentum) * num_pos_sum)
      normalizer = moving_normalizer
    else:
      normalizer = num_pos_sum

    def det_loss_on(params, images, rng):
      """Detection loss (+aux) on a given image batch."""
      with nn.rng_scope(rng):
        (cls_outputs, box_outputs), bn_updates = nn.run_and_collect_state(
            lambda: model(params, images, train=True))
      cls_flat = flatten_predictions(cls_outputs, num_classes)
      box_flat = flatten_predictions(box_outputs, 4)
      det_loss, cls_loss, box_loss, iou_loss = losses_lib.detection_loss(
          cls_flat, box_flat, cls_t, box_t, num_pos, config,
          anchor_boxes=anchors.boxes, normalizer=normalizer)
      return det_loss, (bn_updates, cls_loss, box_loss, iou_loss)

    def loss_fn(params):
      det_loss, (bn_updates, cls_loss, box_loss, iou_loss) = det_loss_on(
          params, batch["image"], step_rng)
      if adv_mult > 0:
        # FGSM neighbor loss, fully on-device (working analog of the
        # reference's unwired nsl AdversarialLoss, tf2/train_lib.py:328-354):
        # perturb along sign(d loss / d image), re-evaluate, mix in.
        # stop_gradient: standard adversarial training differentiates only
        # the direct params path, not through the attack itself.
        img_grad = jax.grad(
            lambda im: det_loss_on(params, im, step_rng)[0])(batch["image"])
        adv_images = jax.lax.stop_gradient(
            batch["image"] + adv_step * jnp.sign(img_grad))
        adv_loss, _ = det_loss_on(params, adv_images,
                                  jax.random.fold_in(step_rng, 2))
        det_loss = det_loss + adv_mult * adv_loss
      l2 = losses_lib.l2_regularization(params, weight_decay)
      total = det_loss + l2
      return total, (bn_updates, det_loss, cls_loss, box_loss, iou_loss, l2)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    (loss, aux), grads = grad_fn(state.params)
    bn_updates, det_loss, cls_loss, box_loss, iou_loss, l2 = aux
    if freeze_pat is not None:
      grads = _freeze_grads(grads, freeze_pat)
    grads = opt_lib.clip_gradients(grads, clip_norm, per_var=True)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    params = _merge_state_updates(params, bn_updates)
    ema_params = state.ema_params
    if ema_params is not None and ema_decay:
      ema_params = opt_lib.ema_update(ema_params, params, ema_decay, state.step)
    metrics = {
        "loss": loss, "det_loss": det_loss, "cls_loss": cls_loss,
        "box_loss": box_loss, "box_iou_loss": iou_loss, "l2": l2,
        "gnorm": optax.global_norm(grads),
        "num_positives": jnp.mean(num_pos),
    }
    return TrainState(state.step + 1, params, opt_state, ema_params,
                      moving_normalizer), metrics

  return train_step


def _freeze_grads(grads, pattern):
  """Zero grads whose path matches var_freeze_expr (ref: efficientdet_arch.py:36)."""
  flat = jax.tree_util.tree_flatten_with_path(grads)
  out = []
  for path, g in flat[0]:
    name = "/".join(str(getattr(k, "key", k)) for k in path)
    out.append(jnp.zeros_like(g) if pattern.match(name) else g)
  return jax.tree_util.tree_unflatten(
      jax.tree_util.tree_structure(grads), out)
