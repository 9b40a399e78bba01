"""Detection postprocessing, fully on-device: merge levels -> top-k -> decode
-> NMS -> (optionally) scale back to source-image coordinates.

Semantics parity refs:
  merge/topk/pre_nms        efficientdet/tf2/postprocess.py:67-156
  nms method/threshold map  efficientdet/tf2/postprocess.py:159-205
  postprocess_global        efficientdet/tf2/postprocess.py:375-406
  postprocess_per_class     efficientdet/tf2/postprocess.py:409-491
  transform_detections      efficientdet/tf2/postprocess.py:589-601

The reference's per-class path loops classes in host numpy
(nms_np.per_class_nms via tf.numpy_function). Here per-class suppression uses
class-offset translation inside one fixed-shape device NMS — no host round
trip, no data-dependent shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from automl_tpu.ops import anchors as anchors_lib
from automl_tpu.ops import nms as nms_lib

CLASS_OFFSET = 1  # outputs are 1-based classes (ref: postprocess.py:51)

# Fallback pre-NMS candidate cap for the per-anchor-max path when the config
# carries no nms_configs.pre_nms_topk. The configurable default is 5000 —
# the reference's MAX_DETECTION_POINTS (tf2/anchors.py:27, consumed at
# tf2/postprocess.py:82-117) — for eval parity; 2048 is the documented
# serving fast path (capping cuts D0 postprocess 114 -> ~10 ms at b32
# because our fixed-iteration device NMS scans the candidate set every
# round; the reference hands all ~50k anchors to a C++ kernel instead).
PRE_NMS_CANDIDATES = 5000


def nms_params(config) -> dict:
  """Resolve method-dependent NMS defaults.

  hard/gaussian follow the reference's graph path (postprocess.py:178-189);
  linear and diou exist only on its host-numpy path, so their defaults come
  from the nms_np dispatch (nms_np.py:147-150 linear: iou 0.3 / score 0.001;
  nms_np.py:43,211-212 diou: iou 0.5, no score threshold)."""
  nc = config.nms_configs
  method = nc.get("method")
  if method in ("hard", None, ""):
    method = "hard"
    sigma = 0.0
    iou_thresh = nc.get("iou_thresh") or 0.5
    score_thresh = nc.get("score_thresh") or float("-inf")
  elif method == "gaussian":
    sigma = nc.get("sigma") or 0.5
    iou_thresh = 0.5
    score_thresh = nc.get("score_thresh") or 0.001
  elif method == "linear":
    sigma = 0.0
    iou_thresh = nc.get("iou_thresh") or 0.3
    score_thresh = nc.get("score_thresh") or 0.001
  elif method == "diou":
    sigma = 0.0
    iou_thresh = nc.get("iou_thresh") or 0.5
    score_thresh = nc.get("score_thresh") or float("-inf")
  else:
    raise ValueError(f"Invalid nms method {method!r}")
  return dict(method=method, sigma=float(sigma), iou_thresh=float(iou_thresh),
              score_thresh=float(score_thresh),
              max_output_size=int(nc.get("max_output_size") or 100))


def merge_class_box_level_outputs(config, cls_outputs, box_outputs):
  """Per-level [B,H,W,A*c] lists -> flat [B, A_total, num_classes] / [.., 4]."""
  batch = cls_outputs[0].shape[0]
  cls_all = [c.reshape(batch, -1, config.num_classes) for c in cls_outputs]
  box_all = [b.reshape(batch, -1, 4) for b in box_outputs]
  return jnp.concatenate(cls_all, axis=1), jnp.concatenate(box_all, axis=1)


def topk_class_boxes(config, cls_outputs, box_outputs):
  """Pre-NMS candidate selection.

  max_nms_inputs > 0: top-k over flattened (anchor, class) scores — an anchor
  can contribute several classes. Otherwise: per-anchor best class only
  (ref: postprocess.py:82-117).
  """
  batch = cls_outputs.shape[0]
  num_classes = config.num_classes
  max_nms_inputs = config.nms_configs.get("max_nms_inputs", 0)
  if max_nms_inputs > 0:
    flat = cls_outputs.reshape(batch, -1)
    k = min(max_nms_inputs, flat.shape[1])
    scores, idx = jax.lax.top_k(flat, k=k)
    indices = idx // num_classes
    classes = idx % num_classes
    box_topk = jnp.take_along_axis(box_outputs, indices[..., None], axis=1)
    return scores, box_topk, classes, indices
  classes = jnp.argmax(cls_outputs, axis=-1).astype(jnp.int32)
  scores = jnp.max(cls_outputs, axis=-1)
  num_anchors = cls_outputs.shape[1]
  pre_nms_topk = int(config.nms_configs.get("pre_nms_topk")
                     or PRE_NMS_CANDIDATES)
  k = min(pre_nms_topk, num_anchors)
  if k < num_anchors:
    scores, indices = jax.lax.top_k(scores, k)
    classes = jnp.take_along_axis(classes, indices, axis=1)
    box_outputs = jnp.take_along_axis(box_outputs, indices[..., None], axis=1)
  else:
    indices = jnp.broadcast_to(jnp.arange(num_anchors)[None],
                               (batch, num_anchors))
  return scores, box_outputs, classes, indices


def pre_nms(config, cls_outputs, box_outputs, topk: bool = True):
  """-> (boxes [B,N,4] absolute, scores [B,N] sigmoid, classes [B,N])."""
  eval_anchors = anchors_lib.Anchors(
      config.min_level, config.max_level, config.num_scales,
      config.aspect_ratios, config.anchor_scale, config.image_size)
  cls_flat, box_flat = merge_class_box_level_outputs(
      config, cls_outputs, box_outputs)
  if topk:
    cls_sel, box_sel, classes, indices = topk_class_boxes(
        config, cls_flat, box_flat)
    anchor_boxes = eval_anchors.boxes[indices]
  else:
    cls_sel, box_sel = jnp.max(cls_flat, -1), box_flat
    classes = jnp.argmax(cls_flat, -1).astype(jnp.int32)
    anchor_boxes = eval_anchors.boxes[None]
  boxes = anchors_lib.decode_box_outputs(
      box_sel.astype(jnp.float32), anchor_boxes)
  scores = jax.nn.sigmoid(cls_sel.astype(jnp.float32))
  return boxes, scores, classes


def _gather_outputs(boxes, classes, idx, out_scores, valid):
  nms_boxes = boxes[idx]
  nms_classes = (classes[idx] + CLASS_OFFSET).astype(jnp.float32)
  nms_scores = jnp.where(valid, out_scores, 0.0)
  nms_boxes = jnp.where(valid[:, None], nms_boxes, 0.0)
  nms_classes = jnp.where(valid, nms_classes, 0.0)
  return nms_boxes, nms_scores, nms_classes, jnp.sum(valid.astype(jnp.int32))


def clip_boxes(boxes, image_size):
  """Clip [..., 4] ymin/xmin/ymax/xmax boxes into the canvas
  (ref: postprocess.py:61-64, applied at :241/:402 before rescaling)."""
  from automl_tpu.utils import parse_image_size
  h, w = parse_image_size(image_size)
  hi = jnp.asarray([h, w, h, w], boxes.dtype)
  return jnp.clip(boxes, 0.0, hi)


def _nms_one(boxes, scores, classes, p, per_class: bool):
  if per_class:
    idx, out_scores, valid = nms_lib.per_class_nms(
        boxes, scores, classes, p["max_output_size"], p["iou_thresh"],
        p["sigma"], p["score_thresh"], p.get("method"))
  else:
    idx, out_scores, valid = nms_lib.nms(
        boxes, scores, p["max_output_size"], p["iou_thresh"], p["sigma"],
        p["score_thresh"], p.get("method"))
  return _gather_outputs(boxes, classes, idx, out_scores, valid)


def postprocess_global(config, cls_outputs, box_outputs, image_scales=None):
  """Class-agnostic NMS over per-anchor best classes.

  Returns (boxes [B,K,4], scores [B,K], classes [B,K], valid_len [B]).
  """
  boxes, scores, classes = pre_nms(config, cls_outputs, box_outputs)
  p = nms_params(config)
  out = jax.vmap(functools.partial(_nms_one, p=p, per_class=False))(
      boxes, scores, classes)
  nms_boxes, nms_scores, nms_classes, valid_len = out
  nms_boxes = clip_boxes(nms_boxes, config.image_size)
  if image_scales is not None:
    scales = jnp.asarray(image_scales, jnp.float32).reshape(-1, 1, 1)
    nms_boxes = nms_boxes * scales
  return nms_boxes, nms_scores, nms_classes, valid_len


def postprocess_per_class(config, cls_outputs, box_outputs, image_scales=None):
  """Per-class NMS (suppression only within a class) — device-side equivalent
  of the reference's host numpy per_class_nms (nms_np.py:220-264).

  Default path: per-anchor best class + class-offset NMS (one class per
  anchor — fast). Set nms_configs.max_nms_inputs > 0 for exact (anchor,
  class)-pair candidates via a flattened top-k (slower: the top-k runs over
  num_anchors * num_classes scores)."""
  boxes, scores, classes = pre_nms(config, cls_outputs, box_outputs)
  p = nms_params(config)
  out = jax.vmap(functools.partial(_nms_one, p=p, per_class=True))(
      boxes, scores, classes)
  nms_boxes, nms_scores, nms_classes, valid_len = out
  nms_boxes = clip_boxes(nms_boxes, config.image_size)
  if image_scales is not None:
    scales = jnp.asarray(image_scales, jnp.float32).reshape(-1, 1, 1)
    nms_boxes = nms_boxes * scales
  return nms_boxes, nms_scores, nms_classes, valid_len


def postprocess_combined(config, cls_outputs, box_outputs, image_scales=None):
  """Combined-NMS equivalent: per-class hard NMS (ref: postprocess.py:208-245)."""
  import copy
  cfg = copy.deepcopy(config)
  cfg.nms_configs.method = "hard"
  cfg.nms_configs.sigma = 0.0
  return postprocess_per_class(cfg, cls_outputs, box_outputs, image_scales)


def generate_detections(config, cls_outputs, box_outputs, image_scales,
                        image_ids, per_class: bool = True):
  """-> [B, K, 7] rows [image_id, ymin, xmin, ymax, xmax, score, class]
  (ref contract: postprocess.py:530-586 / det_model_fn metric_fn)."""
  fn = postprocess_per_class if per_class else postprocess_global
  boxes, scores, classes, valid_len = fn(
      config, cls_outputs, box_outputs, image_scales)
  batch, k = scores.shape
  img_ids = jnp.asarray(image_ids, jnp.float32).reshape(batch, 1, 1)
  img_ids = jnp.broadcast_to(img_ids, (batch, k, 1))
  dets = jnp.concatenate([
      img_ids,
      boxes,
      scores[..., None],
      classes[..., None],
  ], axis=-1)
  return dets, valid_len


def transform_detections(detections):
  """[id, ymin, xmin, ymax, xmax, score, class] ->
     [id, x, y, w, h, score, class] (COCO box format, ref: postprocess.py:589)."""
  return jnp.stack([
      detections[..., 0],
      detections[..., 2],
      detections[..., 1],
      detections[..., 4] - detections[..., 2],
      detections[..., 3] - detections[..., 1],
      detections[..., 5],
      detections[..., 6],
  ], axis=-1)
