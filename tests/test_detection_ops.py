"""Detection ops tests: anchors, labeler, NMS (vs numpy NMSv5 reference),
losses, postprocess."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from automl_tpu.config import Config
from automl_tpu.ops import anchors as anchors_lib
from automl_tpu.ops import iou as iou_lib
from automl_tpu.ops import losses as losses_lib
from automl_tpu.ops import nms as nms_lib
from automl_tpu.ops import postprocess


# --- anchors -----------------------------------------------------------------


def test_anchor_count_and_geometry():
  a = anchors_lib.Anchors(3, 7, 3, [1.0, 2.0, 0.5], 4.0, 512)
  # sum over levels of H*W*9 for 512 input: (64^2+32^2+16^2+8^2+4^2)*9
  assert a.boxes.shape == (49104, 4)
  assert a.get_anchors_per_location() == 9
  assert a.counts_per_level() == [64 * 64 * 9, 32 * 32 * 9, 16 * 16 * 9,
                                  8 * 8 * 9, 4 * 4 * 9]
  # first anchor: level 3, stride 8, octave 0, aspect 1.0, center (4, 4),
  # size anchor_scale*stride = 32 -> [4-16, 4-16, 4+16, 4+16]
  np.testing.assert_allclose(np.asarray(a.boxes[0]), [-12, -12, 20, 20], atol=1e-5)


def test_box_encode_decode_roundtrip():
  a = anchors_lib.Anchors(3, 7, 3, [1.0, 2.0, 0.5], 4.0, 128)
  gt = jnp.array([[10.0, 20.0, 50.0, 90.0], [0.0, 0.0, 30.0, 30.0]])
  anchor_boxes = a.boxes[:2]
  enc = anchors_lib.encode_boxes(gt, anchor_boxes)
  dec = anchors_lib.decode_box_outputs(enc, anchor_boxes)
  np.testing.assert_allclose(np.asarray(dec), np.asarray(gt), atol=1e-3)


def test_labeler_matches_and_force_match():
  a = anchors_lib.Anchors(3, 7, 3, [1.0, 2.0, 0.5], 4.0, 128)
  labeler = anchors_lib.AnchorLabeler(a)
  # one gt box exactly equal to anchor 0's geometry (IoU 1), one padding row
  box0 = np.asarray(a.boxes[0])
  gt_boxes = jnp.array([[[box0[0], box0[1], box0[2], box0[3]],
                         [0, 0, 0, 0]]], jnp.float32)
  gt_classes = jnp.array([[3, -1]], jnp.int32)
  cls_t, box_t, num_pos = labeler.label_anchors(gt_boxes, gt_classes)
  assert cls_t.shape == (1, a.boxes.shape[0])
  assert int(cls_t[0, 0]) == 2  # class 3 -> 3 - 1
  assert float(num_pos[0]) >= 1
  # box target for the exact-match anchor is ~0
  np.testing.assert_allclose(np.asarray(box_t[0, 0]), np.zeros(4), atol=1e-4)
  # background anchors are -1
  assert int(cls_t[0, -1]) == -1


def test_labeler_force_match_below_threshold():
  a = anchors_lib.Anchors(3, 3, 1, [1.0], 1.0, 64)  # stride 8, 8x8 grid
  labeler = anchors_lib.AnchorLabeler(a, match_threshold=0.5)
  # a tiny gt box: IoU with every anchor < 0.5, still must be force-matched
  gt_boxes = jnp.array([[[2.0, 2.0, 5.0, 5.0]]])
  gt_classes = jnp.array([[7]], jnp.int32)
  cls_t, _, num_pos = labeler.label_anchors(gt_boxes, gt_classes)
  assert float(num_pos[0]) == 1.0
  assert int(jnp.max(cls_t)) == 6  # 7 - 1


# --- numpy NMSv5 reference -----------------------------------------------------


def np_nmsv5(boxes, scores, max_out, iou_thresh, sigma, score_thresh):
  """Straightforward NMSv5 (TF semantics) in numpy."""
  boxes = boxes.copy().astype(np.float64)
  scores = scores.copy().astype(np.float64)
  sel, sel_scores = [], []
  for _ in range(max_out):
    best = int(np.argmax(scores))
    if scores[best] <= score_thresh:
      break
    sel.append(best)
    sel_scores.append(scores[best])
    b = boxes[best]
    ymin = np.maximum(b[0], boxes[:, 0]); xmin = np.maximum(b[1], boxes[:, 1])
    ymax = np.minimum(b[2], boxes[:, 2]); xmax = np.minimum(b[3], boxes[:, 3])
    inter = np.maximum(ymax - ymin, 0) * np.maximum(xmax - xmin, 0)
    a1 = (b[2] - b[0]) * (b[3] - b[1])
    a2 = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    iou = np.where(a1 + a2 - inter > 0, inter / (a1 + a2 - inter), 0)
    # TF kernel: `is_soft_nms || sim <= threshold ? weight : 0` — soft mode
    # decays ALL overlaps and never hard-removes; hard mode removes > thresh.
    if sigma > 0:
      scores = scores * np.exp(-iou ** 2 / sigma)
    else:
      scores = np.where(iou > iou_thresh, -np.inf, scores)
    scores[best] = -np.inf
  return sel, sel_scores


def _random_boxes(key, n):
  k1, k2 = jax.random.split(jax.random.key(key))
  yx = jax.random.uniform(k1, (n, 2)) * 80
  hw = jax.random.uniform(k2, (n, 2)) * 40 + 5
  return jnp.concatenate([yx, yx + hw], axis=-1)


@pytest.mark.parametrize("sigma,iou_thresh,score_thresh", [
    (0.0, 0.5, float("-inf")),   # hard
    (0.5, 0.5, 0.001),           # gaussian (reference defaults)
])
def test_nms_matches_numpy_reference(sigma, iou_thresh, score_thresh):
  n, max_out = 64, 10
  boxes = _random_boxes(0, n)
  scores = jax.random.uniform(jax.random.key(1), (n,))
  idx, out_scores, valid = nms_lib.nms(
      boxes, scores, max_out, iou_thresh, sigma, score_thresh)
  ref_idx, ref_scores = np_nmsv5(np.asarray(boxes), np.asarray(scores),
                                 max_out, iou_thresh, sigma, score_thresh)
  got_valid = int(jnp.sum(valid))
  assert got_valid == len(ref_idx)
  np.testing.assert_array_equal(np.asarray(idx)[:got_valid], ref_idx)
  np.testing.assert_allclose(np.asarray(out_scores)[:got_valid], ref_scores,
                             rtol=1e-5)


@pytest.mark.parametrize("sigma,iou_thresh,score_thresh", [
    (0.0, 0.5, float("-inf")),   # hard
    (0.5, 0.5, 0.001),           # gaussian (reference defaults)
    (0.5, 0.3, 0.0),
])
def test_nms_matches_tf_nmsv5_kernel(sigma, iou_thresh, score_thresh):
  """Definitive oracle: TF's actual NonMaxSuppressionV5 C++ kernel.

  Convention: our sigma equals 2*soft_nms_sigma_tf (the reference passes
  sigma/2, efficientdet/tf2/postprocess.py:192-193)."""
  tf = pytest.importorskip("tensorflow")
  n, max_out = 64, 12
  boxes = _random_boxes(3, n)
  scores = jax.random.uniform(jax.random.key(4), (n,))
  idx, out_scores, valid = nms_lib.nms(
      boxes, scores, max_out, iou_thresh, sigma, score_thresh)
  sel, sel_scores, n_valid = tf.raw_ops.NonMaxSuppressionV5(
      boxes=np.asarray(boxes), scores=np.asarray(scores),
      max_output_size=max_out, iou_threshold=iou_thresh,
      score_threshold=score_thresh if np.isfinite(score_thresh) else -1e38,
      soft_nms_sigma=sigma / 2.0, pad_to_max_output_size=False)
  n_valid = int(n_valid)
  assert int(jnp.sum(valid)) == n_valid
  np.testing.assert_array_equal(np.asarray(idx)[:n_valid],
                                np.asarray(sel)[:n_valid])
  np.testing.assert_allclose(np.asarray(out_scores)[:n_valid],
                             np.asarray(sel_scores)[:n_valid], rtol=1e-4)


def test_per_class_nms_negative_coords_no_cross_class_suppression():
  # Regression (ADVICE r1): decoded boxes can be negative; the class-offset
  # span must rebase by the min so adjacent class bands never intersect.
  boxes = jnp.array([[-50.0, -50.0, -40.0, -40.0],   # class 1, negative coords
                     [10.0, 10.0, 20.0, 20.0]], jnp.float32)  # class 0
  scores = jnp.array([0.9, 0.8])
  classes = jnp.array([1, 0])
  _, out_scores, valid = nms_lib.per_class_nms(boxes, scores, classes, 2,
                                               iou_thresh=0.5)
  assert int(jnp.sum(valid)) == 2, (out_scores, valid)


def test_per_class_nms_keeps_overlapping_other_class():
  # two identical boxes, different classes: per-class keeps both
  boxes = jnp.array([[0, 0, 10, 10], [0, 0, 10, 10]], jnp.float32)
  scores = jnp.array([0.9, 0.8])
  classes = jnp.array([0, 1])
  _, out_scores, valid = nms_lib.per_class_nms(boxes, scores, classes, 2,
                                               iou_thresh=0.5)
  assert int(jnp.sum(valid)) == 2
  # same class: suppressed to one
  _, _, valid2 = nms_lib.nms(boxes, scores, 2, iou_thresh=0.5)
  assert int(jnp.sum(valid2)) == 1


# --- linear soft-NMS / DIoU-NMS vs numpy transcriptions of nms_np --------------
#
# linear and diou exist only on the reference's host-numpy path
# (efficientdet/nms_np.py:129-193 soft_nms 'linear', :28-86 diou_nms; the
# graph path raises, tf2/postprocess.py:189). The oracles below are fresh
# transcriptions of those semantics, including the +1-pixel inclusive
# coordinate convention nms_np uses for areas.


def _np_iou_plus_one(b, boxes):
  yy1 = np.maximum(b[0], boxes[:, 0]); xx1 = np.maximum(b[1], boxes[:, 1])
  yy2 = np.minimum(b[2], boxes[:, 2]); xx2 = np.minimum(b[3], boxes[:, 3])
  inter = np.maximum(yy2 - yy1 + 1, 0.0) * np.maximum(xx2 - xx1 + 1, 0.0)
  a1 = (b[2] - b[0] + 1) * (b[3] - b[1] + 1)
  a2 = (boxes[:, 2] - boxes[:, 0] + 1) * (boxes[:, 3] - boxes[:, 1] + 1)
  return inter / (a1 + a2 - inter)


def np_linear_soft_nms(boxes, scores, iou_thresh, score_thresh):
  """nms_np.soft_nms with method='linear' (nms_np.py:129-193), returning
  (original indices, scores) in selection order."""
  boxes = boxes.astype(np.float64).copy()
  scores = scores.astype(np.float64).copy()
  idx = np.arange(len(scores))
  sel, sel_scores = [], []
  while len(scores):
    best = int(np.argmax(scores))
    sel.append(int(idx[best])); sel_scores.append(scores[best])
    iou = _np_iou_plus_one(boxes[best], boxes)
    weight = np.ones_like(iou)
    weight[iou > iou_thresh] -= iou[iou > iou_thresh]
    scores = scores * weight
    keep = np.ones(len(scores), bool)
    keep[best] = False
    keep &= scores >= score_thresh
    boxes, scores, idx = boxes[keep], scores[keep], idx[keep]
  return sel, sel_scores


def np_diou_nms(boxes, scores, iou_thresh):
  """nms_np.diou_nms (nms_np.py:28-86): hard suppression on
  iou - center_dist^2 / enclosing_diag^2, score-descending order."""
  boxes = boxes.astype(np.float64)
  order = np.argsort(-scores)
  cy = (boxes[:, 0] + boxes[:, 2]) / 2
  cx = (boxes[:, 1] + boxes[:, 3]) / 2
  keep = []
  while order.size:
    i = order[0]
    keep.append(int(i))
    rest = order[1:]
    iou = _np_iou_plus_one(boxes[i], boxes[rest])
    enc_h = np.maximum(boxes[i, 2], boxes[rest, 2]) - np.minimum(
        boxes[i, 0], boxes[rest, 0])
    enc_w = np.maximum(boxes[i, 3], boxes[rest, 3]) - np.minimum(
        boxes[i, 1], boxes[rest, 1])
    diou = iou - ((cy[i] - cy[rest]) ** 2 + (cx[i] - cx[rest]) ** 2) / (
        enc_h ** 2 + enc_w ** 2 + 1e-10)
    order = rest[diou <= iou_thresh]
  return keep


@pytest.mark.parametrize("iou_thresh,score_thresh", [
    (0.3, 0.001),   # nms_np dispatch defaults for linear (nms_np.py:149-150)
    (0.5, 0.05),
])
def test_linear_soft_nms_matches_nms_np(iou_thresh, score_thresh):
  n, max_out = 64, 12
  boxes = _random_boxes(7, n)
  scores = jax.random.uniform(jax.random.key(8), (n,)) * 0.9 + 0.05
  idx, out_scores, valid = nms_lib.nms(
      boxes, scores, max_out, iou_thresh, 0.0, score_thresh, method="linear")
  ref_idx, ref_scores = np_linear_soft_nms(
      np.asarray(boxes), np.asarray(scores), iou_thresh, score_thresh)
  k = min(len(ref_idx), max_out)
  got_valid = int(jnp.sum(valid))
  assert got_valid == k, (got_valid, k)
  np.testing.assert_array_equal(np.asarray(idx)[:k], ref_idx[:k])
  np.testing.assert_allclose(np.asarray(out_scores)[:k], ref_scores[:k],
                             rtol=1e-4)


@pytest.mark.parametrize("iou_thresh", [0.5, 0.3])
def test_diou_nms_matches_nms_np(iou_thresh):
  n, max_out = 64, 16
  boxes = _random_boxes(11, n)
  scores = jax.random.uniform(jax.random.key(12), (n,))
  idx, out_scores, valid = nms_lib.nms(
      boxes, scores, max_out, iou_thresh, 0.0, method="diou")
  ref_idx = np_diou_nms(np.asarray(boxes), np.asarray(scores), iou_thresh)
  k = min(len(ref_idx), max_out)
  got_valid = int(jnp.sum(valid))
  assert got_valid == k, (got_valid, k)
  np.testing.assert_array_equal(np.asarray(idx)[:k], ref_idx[:k])
  # diou is hard suppression: selected scores are the original scores
  np.testing.assert_allclose(np.asarray(out_scores)[:k],
                             np.asarray(scores)[ref_idx[:k]], rtol=1e-5)


def test_per_class_nms_diou_linear_no_cross_class_suppression():
  # identical boxes, different classes: both survive under every method
  boxes = jnp.array([[0, 0, 10, 10], [0, 0, 10, 10]], jnp.float32)
  scores = jnp.array([0.9, 0.8])
  classes = jnp.array([0, 1])
  for method in ("linear", "diou"):
    _, _, valid = nms_lib.per_class_nms(
        boxes, scores, classes, 2, iou_thresh=0.5,
        score_thresh=0.001 if method == "linear" else float("-inf"),
        method=method)
    assert int(jnp.sum(valid)) == 2, method
    # same class: suppressed/decayed to one
    _, _, valid2 = nms_lib.nms(
        boxes, scores, 2, iou_thresh=0.5,
        score_thresh=0.001 if method == "linear" else float("-inf"),
        method=method)
    assert int(jnp.sum(valid2)) == 1, method


def test_nms_params_dispatches_all_reference_methods():
  """nms_configs.method linear/diou resolve (the reference accepts all four,
  nms_np.py:206-216); defaults follow the nms_np dispatch."""
  from automl_tpu.configs.efficientdet_configs import get_efficientdet_config
  cfg = get_efficientdet_config("efficientdet-test")
  for method, iou, score in [("hard", 0.5, float("-inf")),
                             ("gaussian", 0.5, 0.001),
                             ("linear", 0.3, 0.001),
                             ("diou", 0.5, float("-inf"))]:
    cfg.nms_configs.method = method
    cfg.nms_configs.iou_thresh = None
    cfg.nms_configs.score_thresh = None
    p = postprocess.nms_params(cfg)
    assert p["method"] == method
    assert p["iou_thresh"] == iou
    assert p["score_thresh"] == score


# --- losses ------------------------------------------------------------------


def test_focal_loss_hand_value():
  # logits 0 -> p=0.5; y=1: alpha*0.5^gamma*ln2
  logits = jnp.zeros((1,))
  y = jnp.ones((1,))
  loss = losses_lib.focal_loss(logits, y, alpha=0.25, gamma=2.0, normalizer=1.0)
  np.testing.assert_allclose(float(loss[0]), 0.25 * 0.25 * np.log(2), rtol=1e-5)


def test_huber_loss():
  pred = jnp.array([0.0, 1.0])
  target = jnp.array([0.05, 0.0])
  out = losses_lib.huber_loss(pred, target, delta=0.1)
  np.testing.assert_allclose(
      np.asarray(out), [0.5 * 0.05 ** 2, 0.5 * 0.01 + 0.1 * 0.9], rtol=1e-5)


def test_iou_loss_values():
  b = jnp.array([[0.0, 0.0, 10.0, 10.0]])
  same = iou_lib.iou_value(b, b, "iou")
  np.testing.assert_allclose(np.asarray(same), [1.0], atol=1e-6)
  half = jnp.array([[0.0, 0.0, 10.0, 5.0]])
  np.testing.assert_allclose(np.asarray(iou_lib.iou_value(b, half, "iou")),
                             [0.5], atol=1e-6)
  for t in ("giou", "diou", "ciou"):
    v = iou_lib.iou_value(b, half, t)
    assert v.shape == (1,) and np.isfinite(np.asarray(v)).all()
  # padding target -> zero loss
  pad = jnp.zeros((1, 4))
  np.testing.assert_allclose(np.asarray(iou_lib.iou_loss(b, pad, "giou")), [0.0])


def test_detection_loss_runs_and_positive():
  cfg = Config(dict(num_classes=4, alpha=0.25, gamma=1.5, delta=0.1,
                    box_loss_weight=50.0, iou_loss_type=None,
                    iou_loss_weight=1.0, label_smoothing=0.0))
  b, a_cnt = 2, 100
  key = jax.random.key(0)
  cls_out = jax.random.normal(key, (b, a_cnt, 4))
  box_out = jax.random.normal(key, (b, a_cnt, 4)) * 0.1
  cls_t = jnp.where(jnp.arange(a_cnt)[None] < 5, 1, -1)
  cls_t = jnp.broadcast_to(cls_t, (b, a_cnt))
  box_t = jnp.where((cls_t >= 0)[..., None], 0.3, 0.0)
  num_pos = jnp.array([5.0, 5.0])
  total, cl, bl, il = losses_lib.detection_loss(
      cls_out, box_out, cls_t, box_t, num_pos, cfg)
  assert float(total) > 0 and float(cl) > 0 and float(bl) > 0 and float(il) == 0


# --- postprocess ---------------------------------------------------------------


def _toy_config(**kw):
  d = dict(num_classes=3, min_level=3, max_level=4, num_scales=1,
           aspect_ratios=[1.0], anchor_scale=4.0, image_size=64,
           nms_configs=dict(method="gaussian", iou_thresh=None,
                            score_thresh=0.0, sigma=None, max_nms_inputs=0,
                            max_output_size=10))
  d.update(kw)
  return Config(d)


def _toy_outputs(cfg, seed=0):
  key = jax.random.key(seed)
  feats = {3: 8, 4: 4}
  cls_outputs, box_outputs = [], []
  for lvl in (3, 4):
    s = feats[lvl]
    k1, k2, key = jax.random.split(key, 3)
    cls_outputs.append(jax.random.normal(k1, (2, s, s, cfg.num_classes)))
    box_outputs.append(jax.random.normal(k2, (2, s, s, 4)) * 0.1)
  return cls_outputs, box_outputs


def test_postprocess_global_shapes():
  cfg = _toy_config()
  cls_o, box_o = _toy_outputs(cfg)
  boxes, scores, classes, valid = postprocess.postprocess_global(
      cfg, cls_o, box_o)
  assert boxes.shape == (2, 10, 4)
  assert scores.shape == (2, 10) and classes.shape == (2, 10)
  assert valid.shape == (2,)
  assert (np.asarray(scores)[:, :-1] >= np.asarray(scores)[:, 1:] - 1e-6).all()
  # classes are 1-based where valid
  v = int(valid[0])
  assert (np.asarray(classes)[0, :v] >= 1).all()


def test_postprocess_per_class_and_detections():
  cfg = _toy_config()
  cls_o, box_o = _toy_outputs(cfg)
  dets, valid = postprocess.generate_detections(
      cfg, cls_o, box_o, image_scales=jnp.array([2.0, 1.0]),
      image_ids=jnp.array([7, 8]))
  assert dets.shape == (2, 10, 7)
  assert float(dets[0, 0, 0]) == 7.0
  coco = postprocess.transform_detections(dets)
  # w = ymax-... check w,h nonnegative for valid entries
  v = int(valid[0])
  assert (np.asarray(coco)[0, :v, 3] >= 0).all()
  assert (np.asarray(coco)[0, :v, 4] >= 0).all()


def test_wbf_ensemble():
  from automl_tpu.ops import wbf
  # two models, overlapping detections of the same object + one unique
  dets = np.array([
      [0, 10, 10, 50, 50, 0.9, 1],
      [0, 12, 12, 52, 52, 0.7, 1],
      [0, 100, 100, 120, 120, 0.6, 2],
  ], np.float64)
  out = wbf.ensemble_detections(dets, num_models=2)
  assert out.shape[0] == 2  # clustered into 2
  # first cluster: weighted average of the two boxes, full confidence scale
  np.testing.assert_allclose(out[0, 1], (10 * 0.9 + 12 * 0.7) / 1.6, rtol=1e-6)
  np.testing.assert_allclose(out[0, 5], 0.8, rtol=1e-6)  # mean * min(1, 2/2)
  # singleton cluster: confidence scaled by 1/2
  np.testing.assert_allclose(out[1, 5], 0.3, rtol=1e-6)


def test_pre_nms_topk_configurable():
  """nms_configs.pre_nms_topk: default 5000 (reference MAX_DETECTION_POINTS,
  tf2/anchors.py:27); lowering it shrinks the candidate set fed to NMS."""
  import jax
  import jax.numpy as jnp
  from automl_tpu.configs.efficientdet_configs import get_efficientdet_config
  from automl_tpu.ops import postprocess

  cfg = get_efficientdet_config("efficientdet-test")
  assert cfg.nms_configs.pre_nms_topk == 5000
  # efficientdet-test @ 64px: 774 anchors < 5000 -> no cap applied
  b, num_classes = 2, cfg.num_classes
  key = jax.random.key(0)
  cls_flat = jax.random.normal(key, (b, 774, num_classes))
  box_flat = 0.1 * jax.random.normal(jax.random.key(1), (b, 774, 4))
  scores, boxes, classes, idx = postprocess.topk_class_boxes(
      cfg, cls_flat, box_flat)
  assert scores.shape[1] == 774
  cfg.nms_configs.pre_nms_topk = 64
  scores2, boxes2, classes2, idx2 = postprocess.topk_class_boxes(
      cfg, cls_flat, box_flat)
  assert scores2.shape[1] == 64
  # the capped set is exactly the top-64 of the uncapped per-anchor maxima
  import numpy as np
  want = np.sort(np.asarray(scores), axis=1)[:, -64:][:, ::-1]
  np.testing.assert_allclose(np.asarray(scores2), want, atol=1e-6)
