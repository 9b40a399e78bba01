"""COCO metric tests: hand-computed AP cases mirroring pycocotools behavior."""

import numpy as np

from automl_tpu.eval.coco_metric import COCOEvaluator


def test_perfect_detection_ap_1():
  ev = COCOEvaluator()
  gt = np.array([[10, 10, 50, 50], [60, 60, 90, 90]])
  ev.add(1, gt, [0.9, 0.8], [1, 1], gt, [1, 1])
  m = ev.compute()
  assert abs(m["AP"] - 1.0) < 1e-6
  assert abs(m["AP50"] - 1.0) < 1e-6
  assert abs(m["ARmax100"] - 1.0) < 1e-6


def test_miss_all_ap_0():
  ev = COCOEvaluator()
  ev.add(1, np.array([[200, 200, 220, 220]]), [0.9], [1],
         np.array([[10, 10, 50, 50]]), [1])
  m = ev.compute()
  assert m["AP"] == 0.0 and m["AP50"] == 0.0


def test_half_iou_counts_only_low_thresholds():
  # det overlaps gt with IoU ~0.5: counts at thr .50 only (of 10 thresholds)
  ev = COCOEvaluator()
  gt = np.array([[0.0, 0.0, 10.0, 10.0]])
  det = np.array([[0.0, 0.0, 10.0, 5.0]])  # IoU 0.5
  ev.add(1, det, [0.9], [1], gt, [1])
  m = ev.compute()
  assert abs(m["AP"] - 0.1) < 1e-6  # 1.0 at thr .5, 0 at the rest
  assert abs(m["AP50"] - 1.0) < 1e-6
  assert m["AP75"] == 0.0


def test_fp_before_tp_halves_precision():
  # high-scoring FP then TP: precision at recall 1.0 is 0.5
  ev = COCOEvaluator()
  gt = np.array([[0.0, 0.0, 10.0, 10.0]])
  dets = np.array([[50.0, 50.0, 60.0, 60.0], [0.0, 0.0, 10.0, 10.0]])
  ev.add(1, dets, [0.9, 0.8], [1, 1], gt, [1])
  m = ev.compute()
  # 101-pt AP: precision 0.5 across all recall points
  assert abs(m["AP50"] - 0.5) < 1e-2


def test_crowd_gt_is_ignored_not_fp():
  ev = COCOEvaluator()
  gt = np.array([[0.0, 0.0, 100.0, 100.0], [200.0, 200.0, 210.0, 210.0]])
  crowd = np.array([True, False])
  # one det inside the crowd region (ignored), one matching the real gt
  dets = np.array([[10.0, 10.0, 50.0, 50.0], [200.0, 200.0, 210.0, 210.0]])
  ev.add(1, dets, [0.9, 0.8], [1, 1], gt, [1, 1], crowd)
  m = ev.compute()
  assert abs(m["AP"] - 1.0) < 1e-6  # crowd det neither TP nor FP


def test_area_buckets():
  ev = COCOEvaluator()
  small_gt = np.array([[0.0, 0.0, 10.0, 10.0]])       # area 100 (small)
  large_gt = np.array([[0.0, 0.0, 200.0, 200.0]])     # area 40000 (large)
  ev.add(1, small_gt, [0.9], [1], small_gt, [1])
  ev.add(2, large_gt, [0.9], [1], large_gt, [1])
  m = ev.compute()
  assert abs(m["APs"] - 1.0) < 1e-6
  assert abs(m["APl"] - 1.0) < 1e-6
  assert m["APm"] == -1.0  # no medium gt


def test_multiclass_mean():
  ev = COCOEvaluator(per_class=True)
  gt = np.array([[0.0, 0.0, 10.0, 10.0]])
  ev.add(1, gt, [0.9], [1], gt, [1])           # class 1 perfect
  ev.add(2, np.array([[50, 50, 60, 60.0]]), [0.9], [2], gt, [2])  # class 2 miss
  m = ev.compute()
  assert abs(m["AP"] - 0.5) < 1e-6
  assert abs(m["AP_/1"] - 1.0) < 1e-6
  assert m["AP_/2"] == 0.0


def test_batch_ingestion_from_device_format():
  ev = COCOEvaluator()
  # [image_id, ymin, xmin, ymax, xmax, score, class]
  dets = np.zeros((1, 5, 7), np.float32)
  dets[0, 0] = [7, 0, 0, 10, 10, 0.9, 1]
  valid = np.array([1])
  gt_boxes = np.zeros((1, 3, 4), np.float32)
  gt_boxes[0, 0] = [0, 0, 10, 10]
  gt_classes = -np.ones((1, 3), np.int32)
  gt_classes[0, 0] = 1
  ev.add_batch_from_detections(dets, valid, gt_boxes, gt_classes)
  m = ev.compute()
  assert abs(m["AP"] - 1.0) < 1e-6


# --- detection-results file / test-dev JSON dump ------------------------------


def _randomized_evaluator(seed=0, images=6, classes=3):
  rng = np.random.RandomState(seed)
  ev = COCOEvaluator()
  for img in range(1, images + 1):
    # integer coordinates so the reference's 2-decimal bbox rounding
    # (coco_metric.py:125-126) is exact and the round trip is bit-faithful
    gt = rng.randint(0, 200, size=(4, 2))
    gt = np.concatenate([gt, gt + rng.randint(20, 80, size=(4, 2))], axis=1)
    gt_cls = rng.randint(1, classes + 1, size=4)
    det = rng.randint(0, 200, size=(5, 2))
    det = np.concatenate([det, det + rng.randint(20, 80, size=(5, 2))], axis=1)
    # overlap some dets with gt so AP is non-trivial
    det[:2] = gt[:2] + rng.randint(0, 8, size=(2, 4))
    scores = np.round(rng.uniform(0.1, 0.99, size=5), 3)
    det_cls = rng.randint(1, classes + 1, size=5)
    det_cls[:2] = gt_cls[:2]
    ev.add(img, det.astype(float), scores, det_cls,
           gt.astype(float), gt_cls)
  return ev


def test_detection_results_coco_format(tmp_path):
  """The submission artifact: COCO result rows under the mandated test-dev
  file name (ref: efficientdet/coco_metric.py:119-133)."""
  import json
  ev = _randomized_evaluator()
  path = ev.write_detections_json(str(tmp_path))
  assert path.endswith("detections_test-dev2017_test_results.json")
  rows = json.load(open(path))
  assert len(rows) == 6 * 5
  for r in rows:
    assert set(r) == {"image_id", "category_id", "bbox", "score"}
    assert len(r["bbox"]) == 4
    assert r["bbox"][2] > 0 and r["bbox"][3] > 0  # xywh, not corners
    assert 0 < r["score"] <= 1


def test_detection_results_roundtrip_identical_ap(tmp_path):
  """dump -> reload -> identical 12-metric AP vector."""
  import json
  ev = _randomized_evaluator(seed=3)
  before = ev.compute()
  assert before["AP"] > 0  # non-trivial workload
  path = ev.write_detections_json(str(tmp_path / "results.json"))
  rows = json.load(open(path))

  ev2 = COCOEvaluator()
  # reload GT only (empty det lists), then the dumped detections
  for (img, cls), lst in ev._gts.items():
    for box, crowd in lst:
      ev2.add(img, np.zeros((0, 4)), [], [],
              box[None], [cls], [crowd])
  ev2.add_detection_results(rows)
  after = ev2.compute()
  assert set(before) == set(after)
  for k in before:
    assert abs(before[k] - after[k]) < 1e-9, (k, before[k], after[k])


def test_evaluate_detection_testdev_mode(tmp_path):
  """evaluate_detection(testdev_dir=...) writes the COCO-server submission
  artifact and returns AP == -1, the reference's test-dev contract
  (efficientdet/coco_metric.py:119-133)."""
  import json
  import jax
  from automl_tpu import nn
  from automl_tpu.configs.efficientdet_configs import get_efficientdet_config
  from automl_tpu.data import pipeline
  from automl_tpu.models.efficientdet import EfficientDet
  from automl_tpu.train.runners import evaluate_detection

  nn.set_policy("float32")
  try:
    cfg = get_efficientdet_config("efficientdet-test")
    model = EfficientDet(cfg)
    params = jax.jit(model.init)(jax.random.key(0))
    it = iter(pipeline.SyntheticDetection(2, 64, max_instances=4,
                                          num_classes=3, seed=0))
    m = evaluate_detection(model, params, cfg, it, eval_steps=1,
                           testdev_dir=str(tmp_path / "testdev"))
    assert m["AP"] == -1.0
    path = m["detections_json"]
    assert path.endswith("detections_test-dev2017_test_results.json")
    rows = json.load(open(path))
    assert rows, "random weights should still emit detections"
    assert set(rows[0]) == {"image_id", "category_id", "bbox", "score"}
  finally:
    nn.set_policy("mixed_bfloat16")


# --- differential validation: independent slow-oracle matcher ----------------
# A literal transcription of the pycocotools evaluateImg/accumulate protocol
# (sequential triple-loop greedy matcher, full recompute per (area, maxDet) —
# the round-1 implementation, validated by the hand goldens above). The fast
# vectorized evaluator must agree with it on randomized workloads.

from automl_tpu.eval.coco_metric import (  # noqa: E402
    AREA_RANGES, IOU_THRESHOLDS, MAX_DETS, RECALL_POINTS, _iou_matrix)


def _oracle_evaluate_img(ev, img, cls, area_rng, max_det):
  dets = sorted(ev._dets.get((img, cls), []), key=lambda x: -x[0])[:max_det]
  gts = ev._gts.get((img, cls), [])
  T = len(IOU_THRESHOLDS)
  if not dets and not gts:
    return None
  d_boxes = np.array([d[1] for d in dets]).reshape(-1, 4)
  d_scores = np.array([d[0] for d in dets])
  g_boxes = np.array([g[0] for g in gts]).reshape(-1, 4)
  g_crowd = np.array([g[1] for g in gts], bool).reshape(-1)
  g_area = ((g_boxes[:, 2] - g_boxes[:, 0])
            * (g_boxes[:, 3] - g_boxes[:, 1])) if len(gts) else np.zeros(0)
  g_ignore = g_crowd | (g_area < area_rng[0]) | (g_area > area_rng[1])
  g_order = np.argsort(g_ignore, kind="stable")
  g_boxes, g_crowd, g_ignore = (g_boxes[g_order], g_crowd[g_order],
                                g_ignore[g_order])
  ious = _iou_matrix(d_boxes, g_boxes, g_crowd)
  D, G = len(dets), len(gts)
  dt_m = -np.ones((T, D), int)
  gt_m = -np.ones((T, G), int)
  for ti, thr in enumerate(IOU_THRESHOLDS):
    for di in range(D):
      best, best_iou = -1, min(thr, 1 - 1e-10)
      for gi in range(G):
        if gt_m[ti, gi] >= 0 and not g_crowd[gi]:
          continue
        if best >= 0 and not g_ignore[best] and g_ignore[gi]:
          break
        if ious[di, gi] < best_iou:
          continue
        best_iou = ious[di, gi]
        best = gi
      if best >= 0:
        dt_m[ti, di] = best
        gt_m[ti, best] = di
  d_area = ((d_boxes[:, 2] - d_boxes[:, 0])
            * (d_boxes[:, 3] - d_boxes[:, 1])) if D else np.zeros(0)
  d_oor = (d_area < area_rng[0]) | (d_area > area_rng[1])
  dt_ignore = np.zeros((T, D), bool)
  for ti in range(T):
    matched = dt_m[ti] >= 0
    mi = np.zeros(D, bool)
    mi[matched] = g_ignore[dt_m[ti][matched]]
    dt_ignore[ti] = mi | (~matched & d_oor)
  return dt_m >= 0, dt_ignore, d_scores, int(np.sum(~g_ignore))


def _oracle_accumulate(ev, area, max_det):
  area_rng = AREA_RANGES[area]
  T, R = len(IOU_THRESHOLDS), len(RECALL_POINTS)
  classes = sorted(ev._classes)
  precision = -np.ones((T, R, len(classes)))
  recall = -np.ones((T, len(classes)))
  for ki, cls in enumerate(classes):
    per_img = [_oracle_evaluate_img(ev, img, cls, area_rng, max_det)
               for img in sorted(ev._images)]
    per_img = [e for e in per_img if e is not None]
    if not per_img:
      continue
    scores = np.concatenate([e[2] for e in per_img])
    order = np.argsort(-scores, kind="mergesort")
    matches = np.concatenate([e[0] for e in per_img], axis=1)[:, order]
    ignored = np.concatenate([e[1] for e in per_img], axis=1)[:, order]
    n_gt = sum(e[3] for e in per_img)
    if n_gt == 0:
      continue
    keep = ~ignored
    for ti in range(T):
      tp = np.cumsum(matches[ti] & keep[ti])
      fp = np.cumsum(~matches[ti] & keep[ti])
      rc = tp / n_gt
      pr = (tp / np.maximum(tp + fp, 1e-10)).tolist()
      recall[ti, ki] = rc[-1] if len(rc) else 0.0
      for i in range(len(pr) - 1, 0, -1):
        pr[i - 1] = max(pr[i - 1], pr[i])
      inds = np.searchsorted(rc, RECALL_POINTS, side="left")
      q = np.zeros(R)
      for ri, pi in enumerate(inds):
        if pi < len(pr):
          q[ri] = pr[pi]
      precision[ti, :, ki] = q
  return precision, recall


def _random_workload(seed, n_images=4, n_classes=3):
  rng = np.random.RandomState(seed)
  ev = COCOEvaluator()
  for img in range(n_images):
    n_gt = rng.randint(0, 8)
    gt_yx = rng.uniform(0, 300, (n_gt, 2))
    gt_hw = rng.uniform(4, 150, (n_gt, 2))  # spans small/medium/large areas
    gt = np.concatenate([gt_yx, gt_yx + gt_hw], axis=1)
    gt_cls = rng.randint(1, n_classes + 1, n_gt)
    crowd = rng.rand(n_gt) < 0.2
    n_det = rng.randint(0, 20)
    if n_det and n_gt and rng.rand() < 0.8:
      # jittered copies of gts (realistic near-matches incl. exact ties)
      src = rng.randint(0, n_gt, n_det)
      det = gt[src] + rng.normal(0, 8, (n_det, 4))
    else:
      dyx = rng.uniform(0, 300, (n_det, 2))
      dhw = rng.uniform(4, 150, (n_det, 2))
      det = np.concatenate([dyx, dyx + dhw], axis=1)
    det_cls = rng.randint(1, n_classes + 1, n_det)
    scores = rng.uniform(0.05, 1.0, n_det)
    ev.add(img, det, scores, det_cls, gt, gt_cls, crowd)
  return ev


def test_fast_evaluator_matches_oracle_randomized():
  """>= 25 randomized workloads: every precision/recall cell must agree with
  the literal sequential-greedy oracle to 1e-9 at all (area, maxDet) combos."""
  for seed in range(25):
    ev = _random_workload(seed)
    ev._eval_cache = None
    for area, md in (("all", 100), ("small", 100), ("medium", 100),
                     ("large", 100), ("all", 10), ("all", 1)):
      p_fast, r_fast = ev._accumulate(area, md)
      p_ref, r_ref = _oracle_accumulate(ev, area, md)
      np.testing.assert_allclose(p_fast, p_ref, atol=1e-9,
                                 err_msg=f"seed {seed} {area} maxDet={md}")
      np.testing.assert_allclose(r_fast, r_ref, atol=1e-9,
                                 err_msg=f"seed {seed} {area} maxDet={md}")


def test_evaluator_speed_5k_images():
  """A 5k-image, 90-class synthetic eval must complete in < 60 s (round-1
  implementation took tens of minutes at this scale)."""
  import time
  rng = np.random.RandomState(0)
  ev = COCOEvaluator()
  for img in range(5000):
    n_gt = rng.randint(1, 12)
    gt_yx = rng.uniform(0, 500, (n_gt, 2))
    gt_hw = rng.uniform(8, 200, (n_gt, 2))
    gt = np.concatenate([gt_yx, gt_yx + gt_hw], axis=1)
    gt_cls = rng.randint(1, 91, n_gt)
    n_det = 100
    src = rng.randint(0, n_gt, n_det)
    det = gt[src] + rng.normal(0, 15, (n_det, 4))
    det_cls = np.where(rng.rand(n_det) < 0.7, gt_cls[src],
                       rng.randint(1, 91, n_det))
    scores = rng.uniform(0.05, 1.0, n_det)
    ev.add(img, det, scores, det_cls, gt, gt_cls)
  t0 = time.perf_counter()
  m = ev.compute()
  dt = time.perf_counter() - t0
  assert dt < 60.0, f"eval took {dt:.1f}s"
  assert 0.0 < m["AP"] < 1.0
