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
