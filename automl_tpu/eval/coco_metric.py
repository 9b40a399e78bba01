"""COCO detection metrics (AP/AR) in pure numpy — pycocotools semantics.

The reference wraps pycocotools' Cython COCOeval (efficientdet/coco_metric.py).
That package is not a framework dependency here, so the evaluation protocol is
reimplemented: greedy score-ordered matching per (image, class) at IoU
thresholds .50:.05:.95, crowd regions as ignore, area-range buckets, 101-point
interpolated AP, and the standard 12-metric summary.

Host-side, eval-only code: detections arrive from the device NMS as
[image_id, ymin, xmin, ymax, xmax, score, class] rows
(ops/postprocess.generate_detections).
"""

from __future__ import annotations

import collections

import numpy as np

IOU_THRESHOLDS = np.arange(0.5, 1.0, 0.05).round(2)  # 10 thresholds
RECALL_POINTS = np.linspace(0.0, 1.0, 101)
AREA_RANGES = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0 ** 2),
    "medium": (32.0 ** 2, 96.0 ** 2),
    "large": (96.0 ** 2, 1e10),
}
MAX_DETS = (1, 10, 100)


def _iou_matrix(dets, gts, iscrowd):
  """IoU [D, G]; for crowd gt, IoU = intersection / det area (pycocotools)."""
  if len(dets) == 0 or len(gts) == 0:
    return np.zeros((len(dets), len(gts)))
  ymin = np.maximum(dets[:, None, 0], gts[None, :, 0])
  xmin = np.maximum(dets[:, None, 1], gts[None, :, 1])
  ymax = np.minimum(dets[:, None, 2], gts[None, :, 2])
  xmax = np.minimum(dets[:, None, 3], gts[None, :, 3])
  inter = np.maximum(ymax - ymin, 0) * np.maximum(xmax - xmin, 0)
  area_d = ((dets[:, 2] - dets[:, 0]) * (dets[:, 3] - dets[:, 1]))[:, None]
  area_g = ((gts[:, 2] - gts[:, 0]) * (gts[:, 3] - gts[:, 1]))[None, :]
  union = np.where(iscrowd[None, :], area_d,
                   area_d + area_g - inter)
  return np.where(union > 0, inter / np.maximum(union, 1e-10), 0.0)


class COCOEvaluator:
  """Accumulate (detections, groundtruth) per image; compute() -> 12 metrics.

  add(image_id, det_boxes [D,4] (ymin,xmin,ymax,xmax), det_scores [D],
      det_classes [D], gt_boxes [G,4], gt_classes [G], gt_is_crowd [G] opt)
  """

  def __init__(self, per_class: bool = False, label_map=None):
    self._dets = collections.defaultdict(list)   # (img, cls) -> [score, box]
    self._gts = collections.defaultdict(list)    # (img, cls) -> [box, crowd]
    self._images = set()
    self._classes = set()
    self.per_class = per_class
    self.label_map = label_map

  def add(self, image_id, det_boxes, det_scores, det_classes,
          gt_boxes, gt_classes, gt_is_crowd=None):
    image_id = int(image_id)
    self._images.add(image_id)
    det_boxes = np.asarray(det_boxes, np.float64).reshape(-1, 4)
    det_scores = np.asarray(det_scores, np.float64).reshape(-1)
    det_classes = np.asarray(det_classes).reshape(-1).astype(int)
    for b, s, c in zip(det_boxes, det_scores, det_classes):
      if s > 0:
        self._dets[(image_id, c)].append((s, b))
        self._classes.add(c)
    gt_boxes = np.asarray(gt_boxes, np.float64).reshape(-1, 4)
    gt_classes = np.asarray(gt_classes).reshape(-1).astype(int)
    if gt_is_crowd is None:
      gt_is_crowd = np.zeros(len(gt_classes), bool)
    gt_is_crowd = np.asarray(gt_is_crowd).reshape(-1).astype(bool)
    for b, c, cr in zip(gt_boxes, gt_classes, gt_is_crowd):
      if c > 0:
        self._gts[(image_id, c)].append((b, cr))
        self._classes.add(c)

  # -- evaluation --------------------------------------------------------

  def _evaluate_img(self, img, cls, area_rng, max_det):
    """pycocotools evaluateImg: -> (dt_matches [T,D], dt_ignore [T,D],
    dt_scores [D], num_valid_gt)."""
    dets = sorted(self._dets.get((img, cls), []), key=lambda x: -x[0])[:max_det]
    gts = self._gts.get((img, cls), [])
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
    # sort gt: non-ignored first (pycocotools)
    g_order = np.argsort(g_ignore, kind="stable")
    g_boxes, g_crowd, g_ignore = g_boxes[g_order], g_crowd[g_order], g_ignore[g_order]

    ious = _iou_matrix(d_boxes, g_boxes, g_crowd)
    D, G = len(dets), len(gts)
    dt_m = -np.ones((T, D), int)   # matched gt index or -1
    gt_m = -np.ones((T, G), int)
    for ti, thr in enumerate(IOU_THRESHOLDS):
      for di in range(D):
        best, best_iou = -1, min(thr, 1 - 1e-10)
        for gi in range(G):
          if gt_m[ti, gi] >= 0 and not g_crowd[gi]:
            continue
          if best >= 0 and not g_ignore[best] and g_ignore[gi]:
            break  # gts sorted: once into ignored region with a real match, stop
          if ious[di, gi] < best_iou:
            continue
          best_iou = ious[di, gi]
          best = gi
        if best >= 0:
          dt_m[ti, di] = best
          gt_m[ti, best] = di
    d_area = ((d_boxes[:, 2] - d_boxes[:, 0])
              * (d_boxes[:, 3] - d_boxes[:, 1])) if D else np.zeros(0)
    d_out_of_range = (d_area < area_rng[0]) | (d_area > area_rng[1])
    dt_ignore = np.zeros((T, D), bool)
    for ti in range(T):
      matched = dt_m[ti] >= 0
      matched_ignored = np.zeros(D, bool)
      matched_ignored[matched] = g_ignore[dt_m[ti][matched]]
      dt_ignore[ti] = matched_ignored | (~matched & d_out_of_range)
    num_valid_gt = int(np.sum(~g_ignore))
    return dt_m >= 0, dt_ignore, d_scores, num_valid_gt

  def _accumulate(self, area: str, max_det: int):
    """-> precision [T, R, K], recall [T, K] (K = classes with >=1 gt)."""
    area_rng = AREA_RANGES[area]
    T, R = len(IOU_THRESHOLDS), len(RECALL_POINTS)
    classes = sorted(self._classes)
    precision = -np.ones((T, R, len(classes)))
    recall = -np.ones((T, len(classes)))
    for ki, cls in enumerate(classes):
      per_img = [self._evaluate_img(img, cls, area_rng, max_det)
                 for img in sorted(self._images)]
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
        pr = tp / np.maximum(tp + fp, 1e-10)
        recall[ti, ki] = rc[-1] if len(rc) else 0.0
        # precision envelope (monotone non-increasing from the right)
        pr = pr.tolist()
        for i in range(len(pr) - 1, 0, -1):
          pr[i - 1] = max(pr[i - 1], pr[i])
        inds = np.searchsorted(rc, RECALL_POINTS, side="left")
        q = np.zeros(R)
        for ri, pi in enumerate(inds):
          if pi < len(pr):
            q[ri] = pr[pi]
        precision[ti, :, ki] = q
    return precision, recall

  def compute(self) -> dict:
    """The standard 12 COCO metrics (+ per-class AP when enabled)."""
    p_all, r_all = self._accumulate("all", 100)

    def mean_valid(x):
      v = x[x > -1]
      return float(np.mean(v)) if v.size else -1.0

    metrics = {
        "AP": mean_valid(p_all),
        "AP50": mean_valid(p_all[0]),
        "AP75": mean_valid(p_all[5]),
        "ARmax100": mean_valid(r_all),
    }
    for area in ("small", "medium", "large"):
      p, r = self._accumulate(area, 100)
      metrics[f"AP{area[0]}"] = mean_valid(p)
      metrics[f"AR{area[0]}"] = mean_valid(r)
    for md in (1, 10):
      _, r = self._accumulate("all", md)
      metrics[f"ARmax{md}"] = mean_valid(r)
    if self.per_class:
      classes = sorted(self._classes)
      for ki, cls in enumerate(classes):
        name = (self.label_map or {}).get(cls, str(cls))
        metrics[f"AP_/{name}"] = mean_valid(p_all[:, :, ki])
    return metrics

  def add_batch_from_detections(self, detections, valid_len,
                                gt_boxes, gt_classes, gt_is_crowd=None):
    """Consume [B, K, 7] device detections + padded gt arrays."""
    detections = np.asarray(detections)
    valid_len = np.asarray(valid_len).astype(int)
    gt_boxes = np.asarray(gt_boxes)
    gt_classes = np.asarray(gt_classes)
    for i in range(detections.shape[0]):
      n = valid_len[i]
      d = detections[i, :n]
      crowd = None if gt_is_crowd is None else gt_is_crowd[i]
      self.add(d[0, 0] if n else i, d[:, 1:5], d[:, 5], d[:, 6],
               gt_boxes[i], gt_classes[i], crowd)
