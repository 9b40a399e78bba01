"""Visualization parity tests: masks, keypoints, PNG IO, summary images,
side-by-side eval panels (ref: efficientdet/visualize/vis_utils.py)."""

import numpy as np

from automl_tpu.inference import visualize


def _img(h=32, w=32):
  return np.full((h, w, 3), 128, np.uint8)


def test_draw_mask_blends_only_inside_mask():
  img = _img()
  mask = np.zeros((32, 32), np.float32)
  mask[4:10, 4:10] = 1.0
  out = visualize.draw_mask(img, mask, color=(255, 0, 0), alpha=0.5)
  assert out.dtype == np.uint8
  # inside: blended toward red; outside: untouched
  assert out[5, 5, 0] > 128 and out[5, 5, 1] < 128
  np.testing.assert_array_equal(out[0, 0], [128, 128, 128])


def test_draw_keypoints_absolute_and_normalized():
  out = visualize.draw_keypoints(_img(), [[16, 16]], radius=2,
                                 color=(0, 255, 0))
  assert tuple(out[16, 16]) == (0, 255, 0)
  out2 = visualize.draw_keypoints(_img(), [[0.5, 0.5]], radius=2,
                                  color=(0, 255, 0),
                                  use_normalized_coordinates=True)
  assert tuple(out2[16, 16]) == (0, 255, 0)


def test_visualize_image_with_masks_and_keypoints():
  boxes = np.array([[4.0, 4.0, 20.0, 20.0]])
  masks = np.zeros((1, 32, 32), np.float32)
  masks[0, 6:18, 6:18] = 1.0
  kps = np.array([[[10.0, 10.0], [12.0, 12.0]]])
  out = visualize.visualize_image(_img(), boxes, np.array([1]),
                                  np.array([0.9]), masks=masks,
                                  keypoints=kps, min_score_thresh=0.5)
  assert out.shape == (32, 32, 3)
  assert not np.array_equal(out, _img())  # something was drawn


def test_png_roundtrip(tmp_path):
  img = visualize.visualize_image(_img(), np.array([[2.0, 2.0, 12.0, 12.0]]),
                                  np.array([1]), np.array([0.8]))
  p = str(tmp_path / "det.png")
  visualize.save_image_array_as_png(img, p)
  from PIL import Image
  back = np.asarray(Image.open(p))
  np.testing.assert_array_equal(back, img)
  data = visualize.encode_image_as_png_bytes(img)
  assert data[:8] == b"\x89PNG\r\n\x1a\n"


def test_cdf_and_hist_images():
  vals = np.random.RandomState(0).rand(100)
  cdf = visualize.cdf_image(vals, "test_cdf")
  hist = visualize.hist_image(vals, bins=10, name="test_hist")
  for arr in (cdf, hist):
    assert arr.dtype == np.uint8 and arr.ndim == 3 and arr.shape[2] == 3
    assert arr.shape[0] > 100 and arr.shape[1] > 100


def test_side_by_side_evaluation_image():
  gt_boxes = np.array([[2.0, 2.0, 12.0, 12.0], [0, 0, 0, 0]])
  gt_classes = np.array([1, 0])  # second row = padding
  out = visualize.side_by_side_evaluation_image(
      _img(), gt_boxes, gt_classes,
      det_boxes=np.array([[3.0, 3.0, 13.0, 13.0]]),
      det_classes=np.array([1]), det_scores=np.array([0.9]))
  assert out.shape == (32, 64, 3)


def test_eval_writes_sample_images(tmp_path):
  """evaluate_detection(vis_dir=...) drops side-by-side PNG artifacts
  (DisplayCallback analog, ref: tf2/train_lib.py:251-290)."""
  import os
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
    vis_dir = str(tmp_path / "vis")
    evaluate_detection(model, params, cfg, it, eval_steps=1, vis_dir=vis_dir)
    files = sorted(os.listdir(vis_dir))
    assert files == ["eval_image_0.png", "eval_image_1.png"], files
  finally:
    nn.set_policy("mixed_bfloat16")
