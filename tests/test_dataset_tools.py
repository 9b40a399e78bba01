"""Dataset converter tests: COCO json -> TFRecord -> both loaders read back."""

import json
import os

import numpy as np
import pytest


@pytest.fixture
def mini_coco(tmp_path):
  from PIL import Image
  img_dir = tmp_path / "images"
  img_dir.mkdir()
  rng = np.random.RandomState(0)
  images, annotations = [], []
  for i in range(3):
    name = f"img{i}.jpg"
    Image.fromarray(rng.randint(0, 255, (80, 100, 3), np.uint8)).save(
        str(img_dir / name), "JPEG")
    images.append({"id": 100 + i, "file_name": name, "height": 80,
                   "width": 100})
    annotations.append({
        "id": i, "image_id": 100 + i, "category_id": (i % 2) + 1,
        "bbox": [10.0, 20.0, 30.0, 40.0], "iscrowd": 0, "area": 1200.0})
  ann_file = tmp_path / "instances.json"
  ann_file.write_text(json.dumps({
      "images": images, "annotations": annotations,
      "categories": [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]}))
  return str(img_dir), str(ann_file), tmp_path


def test_converter_and_tf_loader_roundtrip(mini_coco):
  img_dir, ann_file, tmp_path = mini_coco
  from automl_tpu.cli import create_coco_tfrecord
  n = create_coco_tfrecord.main([
      f"--image_dir={img_dir}",
      f"--object_annotations_file={ann_file}",
      f"--output_file_prefix={tmp_path}/out/val",
      "--num_shards=2"])
  assert n == 3

  # read back with the tf.data loader
  from automl_tpu.data import pipeline
  loader = pipeline.DetectionTFRecordLoader(
      f"{tmp_path}/out/val-*.tfrecord", is_training=False, batch_size=3,
      canvas_size=64, max_instances=10)
  batch = next(iter(loader))
  assert batch["image"].shape == (3, 64, 64, 3)
  assert batch["gt_boxes"].shape == (3, 10, 4)
  # bbox x: 10/100 * scaled content width 64 -> 6.4 canvas px
  valid = batch["gt_classes"] > 0
  assert valid.sum() == 3
  got = np.sort(batch["gt_boxes"][valid][:, 1])
  np.testing.assert_allclose(got, [6.4, 6.4, 6.4], atol=0.2)


def test_converter_native_reader_roundtrip(mini_coco):
  img_dir, ann_file, tmp_path = mini_coco
  from automl_tpu.cli import create_coco_tfrecord
  create_coco_tfrecord.main([
      f"--image_dir={img_dir}",
      f"--object_annotations_file={ann_file}",
      f"--output_file_prefix={tmp_path}/nat/val",
      "--num_shards=1"])
  from automl_tpu.data import native_loader
  try:
    native_loader.build_native()
  except Exception as e:
    pytest.skip(f"native build failed: {e}")
  records = list(native_loader.TFRecordFile(
      f"{tmp_path}/nat/val-00000-of-00001.tfrecord"))
  assert len(records) == 3
  ex = native_loader.parse_example(records[0])
  assert ex["image/source_id"] == [b"100"]
  np.testing.assert_allclose(ex["image/object/bbox/xmin"], [0.1])
  canvas, (ch, cw) = native_loader.jpeg_decode_to_canvas(
      ex["image/encoded"][0], 64, 64)
  assert (ch, cw) == (51, 64)  # 80x100 -> x0.64 aspect-preserved


def test_inspect_tfrecords_tool(mini_coco):
  """Inspector CLI: stats + annotated sample PNGs
  (ref: efficientdet/dataset/inspect_tfrecords.py:44)."""
  img_dir, ann_file, tmp_path = mini_coco
  from automl_tpu.cli import create_coco_tfrecord, inspect_tfrecords
  create_coco_tfrecord.main([
      f"--image_dir={img_dir}",
      f"--object_annotations_file={ann_file}",
      f"--output_file_prefix={tmp_path}/insp/val",
      "--num_shards=1"])
  samples = str(tmp_path / "samples")
  stats = inspect_tfrecords.main([
      f"--file_pattern={tmp_path}/insp/val-*.tfrecord",
      "--num_samples=3", f"--save_samples_dir={samples}",
      "--canvas_size=64", "--eval"])
  assert stats["records_scanned"] == 3
  assert stats["boxes_per_image_mean"] == 1.0
  assert set(stats["class_histogram"]) == {1, 2}
  assert sorted(os.listdir(samples)) == [
      "record_0.png", "record_1.png", "record_2.png"]
