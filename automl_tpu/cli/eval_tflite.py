"""Evaluate an exported detection TFLite model on COCO-style TFRecords.

Capability parity: efficientdet/tf2/eval_tflite.py (LiteRunner over COCO with
EvaluationMetric). The exported model emits the pre-NMS contract
(boxes, scores, classes); NMS runs here with the framework's own kernel.

Example:
  python -m automl_tpu.cli.eval_tflite --tflite_path=d0.tflite \
    --model_name=efficientdet-d0 --val_file_pattern='val-*.tfrecord' \
    --eval_samples=5000
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def parse_args(argv=None):
  p = argparse.ArgumentParser(description=__doc__)
  p.add_argument("--tflite_path", required=True)
  p.add_argument("--model_name", default="efficientdet-d0")
  p.add_argument("--val_file_pattern", required=True)
  p.add_argument("--eval_samples", type=int, default=5000)
  p.add_argument("--hparams", default="")
  return p.parse_args(argv)


class LiteRunner:
  """Invoke a detection TFLite model (pre-NMS contract) per batch."""

  def __init__(self, tflite_path: str):
    import tensorflow as tf
    self.interp = tf.lite.Interpreter(model_path=tflite_path)
    self.interp.allocate_tensors()
    self.input = self.interp.get_input_details()[0]
    self.outputs = self.interp.get_output_details()

  def run(self, images: np.ndarray):
    self.interp.set_tensor(self.input["index"], images.astype(np.float32))
    self.interp.invoke()
    outs = [self.interp.get_tensor(o["index"]) for o in self.outputs]
    # order by rank/shape: boxes [B,N,4], scores [B,N] f32, classes [B,N] int
    boxes = next(o for o in outs if o.ndim == 3)
    rest = [o for o in outs if o.ndim == 2]
    scores = next(o for o in rest if o.dtype in (np.float32, np.float16))
    classes = next(o for o in rest if np.issubdtype(o.dtype, np.integer))
    return boxes, scores, classes


def main(argv=None):
  args = parse_args(argv)
  import jax
  jax.config.update("jax_platforms", "cpu")
  import jax.numpy as jnp
  from automl_tpu.configs.efficientdet_configs import get_efficientdet_config
  from automl_tpu.data import pipeline
  from automl_tpu.eval.coco_metric import COCOEvaluator
  from automl_tpu.ops import nms as nms_lib
  from automl_tpu.utils import parse_image_size

  config = get_efficientdet_config(args.model_name)
  config.override(args.hparams)
  size = parse_image_size(config.image_size)
  runner = LiteRunner(args.tflite_path)
  batch = runner.input["shape"][0]

  loader = pipeline.DetectionTFRecordLoader(
      args.val_file_pattern, is_training=False, batch_size=int(batch),
      canvas_size=size[0], max_instances=config.max_instances_per_image)
  from automl_tpu.ops.postprocess import nms_params
  p = nms_params(config)
  evaluator = COCOEvaluator()
  seen = 0
  for data in loader:
    boxes, scores, classes = runner.run(data["image"])
    for i in range(boxes.shape[0]):
      span = max(float(boxes[i].max()), 1.0) + 1.0
      shifted = boxes[i] + classes[i][:, None].astype(np.float32) * span
      idx, out_scores, valid = nms_lib.nms(
          jnp.asarray(shifted), jnp.asarray(scores[i]),
          p["max_output_size"], p["iou_thresh"], p["sigma"],
          p["score_thresh"])
      idx, valid = np.asarray(idx), np.asarray(valid)
      n = int(valid.sum())
      scale = float(data["image_scale"][i])
      evaluator.add(int(data["source_id"][i]),
                    boxes[i][idx[:n]] * scale,
                    np.asarray(out_scores)[:n],
                    classes[i][idx[:n]] + 1,
                    data["gt_boxes"][i] * scale,
                    data["gt_classes"][i])
    seen += boxes.shape[0]
    if seen >= args.eval_samples:
      break
  metrics = evaluator.compute()
  print(json.dumps({k: round(v, 4) for k, v in metrics.items()}))
  return metrics


if __name__ == "__main__":
  main()
