"""Classification inference/eval/benchmark/export CLI (the reference's
efficientnetv2/infer.py:47-206).

Examples:
  python -m automl_tpu.cli.infer_cls --model_name=efficientnetv2-b0 \
    --runmode=bm --batch_size=8
  python -m automl_tpu.cli.infer_cls --runmode=infer --input_image=cat.jpg
"""

from __future__ import annotations

import argparse
import json
import time


def parse_args(argv=None):
  p = argparse.ArgumentParser(description=__doc__)
  p.add_argument("--runmode", default="bm", choices=["bm", "infer", "export",
                                                     "eval"])
  p.add_argument("--model_name", default="efficientnetv2-b0")
  p.add_argument("--ckpt_path", default=None, help="orbax dir or TF ckpt")
  p.add_argument("--tf_ckpt", action="store_true",
                 help="ckpt_path is a published TF checkpoint")
  p.add_argument("--use_ema", action="store_true")
  p.add_argument("--dataset", default=None,
                 help="dataset config overlay (e.g. imagenet21k -> "
                      "multiclass AUC-PR eval)")
  p.add_argument("--hparam_str", default="")
  p.add_argument("--batch_size", type=int, default=8)
  p.add_argument("--bm_runs", type=int, default=10)
  p.add_argument("--input_image", default=None)
  p.add_argument("--export_dir", default=None)
  p.add_argument("--val_file_pattern", default=None)
  p.add_argument("--eval_samples", type=int, default=50000)
  return p.parse_args(argv)


def main(argv=None):
  args = parse_args(argv)
  import jax
  import jax.numpy as jnp
  import numpy as np
  from automl_tpu import nn
  from automl_tpu.configs.effnet_configs import get_model_config
  from automl_tpu.data import preprocessing
  from automl_tpu.models import build_model

  config = get_model_config(args.model_name)
  if args.dataset:
    from automl_tpu.data import datasets as ds_lib
    config.override(ds_lib.get_dataset_config(args.dataset).as_dict(),
                    allow_new_keys=True)
  config.override(args.hparam_str)
  nn.set_policy("mixed_bfloat16" if config.runtime.mixed_precision
                else "float32")
  model = build_model(config.model)

  if args.ckpt_path and args.tf_ckpt:
    from automl_tpu.ckpt import tf_compat
    params = tf_compat.convert_effnet_checkpoint(
        args.ckpt_path, model, use_ema=args.use_ema)
  elif args.ckpt_path:
    from automl_tpu.train.checkpoint import CheckpointManager
    template = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype),
        jax.eval_shape(model.init, jax.random.key(0)))
    restored = CheckpointManager(args.ckpt_path).restore({"params": template})
    params = restored["params"]
  else:
    params = jax.jit(model.init)(jax.random.key(0))

  isize = int(config.eval.isize)
  canvas = isize + 32
  # serve-time normalization must match training's augname-derived norm
  # ('effnetv1_*' -> legacy MEAN/STDDEV, ref: preprocessing.py:110-154)
  norm, _ = preprocessing.norm_for_augname(config.data.get("augname"))

  @jax.jit
  def predict(params, images):
    x = preprocessing.cls_eval_preprocess(images.astype(jnp.float32), isize,
                                          norm=norm)
    return model(params, x, train=False)

  if args.runmode == "bm":
    images = jnp.zeros((args.batch_size, canvas, canvas, 3), jnp.uint8)
    out = predict(params, images)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
      t0 = time.perf_counter()
      for _ in range(args.bm_runs):
        out = predict(params, images)
      jax.block_until_ready(out)
      best = min(best, (time.perf_counter() - t0) / args.bm_runs)
    print(json.dumps({"fps": round(args.batch_size / best, 2),
                      "latency_ms": round(best * 1000, 3)}))
  elif args.runmode == "infer":
    from PIL import Image
    img = Image.open(args.input_image).convert("RGB").resize((canvas, canvas))
    logits = predict(params, jnp.asarray(np.asarray(img))[None])
    top5 = np.argsort(-np.asarray(logits[0]))[:5]
    probs = np.asarray(jax.nn.softmax(logits[0]))
    print(json.dumps({"top5": [[int(i), round(float(probs[i]), 4)]
                               for i in top5]}))
  elif args.runmode == "eval":
    from automl_tpu.data import pipeline
    if config.data.get("multiclass"):
      # ImageNet21k-style multilabel: AUC-PR + precision@1
      # (ref: efficientnetv2/main.py:231-287 tf.metrics.AUC(curve='PR'))
      from automl_tpu.data.datasets import multihot_on_device
      from automl_tpu.eval.classification import MultiLabelEvaluator
      loader = pipeline.MultiLabelTFRecordLoader(
          args.val_file_pattern, is_training=False,
          batch_size=args.batch_size, canvas_size=canvas,
          max_labels=int(config.data.get("max_labels", 16)),
          drop_remainder=False)
      ev = MultiLabelEvaluator()
      for batch in loader:
        logits = predict(params, jnp.asarray(batch["image"]))
        labels = multihot_on_device(jnp.asarray(batch["label_ids"]),
                                    config.data.num_classes)
        ev.add_batch(np.asarray(logits), np.asarray(labels))
        if ev.num_examples >= args.eval_samples:
          break
      print(json.dumps({k: round(v, 4) if isinstance(v, float) else v
                        for k, v in ev.result().items()}))
      return
    loader = pipeline.ImageNetTFRecordLoader(
        args.val_file_pattern, is_training=False,
        batch_size=args.batch_size, canvas_size=canvas,
        num_classes=config.data.num_classes, drop_remainder=False)
    correct = total = 0
    for batch in loader:
      logits = predict(params, jnp.asarray(batch["image"]))
      pred = np.argmax(np.asarray(logits), -1)
      label = np.argmax(batch["label"], -1)
      correct += int((pred == label).sum())
      total += len(pred)
      if total >= args.eval_samples:
        break
    print(json.dumps({"top1": round(correct / max(total, 1), 4),
                      "samples": total}))
  elif args.runmode == "export":
    from jax import export as jax_export
    spec = jax.ShapeDtypeStruct((args.batch_size, canvas, canvas, 3),
                                jnp.uint8)
    exported = jax_export.export(predict)(
        jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params), spec)
    import os
    os.makedirs(args.export_dir, exist_ok=True)
    with open(f"{args.export_dir}/model.stablehlo", "wb") as f:
      f.write(exported.serialize())
    print(json.dumps({"export_dir": args.export_dir}))


if __name__ == "__main__":
  main()
