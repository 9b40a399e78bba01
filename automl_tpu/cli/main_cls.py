"""EfficientNet/V2 classification train CLI (the reference's efficientnetv2/main.py).

Examples:
  python -m automl_tpu.cli.main_cls --model_name=efficientnetv2-b0 \
    --model_dir=/tmp/b0 --train_steps=100 \
    --hparam_str="train.batch_size=16,data.ds_name=null"
"""

from __future__ import annotations

import argparse


def parse_args(argv=None):
  p = argparse.ArgumentParser(description=__doc__)
  p.add_argument("--mode", default="train", choices=["train", "traineval"])
  p.add_argument("--model_name", default="efficientnetv2-b0")
  p.add_argument("--model_dir", required=True)
  p.add_argument("--hparam_str", default="")
  p.add_argument("--dataset", default=None,
                 help="dataset config name (ImageNet, ImageNet21k, "
                      "ImagenetFt, Cifar10Ft, Cifar100Ft, FlowersFt, "
                      "TFFlowersFt, CarsFt)")
  p.add_argument("--data_dir", default=None,
                 help="TFRecord dir for --dataset (None = synthetic)")
  p.add_argument("--train_file_pattern", default=None)
  p.add_argument("--ft_init_ckpt", default=None,
                 help="published TF ckpt to finetune from (head reinit)")
  p.add_argument("--train_steps", type=int, default=0)
  p.add_argument("--mesh_shape", default=None)
  p.add_argument("--coordinator_address", default=None,
                 help="host:port for jax.distributed multi-process runs")
  p.add_argument("--num_processes", type=int, default=None)
  p.add_argument("--process_id", type=int, default=None)
  p.add_argument("--compilation_cache_dir", default=None,
                 help="persistent XLA compile cache; 'auto' = ~/.cache/automl_tpu/xla")
  p.add_argument("--seed", type=int, default=0)
  return p.parse_args(argv)


def main(argv=None):
  args = parse_args(argv)
  # must run before any jax backend use (multi-process runs only)
  from automl_tpu.parallel import distributed
  distributed.initialize(args.coordinator_address, args.num_processes,
                         args.process_id)
  if args.compilation_cache_dir:
    from automl_tpu.utils import enable_compilation_cache
    enable_compilation_cache(None if args.compilation_cache_dir == "auto"
                             else args.compilation_cache_dir)
  from automl_tpu.configs.effnet_configs import get_model_config
  from automl_tpu.data import pipeline
  from automl_tpu.train import runners

  config = get_model_config(args.model_name)
  if args.dataset:
    # config layering: model config <- dataset config <- hparam_str
    # (ref: efficientnetv2/main.py:319-323)
    from automl_tpu.data import datasets as ds_lib
    config.override(ds_lib.get_dataset_config(args.dataset).as_dict(),
                    allow_new_keys=True)
  config.override(args.hparam_str)
  if args.ft_init_ckpt:
    config.train.ft_init_ckpt = args.ft_init_ckpt
  if args.data_dir:
    config.data.data_dir = args.data_dir
  batch_size = int(config.train.batch_size)
  from automl_tpu.data import datasets as ds_lib
  spec = ds_lib.DATASETS.get(config.data.ds_name)
  num_images = (spec.splits["train"].num_images if spec else 1_281_167)
  steps_per_epoch = max(num_images // batch_size, 1)
  train_steps = args.train_steps or max(
      config.train.epochs * steps_per_epoch,
      int(config.train.get("min_steps") or 0))
  mesh_shape = (tuple(int(x) for x in args.mesh_shape.split(","))
                if args.mesh_shape else None)

  # Multi-process: global batch split across processes, per-host file shards
  # (PER_HOST_V2 analog, ref: efficientnetv2/datasets.py:336-374).
  import jax
  n_proc, proc_id = jax.process_count(), jax.process_index()
  local_batch = batch_size // max(n_proc, 1)

  data_iter = None
  if args.train_file_pattern and config.data.ds_name != "null":
    canvas = int(runners.resolve_train_size(config) * 1.15) // 2 * 2
    data_iter = iter(pipeline.ImageNetTFRecordLoader(
        args.train_file_pattern, is_training=True, batch_size=local_batch,
        canvas_size=canvas, num_classes=config.data.num_classes,
        shard_index=proc_id, num_shards=n_proc))
  elif args.data_dir and spec is not None:
    canvas = int(runners.resolve_train_size(config) * 1.15) // 2 * 2
    data_iter = iter(ds_lib.build_dataset(config, "train", local_batch,
                                          canvas_size=canvas,
                                          shard_index=proc_id,
                                          num_shards=n_proc))

  metrics = runners.run_classification(
      config, args.model_dir, train_steps, mesh_shape=mesh_shape,
      data_iter=data_iter, seed=args.seed)
  print({k: round(v, 4) for k, v in metrics.items()})
  return metrics


if __name__ == "__main__":
  main()
