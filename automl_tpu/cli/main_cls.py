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
  p.add_argument("--mode", default="train",
                 choices=["train", "traineval", "eval"])
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
  p.add_argument("--native_loader", action="store_true",
                 help="use the framework's own C++ parallel input pipeline "
                      "(reader thread + JPEG worker pool + prefetch ring) "
                      "instead of tf.data for --train_file_pattern")
  p.add_argument("--native_workers", type=int, default=4)
  p.add_argument("--val_file_pattern", default=None)
  p.add_argument("--eval_samples", type=int, default=50000)
  p.add_argument("--eval_every", type=int, default=0,
                 help="steps between in-training evals (traineval); "
                      "0 = eval at each progressive-stage boundary")
  p.add_argument("--eval_timeout", type=float, default=0,
                 help="eval mode: watch the ckpt dir and evaluate each new "
                      "checkpoint (ref: efficientnetv2/main.py:388-423). "
                      "0 = evaluate latest once.")
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


def _shard_files(files, proc_id, n_proc):
  """Per-process file shard; ERROR on an empty shard rather than silently
  streaming the whole set (which would duplicate data across processes)."""
  mine = files[proc_id::n_proc]
  if not mine:
    raise ValueError(
        f"process {proc_id}/{n_proc} got no input files from {len(files)} "
        "matches — --native_loader shards by FILE; use at least one file "
        "per process (or the tf.data loader, which shards records)")
  return mine


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
    if args.native_loader:
      import glob as glob_lib
      from automl_tpu.data import native_loader as nl
      files = sorted(glob_lib.glob(args.train_file_pattern))
      data_iter = iter(nl.NativeParallelClassificationLoader(
          _shard_files(files, proc_id, n_proc), local_batch, canvas,
          config.data.num_classes, num_workers=args.native_workers))
    else:
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

  # held-out eval source for traineval / eval modes
  eval_iter = None
  eval_steps = 0
  if args.mode in ("traineval", "eval"):
    eval_batch = int(config.eval.batch_size or batch_size)
    ecanvas = (int(config.eval.isize or runners.resolve_train_size(config))
               + 32)
    if args.val_file_pattern:
      def eval_iter():  # fresh iterator per eval pass
        if config.data.get("multiclass"):
          return iter(pipeline.MultiLabelTFRecordLoader(
              args.val_file_pattern, is_training=False,
              batch_size=eval_batch, canvas_size=ecanvas,
              max_labels=int(config.data.get("max_labels", 16))))
        return iter(pipeline.ImageNetTFRecordLoader(
            args.val_file_pattern, is_training=False, batch_size=eval_batch,
            canvas_size=ecanvas, num_classes=config.data.num_classes))
    elif args.data_dir and spec is not None and "eval" in spec.splits:
      def eval_iter():
        return iter(ds_lib.build_dataset(config, "eval", eval_batch,
                                         canvas_size=ecanvas))
    else:  # synthetic minival (the reference's null-data mode)
      def eval_iter():
        if config.data.get("multiclass"):
          return iter(ds_lib.SyntheticMultiLabel(
              eval_batch, ecanvas, config.data.num_classes,
              int(config.data.get("max_labels", 16))))
        return iter(pipeline.SyntheticClassification(
            eval_batch, ecanvas, config.data.num_classes))
    eval_steps = max(args.eval_samples // eval_batch, 1)

  if args.mode == "eval":
    return _eval_mode(args, config, eval_iter, eval_steps)

  metrics = runners.run_classification(
      config, args.model_dir, train_steps, mesh_shape=mesh_shape,
      data_iter=data_iter, eval_iter=eval_iter, eval_steps=eval_steps,
      eval_every=args.eval_every, seed=args.seed)
  print({k: round(v, 4) for k, v in metrics.items()})
  return metrics


def _build_eval_state_template(config, model):
  """Zero-filled TrainState matching run_classification's training state."""
  import jax
  import jax.numpy as jnp
  from automl_tpu.train import optimizers as opt_lib
  from automl_tpu.train import schedules, train_lib
  params = jax.eval_shape(model.init, jax.random.key(0))
  template = jax.tree_util.tree_map(
      lambda s: jnp.zeros(s.shape, s.dtype), params)
  tx = opt_lib.masked_for_params(
      opt_lib.build_optimizer(config.train.optimizer, lambda step: 0.0),
      template)
  return train_lib.create_train_state(template, tx,
                                      ema=bool(config.train.ema_decay))


def _eval_mode(args, config, eval_iter, eval_steps):
  """Standalone / continuous classification eval: evaluate the latest (or
  each new) checkpoint in model_dir (ref: efficientnetv2/main.py:388-423
  ckpt-watcher eval loop)."""
  from automl_tpu import nn
  from automl_tpu.models import build_model
  from automl_tpu.train import runners
  from automl_tpu.train.checkpoint import CheckpointManager
  nn.set_policy("mixed_bfloat16" if config.runtime.mixed_precision
                else "float32")
  model = build_model(config.model)
  mngr = CheckpointManager(f"{args.model_dir}/ckpt")
  template = _build_eval_state_template(config, model)

  def eval_step_num(step):
    try:
      state = mngr.restore(template, step=step)
    except (FileNotFoundError, ValueError) as e:
      print(f"checkpoint {step} vanished, skipping: {e}")
      return None
    if state is None:
      return None
    m = runners.evaluate_classification(
        model, state.ema_params or state.params, config, eval_iter(),
        eval_steps)
    print(f"step {step}:", {k: round(float(v), 4) for k, v in m.items()})
    return m

  if args.eval_timeout:
    from automl_tpu.train.checkpoint import watch_checkpoints
    metrics = None
    for step in watch_checkpoints(mngr.directory,
                                  timeout_secs=args.eval_timeout):
      metrics = eval_step_num(step) or metrics
    if metrics is None:
      raise FileNotFoundError(f"no checkpoint in {args.model_dir}/ckpt")
    return metrics
  metrics = eval_step_num(mngr.latest_step())
  if metrics is None:
    raise FileNotFoundError(f"no checkpoint in {args.model_dir}/ckpt")
  return metrics


if __name__ == "__main__":
  main()
