"""EfficientDet train/eval CLI (the reference's efficientdet/main.py + tf2/train.py).

Examples:
  python -m automl_tpu.cli.main_det --mode=train --model_name=efficientdet-d0 \
    --model_dir=/tmp/d0 --train_steps=200 --hparams="batch_size=8"
  python -m automl_tpu.cli.main_det --mode=train --use_fake_data ...
"""

from __future__ import annotations

import argparse


def parse_args(argv=None):
  p = argparse.ArgumentParser(description=__doc__)
  p.add_argument("--mode", default="train",
                 choices=["train", "eval", "train_and_eval"])
  p.add_argument("--model_name", default="efficientdet-d0")
  p.add_argument("--model_dir", required=True)
  p.add_argument("--hparams", default="",
                 help="k=v,k2.k3=v override string or YAML path")
  p.add_argument("--train_file_pattern", default=None)
  p.add_argument("--val_file_pattern", default=None)
  p.add_argument("--use_fake_data", action="store_true")
  p.add_argument("--train_steps", type=int, default=0,
                 help="0 -> num_epochs * num_examples_per_epoch / batch_size")
  p.add_argument("--num_examples_per_epoch", type=int, default=120000)
  p.add_argument("--eval_samples", type=int, default=5000)
  p.add_argument("--native_loader", action="store_true",
                 help="use the framework's own C++ parallel input pipeline "
                      "(TFRecord reader thread + JPEG worker pool + "
                      "prefetch ring; gt parsing in C++) instead of tf.data")
  p.add_argument("--native_workers", type=int, default=4)
  p.add_argument("--eval_every", type=int, default=0,
                 help="steps between in-training evals (train_and_eval)")
  p.add_argument("--testdev_dir", default=None,
                 help="eval mode: skip ground truth and write the COCO-server "
                      "submission JSON (detections_test-dev2017_*_results."
                      "json) into this directory instead of computing AP "
                      "(ref: efficientdet/coco_metric.py:119-133, "
                      "main.py testdev_dir flag)")
  p.add_argument("--eval_timeout", type=float, default=0,
                 help="eval mode: watch the ckpt dir and evaluate each new "
                      "checkpoint until this many seconds pass with no new "
                      "one (ref: main.py:303-327). 0 = evaluate latest once.")
  p.add_argument("--mesh_shape", default=None,
                 help="e.g. 1,8,1 for (replica, data, model); model>1 enables "
                      "spatial partitioning of image H")
  p.add_argument("--init_backbone_ckpt", default=None,
                 help="published TF EfficientNet ckpt to warm-start backbone")
  p.add_argument("--profile", action="store_true",
                 help="capture an xprof trace of steps 10-14 into model_dir")
  p.add_argument("--run_epoch_in_child_process", action="store_true",
                 help="run each epoch in a fresh child interpreter "
                      "(contains host-memory leaks; nonzero exits "
                      "propagate; each child resumes from the latest "
                      "checkpoint; train_and_eval adds a per-epoch eval "
                      "child. ref: efficientdet/main.py:113-117, 352-357)")
  p.add_argument("--coordinator_address", default=None,
                 help="host:port for jax.distributed multi-process runs")
  p.add_argument("--num_processes", type=int, default=None)
  p.add_argument("--process_id", type=int, default=None)
  p.add_argument("--compilation_cache_dir", default=None,
                 help="persistent XLA compile cache; 'auto' = ~/.cache/automl_tpu/xla")
  p.add_argument("--seed", type=int, default=0)
  return p.parse_args(argv)


def build_eval_state_template(config, model):
  """Zero-filled TrainState matching the TRAINING state structure exactly
  (optimizer state chain, EMA, moving normalizer) — StandardRestore raises
  a tree-mismatch ValueError otherwise, which the vanished-checkpoint
  tolerance would silently swallow."""
  import jax
  import jax.numpy as jnp
  from automl_tpu.train import optimizers as opt_lib
  from automl_tpu.train import train_lib
  params = jax.eval_shape(model.init, jax.random.key(0))
  template = jax.tree_util.tree_map(
      lambda s: jnp.zeros(s.shape, s.dtype), params)
  tx = opt_lib.masked_for_params(
      opt_lib.build_optimizer(
          config.optimizer if config.optimizer != "sgd" else "momentum",
          lambda step: 0.0, momentum=config.momentum), template)
  return train_lib.create_train_state(
      template, tx, ema=bool(config.moving_average_decay),
      moving_normalizer=(config.get("positives_momentum", 0.0) or 0.0) > 0)


def _run_epochs_in_children(args):
  """One child process per epoch: each child re-execs this CLI with the
  epoch's cumulative step budget and exits, so host-memory leaks die with
  it; training resumes from the latest checkpoint each time — the contract
  the reference's Estimator child relies on (ref: efficientdet/main.py:
  113-117, 352-357). The parent NEVER touches the JAX backend (config
  arithmetic only) so the children can own the accelerator; in
  train_and_eval mode each epoch is followed by an eval-mode child
  (ref: main.py:329-360 per-epoch eval)."""
  import subprocess
  import sys
  from automl_tpu.configs.efficientdet_configs import get_efficientdet_config
  config = get_efficientdet_config(args.model_name)
  config.override(args.hparams)
  batch_size = int(config.batch_size)
  train_steps = args.train_steps or (
      config.num_epochs * args.num_examples_per_epoch // batch_size)
  steps_per_epoch = max(args.num_examples_per_epoch // batch_size, 1)
  epoch_ends = list(range(steps_per_epoch, train_steps, steps_per_epoch))
  epoch_ends.append(train_steps)

  def flags(extra):
    out = [sys.executable, "-m", "automl_tpu.cli.main_det",
           f"--model_dir={args.model_dir}",
           f"--model_name={args.model_name}", f"--seed={args.seed}",
           f"--num_examples_per_epoch={args.num_examples_per_epoch}"]
    for name in ("hparams", "train_file_pattern", "val_file_pattern",
                 "mesh_shape", "init_backbone_ckpt", "coordinator_address",
                 "num_processes", "process_id", "compilation_cache_dir"):
      v = getattr(args, name)
      if v is not None and v != "":
        out.append(f"--{name}={v}")
    if args.use_fake_data:
      out.append("--use_fake_data")
    return out + extra

  do_eval = args.mode == "train_and_eval" and args.val_file_pattern
  for end in epoch_ends:
    rc = subprocess.call(flags(["--mode=train", f"--train_steps={end}"]))
    if rc != 0:
      raise SystemExit(rc)  # propagate (ref: main.py:355-357)
    if do_eval:
      rc = subprocess.call(flags(
          ["--mode=eval", f"--eval_samples={args.eval_samples}"]))
      if rc != 0:
        raise SystemExit(rc)
  return {"train_steps": float(train_steps)}


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
  if args.run_epoch_in_child_process:
    # handled before ANY jax/distributed use — the parent must not hold
    # the accelerator or the coordinator port its children need
    return _run_epochs_in_children(args)
  # must run before any jax backend use (multi-process runs only)
  from automl_tpu.parallel import distributed
  distributed.initialize(args.coordinator_address, args.num_processes,
                         args.process_id)
  if args.compilation_cache_dir:
    from automl_tpu.utils import enable_compilation_cache
    enable_compilation_cache(None if args.compilation_cache_dir == "auto"
                             else args.compilation_cache_dir)
  from automl_tpu.configs.efficientdet_configs import get_efficientdet_config
  from automl_tpu.data import pipeline
  from automl_tpu.train import runners
  from automl_tpu.utils import parse_image_size

  config = get_efficientdet_config(args.model_name)
  config.override(args.hparams)
  batch_size = int(config.batch_size)
  # Multi-process: config.batch_size is GLOBAL; each process reads its own
  # file shard and feeds batch_size/process_count rows
  # (PER_HOST_V2 analog, ref: efficientdet/main.py:253 + dataloader.py:418).
  import jax
  n_proc, proc_id = jax.process_count(), jax.process_index()
  local_batch = batch_size // max(n_proc, 1)
  train_steps = args.train_steps or (
      config.num_epochs * args.num_examples_per_epoch // batch_size)
  mesh_shape = (tuple(int(x) for x in args.mesh_shape.split(","))
                if args.mesh_shape else None)
  size = parse_image_size(config.image_size)

  def make_train_iter():
    if args.train_file_pattern and not args.use_fake_data:
      if args.native_loader:
        import glob as glob_lib
        from automl_tpu.data import native_loader as nl
        files = sorted(glob_lib.glob(args.train_file_pattern))
        return iter(nl.NativeParallelDetectionLoader(
            _shard_files(files, proc_id, n_proc), local_batch, size[0],
            max_instances=config.max_instances_per_image,
            skip_crowd=config.skip_crowd_during_training,
            num_workers=args.native_workers))
      return iter(pipeline.DetectionTFRecordLoader(
          args.train_file_pattern, is_training=True, batch_size=local_batch,
          canvas_size=size[0],
          max_instances=config.max_instances_per_image,
          skip_crowd_during_training=config.skip_crowd_during_training,
          shard_index=proc_id, num_shards=n_proc))
    return None

  train_iter = make_train_iter()

  eval_iter = None
  eval_steps = 0
  eval_every = args.eval_every
  if args.mode == "train_and_eval" and not eval_every:
    eval_every = max(args.num_examples_per_epoch // batch_size, 1)
  if args.mode in ("eval", "train_and_eval") and args.val_file_pattern:
    def eval_iter():  # fresh iterator per eval pass
      return iter(pipeline.DetectionTFRecordLoader(
          args.val_file_pattern, is_training=False, batch_size=local_batch,
          canvas_size=size[0], max_instances=config.max_instances_per_image,
          shard_index=proc_id, num_shards=n_proc))
    eval_steps = max(args.eval_samples // batch_size, 1)

  if args.mode == "eval":
    from automl_tpu import nn
    from automl_tpu.models.efficientdet import EfficientDet
    from automl_tpu.train.checkpoint import CheckpointManager
    nn.set_policy("mixed_bfloat16" if config.mixed_precision else "float32")
    model = EfficientDet(config)
    mngr = CheckpointManager(f"{args.model_dir}/ckpt")
    state_template = build_eval_state_template(config, model)

    def eval_step_num(step):
      try:
        state = mngr.restore(state_template, step=step)
      except (FileNotFoundError, ValueError) as e:
        # the trainer may garbage-collect a checkpoint mid-eval
        # (ref: main.py:320-326 NotFoundError tolerance)
        print(f"checkpoint {step} vanished, skipping: {e}")
        return None
      if state is None:
        return None
      m = runners.evaluate_detection(
          model, state.ema_params or state.params, config, eval_iter(),
          eval_steps, testdev_dir=args.testdev_dir)
      print(f"step {step}:", {k: (round(v, 4) if isinstance(v, float) else v)
                              for k, v in m.items()})
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

  metrics = runners.run_detection(
      config, args.model_dir, train_steps, mesh_shape=mesh_shape,
      data_iter=train_iter, eval_iter=eval_iter, eval_steps=eval_steps,
      eval_every=eval_every if args.mode == "train_and_eval" else 0,
      init_backbone_ckpt=args.init_backbone_ckpt, profile=args.profile,
      seed=args.seed)
  print({k: round(v, 4) for k, v in metrics.items()})
  return metrics


if __name__ == "__main__":
  main()
