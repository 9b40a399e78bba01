"""High-level training runners: classification (with progressive learning) and
detection (with COCO eval) — the TPU-native equivalents of the reference's
trainer entry points.

Parity refs:
  progressive stage loop    efficientnetv2/main.py:441-496 (per-stage image
                            size / randaug magnitude / mixup-cutmix ramps;
                            the reference rebuilds a TPUEstimator per stage,
                            we just re-jit at the stage's static image size)
  train driver / eval loop  efficientdet/main.py:237-360, tf2/train.py:277-319
  config snapshot           efficientdet/main.py:233-235

Everything except TFRecord reading runs on device: preprocessing, mixing,
anchor labeling, losses, optimizer, EMA, metrics.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from automl_tpu import nn
from automl_tpu.data import augment, pipeline, preprocessing
from automl_tpu.parallel import create_mesh, shard_batch, replicate
from automl_tpu.train import optimizers as opt_lib
from automl_tpu.train import schedules, train_lib
from automl_tpu.train import checkpoint as ckpt_lib
from automl_tpu.train.checkpoint import CheckpointManager, archive_ckpt


# jitted eval predict fns, keyed by (model, ...): entries live as long as
# the model object — one per run, reused across its periodic evals
_EVAL_PREDICT_CACHE: dict = {}


def resolve_train_size(config) -> int:
  """train.isize <= 16 is a FRACTION of eval.isize (ref: main.py:325-328)."""
  esize = config.eval.isize or config.train.isize
  tsize = float(config.train.isize or esize)
  if tsize <= 16.0:
    tsize = int(float(esize) * tsize) // 16 * 16
  return int(tsize)


def _progressive_stage_params(config, stage: int, total_stages: int):
  """Per-stage (image_size, ram, mixup, cutmix) ramps (main.py:470-480)."""
  target = resolve_train_size(config)
  ibase = int(config.data.ibase or target)
  if total_stages <= 1:
    return target, config.data.ram, config.data.mixup_alpha, config.data.cutmix_alpha
  ratio = float(stage + 1) / total_stages
  size = int(round(ibase + (target - ibase) * ratio))
  size = (size // 8) * 8  # keep conv shapes tidy for XLA tiling
  ram = config.data.ram * (stage + 1) / total_stages
  mix = config.data.mixup_alpha * (stage + 1) / total_stages
  cut = config.data.cutmix_alpha * (stage + 1) / total_stages
  return size, ram, mix, cut


def run_classification(config, model_dir: str, train_steps: int,
                       mesh_shape=None, data_iter=None, log_every: int = 50,
                       eval_iter=None, eval_steps: int = 0,
                       eval_every: int = 0, seed: int = 0) -> dict:
  """Train an EfficientNet classifier; returns final metrics.

  data_iter: optional host iterator of {'image': uint8 canvas, 'label'};
  defaults to synthetic data (the reference's data_dir='null' mode).
  eval_iter: iterator (or zero-arg factory returning a fresh iterator) of
  held-out batches; with eval_steps set, runs a minival eval at the end of
  every progressive stage (or every eval_every steps) writing eval/* metrics
  and archiving the best checkpoint by objective — the train_and_eval parity
  path (ref: efficientnetv2/main.py:229-289, 441-496 traineval stage loop).
  """
  from automl_tpu.models import build_model
  os.makedirs(model_dir, exist_ok=True)
  config.save_to_yaml(os.path.join(model_dir, "config.yaml"))
  nn.set_policy("mixed_bfloat16" if config.runtime.mixed_precision
                else "float32")
  if config.train.get("qat"):
    # train-time QAT: fake-quant weights/activations inside the jitted step
    # (ref capability: efficientdet/tf2/tfmot.py:23)
    nn.enable_qat(int(config.train.get("qat_bits", 8) or 8))
  else:
    nn.disable_qat()  # QAT mode is trace-time state: never inherit it

  model = build_model(config.model)
  params = jax.jit(model.init)(jax.random.key(seed))
  ft_ckpt = config.train.get("ft_init_ckpt")
  if ft_ckpt:
    # finetune: restore everything except the classifier head
    # (ref: efficientnetv2/main.py:296-305, main_tf2.py:176-179)
    from automl_tpu.ckpt import tf_compat
    params = tf_compat.convert_effnet_checkpoint(
        ft_ckpt, model, params=params,
        use_ema=bool(config.train.get("ft_init_ema", True)),
        strict=False, exclude_prefixes=(("head", "fc"),))

  batch_size = int(config.train.batch_size)
  # per-process rows for synthetic fallbacks (shard_batch reassembles)
  local_batch = batch_size // max(jax.process_count(), 1)
  steps_per_epoch = max(train_steps // max(config.train.epochs, 1), 1)
  lr_fn = schedules.warmup_lr(
      config.train.lr_sched, config.train.lr_base,
      steps_per_epoch=steps_per_epoch, total_steps=train_steps,
      warmup_epochs=config.train.lr_warmup_epoch,
      decay_epochs=config.train.lr_decay_epoch,
      decay_factor=config.train.lr_decay_factor,
      minimal_lr=config.train.lr_min)
  tx = opt_lib.masked_for_params(
      opt_lib.build_optimizer(config.train.optimizer, lr_fn), params)
  state = train_lib.create_train_state(params, tx,
                                       ema=bool(config.train.ema_decay))

  mesh = create_mesh(mesh_shape) if mesh_shape else None
  if mesh:
    state = replicate(mesh, state)

  mngr = CheckpointManager(os.path.join(model_dir, "ckpt"),
                           max_to_keep=config.runtime.keep_checkpoint_max)
  restored = mngr.restore(state)
  if restored is not None:
    state = restored

  total_stages = max(int(config.train.stages or 0), 1)
  stage_steps = train_steps // total_stages
  rng = jax.random.key(seed + 1)
  metrics = {}
  t0 = time.perf_counter()
  step = int(jax.device_get(state.step))

  from automl_tpu.train.metrics import MetricsWriter
  writer = MetricsWriter(model_dir)
  objective_key = ("auc_pr" if config.data.get("multiclass") else "top1")

  def run_eval(at_step):
    """Minival eval + metrics + best-ckpt archive by objective."""
    eval_params = state.ema_params or state.params
    fresh = eval_iter() if callable(eval_iter) else eval_iter
    em = evaluate_classification(model, eval_params, config, fresh,
                                 eval_steps, mesh=mesh)
    writer.write(at_step, {f"eval/{k}": v for k, v in em.items()})
    print(f"eval @ {at_step}: " +
          " ".join(f"{k} {v:.4f}" for k, v in em.items()))
    if em.get(objective_key, -1) >= 0:
      archive_ckpt(model_dir, at_step, em[objective_key], mngr)
    return em

  for stage in range(total_stages):
    isize, ram, mixup_a, cutmix_a = _progressive_stage_params(
        config, stage, total_stages)
    augname = config.data.augname

    def preprocess(batch, rng, isize=isize, ram=ram, mixup_a=mixup_a,
                   cutmix_a=cutmix_a):
      k1, k2 = jax.random.split(rng)
      images = preprocessing.cls_train_preprocess(
          batch["image"], k1, isize, augname=augname,
          ra_num_layers=config.data.ra_num_layers, ra_magnitude=ram)
      if "label_ids" in batch:
        # multiclass (ImageNet21k): padded id lists -> dense multi-hot on
        # device (ref host path: datasets.py:493-498)
        from automl_tpu.data import datasets as ds_lib
        labels = ds_lib.multihot_on_device(batch["label_ids"],
                                           config.data.num_classes)
      else:
        labels = batch["label"]
      if mixup_a or cutmix_a:
        images, labels = augment.mixing(images, labels, k2, mixup_a, cutmix_a)
      return {"image": images, "label": labels}

    step_fn = jax.jit(train_lib.make_cls_train_step(
        model, tx, config, preprocess_fn=preprocess))

    if data_iter is not None:
      it = data_iter
    elif config.data.get("multiclass"):
      from automl_tpu.data import datasets as ds_lib
      it = iter(ds_lib.SyntheticMultiLabel(
          local_batch, int(isize * 1.15) // 2 * 2, config.data.num_classes,
          int(config.data.get("max_labels", 16))))
    else:
      it = iter(pipeline.SyntheticClassification(
          local_batch, int(isize * 1.15) // 2 * 2, config.data.num_classes))
    stage_end = min((stage + 1) * stage_steps, train_steps)
    while step < stage_end:
      batch = next(it)
      batch = {k: jnp.asarray(v) for k, v in batch.items()}
      if mesh:
        batch = shard_batch(mesh, batch)
      state, metrics = step_fn(state, batch, rng)
      step += 1
      if step % log_every == 0 or step == stage_end:
        m = {k: float(v) for k, v in jax.device_get(metrics).items()}
        rate = step * batch_size / (time.perf_counter() - t0)
        writer.write(step, m)
        print(f"step {step} stage {stage} isize {isize} "
              f"loss {m['loss']:.4f} top1 {m['top1']:.3f} "
              f"({rate:.1f} img/s)")
      if (eval_every and eval_iter is not None and eval_steps
          and step % eval_every == 0 and step < stage_end):
        mngr.save(step, ckpt_lib.state_for_save(state))
        metrics = dict(metrics)
        metrics.update({f"eval/{k}": v for k, v in run_eval(step).items()})
    mngr.save(step, ckpt_lib.state_for_save(state))
    # per-stage minival eval (the reference evals between progressive
    # stages and continuously; ref: efficientnetv2/main.py:441-496)
    if eval_iter is not None and eval_steps:
      metrics = dict(metrics)
      metrics.update({f"eval/{k}": v for k, v in run_eval(step).items()})
  writer.close()
  mngr.wait_until_finished()
  return {k: float(v) for k, v in jax.device_get(metrics).items()}


def evaluate_classification(model, params, config, eval_iter, eval_steps: int,
                            mesh=None) -> dict:
  """Held-out classification eval inside/after training.

  Single-label: top-1/top-5 accuracy; multiclass (ImageNet21k): micro AUC-PR
  + precision@1 via eval/classification.py. The eval-resolution center-crop
  preprocess and norm family match serving (cli/infer_cls.py).
  Ref: efficientnetv2/main.py:229-289 (eval metric_fn) — the reference's
  traineval mode, which round 2 left as a dead flag.

  Multi-process: pass the training mesh; local rows are assembled into
  global arrays and every process accumulates the same global metric.
  """
  from automl_tpu.data import preprocessing
  isize = int(config.eval.isize or resolve_train_size(config))
  norm, _ = preprocessing.norm_for_augname(config.data.get("augname"))
  multiclass = bool(config.data.get("multiclass"))
  num_classes = int(config.data.num_classes or config.model.num_classes)

  nproc = jax.process_count()
  multiproc = nproc > 1
  if multiproc and mesh is None:
    raise ValueError(
        "multi-process eval needs the training mesh (mesh=...) to assemble "
        "local eval batches into global arrays against sharded params")

  def _predict(params, images):
    x = preprocessing.cls_eval_preprocess(images.astype(jnp.float32), isize,
                                          norm=norm)
    return model(params, x, train=False)

  # cache the jitted predict across eval passes: in-training evals run
  # every stage/interval and a fresh jax.jit would retrace + recompile the
  # full forward each time (minutes on this host, CLAUDE.md)
  key = (model, isize, norm, multiproc, mesh)
  predict = _EVAL_PREDICT_CACHE.get(key)
  if predict is None:
    if multiproc:
      from jax.sharding import NamedSharding, PartitionSpec
      predict = jax.jit(_predict,
                        out_shardings=NamedSharding(mesh, PartitionSpec()))
    else:
      predict = jax.jit(_predict)
    _EVAL_PREDICT_CACHE[key] = predict

  if multiclass:
    from automl_tpu.data.datasets import multihot_on_device
    from automl_tpu.eval.classification import MultiLabelEvaluator
    ev = MultiLabelEvaluator()
  top1 = top5 = total = 0
  for _ in range(eval_steps):
    try:
      batch = next(eval_iter)
    except StopIteration:
      break  # finite validation set smaller than eval_samples: partial pass
    images = jnp.asarray(batch["image"])
    if multiclass:
      labels = np.asarray(multihot_on_device(jnp.asarray(batch["label_ids"]),
                                             num_classes))
    else:
      labels = np.asarray(batch["label"])
      if labels.ndim > 1:  # one-hot -> ids
        labels = np.argmax(labels, -1)
    if multiproc:
      from automl_tpu.parallel.distributed import build_global_array
      from jax.experimental import multihost_utils
      images = build_global_array(images, mesh)
      labels = multihost_utils.process_allgather(labels, tiled=True)
    logits = np.asarray(predict(params, images))
    if multiclass:
      ev.add_batch(logits, labels)
    else:
      order = np.argsort(-logits, axis=-1)
      top1 += int((order[:, 0] == labels).sum())
      top5 += int((order[:, :5] == labels[:, None]).any(-1).sum())
      total += len(labels)
  if multiclass:
    return ev.result()
  return {"top1": top1 / max(total, 1), "top5": top5 / max(total, 1),
          "samples": float(total)}


def run_detection(config, model_dir: str, train_steps: int,
                  mesh_shape=None, data_iter=None, eval_iter=None,
                  eval_steps: int = 0, eval_every: int = 0,
                  log_every: int = 50, ckpt_every: int = 0,
                  init_backbone_ckpt=None, init_backbone_ema: bool = True,
                  profile: bool = False, seed: int = 0) -> dict:
  """Train EfficientDet; optional COCO eval at the end. Returns metrics.

  init_backbone_ckpt: published TF EfficientNet checkpoint to warm-start the
  backbone from (ref: det_model_fn.py:518-548 ckpt_var_scope restore).
  eval_iter: an iterator (single final eval) or a zero-arg factory returning
  a fresh iterator (required for eval_every in-training evals).
  ckpt_every: periodic async checkpoint interval in steps, the reference's
  save_checkpoints_steps (efficientdet/main.py:261); 0 = end/eval-only.
  """
  from automl_tpu.models.efficientdet import EfficientDet
  os.makedirs(model_dir, exist_ok=True)
  config.save_to_yaml(os.path.join(model_dir, "config.yaml"))
  nn.set_policy("mixed_bfloat16" if config.mixed_precision else "float32")
  if config.get("qat"):
    nn.enable_qat(int(config.get("qat_bits", 8) or 8))
  else:
    nn.disable_qat()  # QAT mode is trace-time state: never inherit it

  model = EfficientDet(config)
  params = jax.jit(model.init)(jax.random.key(seed))
  if init_backbone_ckpt:
    from automl_tpu.ckpt import tf_compat
    params = dict(params)
    params["backbone"] = tf_compat.convert_effnet_checkpoint(
        init_backbone_ckpt, model.backbone, params=params["backbone"],
        use_ema=init_backbone_ema, scope=config.backbone_name, strict=False)
  batch_size = int(config.batch_size)
  steps_per_epoch = max(train_steps // max(config.num_epochs, 1), 1)
  lr_fn = schedules.detection_lr(config, steps_per_epoch)
  tx = opt_lib.masked_for_params(
      opt_lib.build_optimizer(
          config.optimizer if config.optimizer != "sgd" else "momentum",
          lr_fn, momentum=config.momentum), params)
  state = train_lib.create_train_state(
      params, tx, ema=bool(config.moving_average_decay),
      moving_normalizer=(config.get("positives_momentum", 0.0) or 0.0) > 0)

  mesh = create_mesh(mesh_shape) if mesh_shape else None
  spatial = bool(mesh) and mesh.shape.get("model", 1) > 1
  if mesh:
    state = replicate(mesh, state)

  mngr = CheckpointManager(os.path.join(model_dir, "ckpt"))
  restored = mngr.restore(state)
  if restored is not None:
    state = restored

  from automl_tpu.utils import parse_image_size
  size = parse_image_size(config.image_size)

  aa_policy = config.get("autoaugment_policy")
  use_gridmask = bool(config.get("grid_mask"))

  def preprocess(batch, rng):
    images = batch["image"].astype(jnp.float32)
    boxes, classes = batch["gt_boxes"], batch["gt_classes"]
    if aa_policy:  # box-aware AutoAugment before geometric jitter
      from automl_tpu.data import det_autoaugment
      keys = jax.random.split(jax.random.fold_in(rng, 7), images.shape[0])
      images, boxes, classes = jax.vmap(
          lambda i, b, c, k: det_autoaugment.distort_image_with_autoaugment(
              i, b, c, k, aa_policy))(images, boxes, classes, keys)
    if use_gridmask:
      keys = jax.random.split(jax.random.fold_in(rng, 11), images.shape[0])
      images = jax.vmap(lambda i, k: augment.gridmask(i, k))(images, keys)
    keys = jax.random.split(rng, images.shape[0])
    imgs, boxes, classes = jax.vmap(
        lambda im, b, c, hw, k: preprocessing.det_train_preprocess(
            im, b, c, k, size[0], true_hw=hw,
            jitter_min=config.jitter_min, jitter_max=config.jitter_max,
            rand_hflip=config.input_rand_hflip,
            mean=config.mean_rgb, stddev=config.stddev_rgb))(
                images, boxes, classes, batch["true_hw"], keys)
    return {"image": imgs, "gt_boxes": boxes, "gt_classes": classes}

  step_fn = jax.jit(train_lib.make_det_train_step(
      model, tx, config, preprocess_fn=preprocess))

  # Multi-process: each process feeds batch_size/process_count rows;
  # shard_batch assembles them into the global array.
  local_batch = batch_size // max(jax.process_count(), 1)
  it = data_iter if data_iter is not None else iter(
      pipeline.SyntheticDetection(local_batch, size[0],
                                  config.max_instances_per_image,
                                  config.num_classes))
  rng = jax.random.key(seed + 1)
  from automl_tpu.train.metrics import MetricsWriter, StepTimer
  writer = MetricsWriter(model_dir)
  timer = StepTimer(log_every)
  metrics = {}
  step = int(jax.device_get(state.step))
  profile_ctx = None
  while step < train_steps:
    batch = next(it)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    if mesh:
      batch = shard_batch(mesh, batch)
      if spatial:
        # spatial partitioning: shard image H over the 'model' axis
        # (GSPMD replaces TPUEstimator input_partition_dims,
        #  ref: efficientdet/main.py:155-194)
        from jax.sharding import NamedSharding, PartitionSpec
        batch["image"] = jax.device_put(
            batch["image"],
            NamedSharding(mesh, PartitionSpec(("replica", "data"), "model")))
    if profile and step == 10:
      profile_ctx = jax.profiler.trace(os.path.join(model_dir, "profile"))
      profile_ctx.__enter__()
    with jax.profiler.StepTraceAnnotation("train", step_num=step):
      state, metrics = step_fn(state, batch, rng)
    if profile and step == 14 and profile_ctx is not None:
      jax.block_until_ready(metrics["loss"])
      profile_ctx.__exit__(None, None, None)
      profile_ctx = None
    step += 1
    if ckpt_every and step % ckpt_every == 0 and step < train_steps:
      mngr.save(step, ckpt_lib.state_for_save(state))
    rates = timer.tick(batch_size)
    if step % log_every == 0 or step == train_steps:
      m = {k: float(v) for k, v in jax.device_get(metrics).items()}
      if rates:
        m.update(rates)
      writer.write(step, m)
      print(f"step {step} loss {m['loss']:.4f} cls {m['cls_loss']:.4f} "
            f"box {m['box_loss']:.5f} "
            f"({m.get('examples_per_sec', 0):.1f} img/s)")
    # per-epoch eval + best-ckpt archive (ref: main.py train_and_eval loop,
    # utils.archive_ckpt)
    if (eval_every and eval_iter is not None and eval_steps
        and (step % eval_every == 0 or step == train_steps)):
      mngr.save(step, ckpt_lib.state_for_save(state))
      eval_params = state.ema_params or state.params
      fresh = eval_iter() if callable(eval_iter) else eval_iter
      em = evaluate_detection(model, eval_params, config, fresh, eval_steps,
                              vis_dir=os.path.join(model_dir, "vis",
                                                   f"step_{step}"),
                              mesh=mesh)
      writer.write(step, {f"eval/{k}": v for k, v in em.items()})
      print(f"eval @ {step}: AP {em.get('AP', -1):.4f} "
            f"AP50 {em.get('AP50', -1):.4f}")
      if em.get("AP", -1) >= 0:
        archive_ckpt(model_dir, step, em["AP"], mngr)
  writer.close()
  mngr.save(step, ckpt_lib.state_for_save(state))
  mngr.wait_until_finished()
  out = {k: float(v) for k, v in jax.device_get(metrics).items()}

  if eval_iter is not None and eval_steps and not eval_every:
    fresh = eval_iter() if callable(eval_iter) else eval_iter
    out.update(evaluate_detection(
        model, state.ema_params or state.params, config, fresh, eval_steps,
        mesh=mesh))
    ap = out.get("AP", -1)
    if ap >= 0:
      archive_ckpt(model_dir, step, ap, mngr)
  return out


def evaluate_detection(model, params, config, eval_iter, eval_steps: int,
                       per_class: bool = False, vis_dir: str | None = None,
                       vis_samples: int = 2, mesh=None,
                       testdev_dir: str | None = None) -> dict:
  """COCO eval: device NMS -> host numpy COCOEvaluator.

  With vis_dir set, writes [detections | ground truth] side-by-side PNGs for
  the first `vis_samples` images of the first eval batch — the
  DisplayCallback / eval-image-summary analog (ref: tf2/train_lib.py:251-290,
  visualize/vis_utils.py:506).

  With testdev_dir set, mirrors the reference's test-dev mode
  (efficientdet/coco_metric.py:119-133): no ground truth is consumed, the
  accumulated detections are written as the COCO-server submission JSON, and
  the returned metrics are {'AP': -1.0} plus the written file path.

  Multi-process: pass the training `mesh`. Each process feeds its local eval
  rows; inputs are assembled into global arrays (build_global_array), the
  jitted predict returns fully-replicated detections, and ground truth is
  process_allgather'd so every process accumulates the same global metric.
  """
  from automl_tpu.eval.coco_metric import COCOEvaluator
  from automl_tpu.ops import postprocess

  nproc = jax.process_count()
  multiproc = nproc > 1
  if multiproc and mesh is None:
    raise ValueError(
        "multi-process eval needs the training mesh (mesh=...) to assemble "
        "local eval batches into global arrays against sharded params")

  def _predict(params, images, scales, ids):
    cls_out, box_out = model(params, images, train=False)
    return postprocess.generate_detections(config, cls_out, box_out,
                                           scales, ids)

  # cache the jitted predict across in-training evals (see
  # evaluate_classification): per-epoch COCO evals must not recompile
  key = (model, id(config), multiproc, mesh)
  predict = _EVAL_PREDICT_CACHE.get(key)
  if predict is None:
    if multiproc:
      from jax.sharding import NamedSharding, PartitionSpec
      # replicate outputs: small [B, max_det, 7] arrays every host can read
      predict = jax.jit(_predict,
                        out_shardings=NamedSharding(mesh, PartitionSpec()))
    else:
      predict = jax.jit(_predict)
    _EVAL_PREDICT_CACHE[key] = predict

  evaluator = COCOEvaluator(per_class=per_class, label_map=None)
  mean = jnp.asarray(config.mean_rgb, jnp.float32)
  std = jnp.asarray(config.stddev_rgb, jnp.float32)
  for step in range(eval_steps):
    try:
      batch = next(eval_iter)
    except StopIteration:
      break  # finite eval set smaller than eval_steps: partial pass
    images = (jnp.asarray(batch["image"], jnp.float32) - mean) / std
    b = images.shape[0]
    scales = jnp.broadcast_to(
        jnp.asarray(batch.get("image_scale", 1.0), jnp.float32).reshape(-1),
        (b,))
    if "source_id" in batch:
      ids = jnp.broadcast_to(
          jnp.asarray(batch["source_id"], jnp.float32).reshape(-1), (b,))
    else:  # synthetic loaders: synthesize globally unique per-image ids
      offset = (step * nproc + jax.process_index()) * b
      ids = jnp.arange(offset, offset + b, dtype=jnp.float32)
    # gt boxes are canvas coords; rescale to source coords like detections
    scale = np.asarray(batch.get("image_scale", 1.0),
                       np.float32).reshape(-1, 1, 1)
    if testdev_dir is not None and "gt_boxes" not in batch:
      gt_boxes = np.zeros((b, 0, 4), np.float32)  # test-dev: no ground truth
      gt_classes = np.zeros((b, 0), np.int32)
    else:
      gt_boxes = np.asarray(batch["gt_boxes"], np.float32) * scale
      gt_classes = np.asarray(batch["gt_classes"])
    if multiproc:
      from automl_tpu.parallel.distributed import build_global_array
      from jax.experimental import multihost_utils
      images = build_global_array(images, mesh)
      scales = build_global_array(scales, mesh)
      ids = build_global_array(ids, mesh)
      gt_boxes, gt_classes = multihost_utils.process_allgather(
          (gt_boxes, gt_classes), tiled=True)
    dets, valid = predict(params, images, scales, ids)
    evaluator.add_batch_from_detections(
        np.asarray(dets), np.asarray(valid), gt_boxes, gt_classes)
    if vis_dir and step == 0:
      # local rows sit at this process's offset in the global batch
      row0 = jax.process_index() * b if multiproc else 0
      _write_eval_images(batch, np.asarray(dets)[row0:row0 + b],
                         np.asarray(valid)[row0:row0 + b],
                         vis_dir, vis_samples)
  if testdev_dir is not None:
    path = None
    if jax.process_index() == 0:  # detections are globally replicated
      path = evaluator.write_detections_json(testdev_dir)
    # reference returns [-1.] in test-dev mode (coco_metric.py:132)
    return {"AP": -1.0, "detections_json": path}
  return evaluator.compute()


def _write_eval_images(batch, dets, valid, vis_dir: str, n: int) -> None:
  """Dump side-by-side [detections | GT] PNGs (canvas coordinates)."""
  from automl_tpu.inference import visualize
  os.makedirs(vis_dir, exist_ok=True)
  images = np.asarray(batch["image"])
  if images.dtype != np.uint8:
    images = np.clip(images, 0, 255).astype(np.uint8)
  scales = np.broadcast_to(
      np.asarray(batch.get("image_scale", 1.0), np.float32).reshape(-1),
      (images.shape[0],))
  for i in range(min(n, images.shape[0])):
    k = int(valid[i])
    # detections are [id, ymin, xmin, ymax, xmax, score, class] in source
    # coords; undo image_scale back to canvas coords for drawing.
    s = float(scales[i])
    panel = visualize.side_by_side_evaluation_image(
        images[i],
        np.asarray(batch["gt_boxes"])[i],
        np.asarray(batch["gt_classes"])[i],
        dets[i, :k, 1:5] / max(s, 1e-8),
        dets[i, :k, 6].astype(np.int32),
        dets[i, :k, 5])
    visualize.save_image_array_as_png(
        panel, os.path.join(vis_dir, f"eval_image_{i}.png"))
