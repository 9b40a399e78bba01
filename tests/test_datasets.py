"""Dataset registry, finetune preprocessing, multiclass path, ft-ckpt smoke."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from automl_tpu import nn
from automl_tpu.data import datasets as ds_lib
from automl_tpu.data import preprocessing


def test_registry_contents_match_reference_tables():
  names = ds_lib.dataset_names()
  for want in ("imagenet", "imagenet21k", "imagenetft", "cifar10ft",
               "cifar100ft", "flowersft", "tfflowersft", "carsft"):
    assert want in names, names
  c10 = ds_lib.get_dataset_config("Cifar10Ft")
  # verbatim ft hyperparameters (efficientnetv2/datasets.py:699-734)
  assert c10.train.lr_base == 0.0005
  assert c10.train.lr_sched == "constant"
  assert c10.train.ema_decay == 0.9996
  assert c10.train.epochs == 15 and c10.train.min_steps == 10000
  assert c10.data.augname == "ft"
  assert c10.data.num_classes == 10 and not c10.data.multiclass
  i21k = ds_lib.get_dataset_config("ImageNet21k")
  assert i21k.data.num_classes == 21843 and i21k.data.multiclass
  assert i21k.train.loss_type == "sigmoid"
  assert i21k.model.survival_prob == 1.0
  cars = ds_lib.get_dataset_config("CarsFt")
  assert cars.data.num_classes == 196
  with pytest.raises(KeyError):
    ds_lib.get_dataset_config("nope")


def test_norm_families():
  x = jnp.full((2, 8, 8, 3), 128.0)
  np.testing.assert_allclose(np.asarray(preprocessing.normalize_cls(x, "v2")),
                             0.0, atol=1e-6)
  np.testing.assert_allclose(
      np.asarray(preprocessing.normalize_cls(x, "ft")),
      (128 / 255 - 0.5) / 0.5, atol=1e-6)
  assert preprocessing.norm_for_augname("effnetv1_autoaug") == (
      "legacy", "autoaug")
  assert preprocessing.norm_for_augname("ft") == ("ft", "ft")
  assert preprocessing.norm_for_augname("randaug") == ("v2", "randaug")
  assert preprocessing.norm_for_augname(None) == ("v2", None)


def test_finetune_preprocess_cutout_and_range():
  imgs = jnp.asarray(
      np.random.RandomState(0).randint(0, 256, (2, 40, 40, 3), np.uint8))
  out = preprocessing.cls_finetune_preprocess(imgs, jax.random.key(0), 32,
                                              train=True)
  assert out.shape == (2, 32, 32, 3)
  assert float(jnp.min(out)) >= -1.001 and float(jnp.max(out)) <= 1.001
  # cutout changed a contiguous square vs the no-train path
  ref = preprocessing.cls_finetune_preprocess(imgs, jax.random.key(0), 32,
                                              train=False)
  assert not np.allclose(np.asarray(out), np.asarray(ref))
  # train dispatch through augname='ft'
  out2 = preprocessing.cls_train_preprocess(imgs, jax.random.key(0), 32,
                                            augname="ft")
  np.testing.assert_allclose(np.asarray(out2), np.asarray(out), atol=1e-6)


def test_multihot_on_device():
  ids = jnp.asarray([[0, 2, -1, -1], [5, 5, 1, -1]], jnp.int32)
  mh = ds_lib.multihot_on_device(ids, 8)
  want = np.zeros((2, 8), np.float32)
  want[0, [0, 2]] = 1
  want[1, [5, 1]] = 1  # duplicate id stays 1 (min with 1)
  np.testing.assert_array_equal(np.asarray(mh), want)


def test_synthetic_multilabel_loader():
  it = iter(ds_lib.SyntheticMultiLabel(4, 32, 100, max_labels=8))
  b = next(it)
  assert b["image"].shape == (4, 32, 32, 3)
  assert b["label_ids"].shape == (4, 8)
  assert (b["label_ids"] >= -1).all() and (b["label_ids"] < 100).all()
  assert (b["label_ids"][:, 0] >= 0).all()  # at least one label each


def test_build_dataset_synthetic_dispatch():
  cfg = ds_lib.get_dataset_config("ImageNet21k")
  cfg.data.update(dict(data_dir=None))
  it = iter(ds_lib.build_dataset(cfg, "train", 2, canvas_size=24))
  b = next(it)
  assert "label_ids" in b and b["image"].shape == (2, 24, 24, 3)
  cfg2 = ds_lib.get_dataset_config("Cifar10Ft")
  cfg2.data.update(dict(data_dir="null"))
  b2 = next(iter(ds_lib.build_dataset(cfg2, "train", 2, canvas_size=24)))
  assert b2["label"].shape == (2, 10)


def test_multiclass_sigmoid_train_step_runs():
  """21k-style training: padded label ids -> device multi-hot + sigmoid loss."""
  from automl_tpu.configs.effnet_configs import get_model_config
  from automl_tpu.models import build_model
  from automl_tpu.train import optimizers as opt_lib, train_lib
  nn.set_policy("float32")
  try:
    cfg = get_model_config("efficientnetv2-b0")
    cfg.model.override(dict(
        num_classes=20,
        blocks_args=["r1_k3_s1_e1_i8_o8_c1", "r1_k3_s2_e4_i8_o16_se0.25"],
        feature_size=16))
    cfg.train.override(dict(loss_type="sigmoid", label_smoothing=0.0))
    model = build_model(cfg.model)
    params = model.init(jax.random.key(0))
    tx = opt_lib.masked_for_params(opt_lib.build_optimizer("sgd", 1e-2),
                                   params)
    state = train_lib.create_train_state(params, tx)
    ids = jnp.asarray([[1, 3, -1], [7, -1, -1], [0, 5, 9], [2, -1, -1]],
                      jnp.int32)

    def preprocess(batch, rng):
      return {"image": batch["image"],
              "label": ds_lib.multihot_on_device(batch["label_ids"], 20)}

    step_fn = jax.jit(train_lib.make_cls_train_step(
        model, tx, cfg, preprocess_fn=preprocess))
    batch = {"image": jax.random.normal(jax.random.key(1), (4, 32, 32, 3)),
             "label_ids": ids}
    losses = []
    for _ in range(4):
      state, m = step_fn(state, batch, jax.random.key(2))
      losses.append(float(m["loss"]))
    assert np.isfinite(losses).all() and losses[-1] < losses[0], losses
  finally:
    nn.set_policy("mixed_bfloat16")


def test_finetune_smoke_from_converted_ckpt(tmp_path):
  """CIFAR-shaped finetune from a converted '21k' checkpoint: pretrain-shaped
  params (different class count) import with the head excluded, then the
  Cifar10Ft config trains (VERDICT r1 item 7; ref: main.py:296-305)."""
  from automl_tpu.ckpt import tf_compat
  from automl_tpu.configs.effnet_configs import get_model_config
  from automl_tpu.models import build_model
  from automl_tpu.train import runners
  nn.set_policy("float32")
  try:
    blocks = ["r1_k3_s1_e1_i8_o8_c1", "r1_k3_s2_e4_i8_o16_se0.25"]
    # "pretrained" model with 21k-ish head, exported as TF-named weights
    pre_cfg = get_model_config("efficientnetv2-b0")
    pre_cfg.model.override(dict(num_classes=50, blocks_args=blocks,
                                feature_size=16))
    pre_model = build_model(pre_cfg.model)
    pre_params = pre_model.init(jax.random.key(7))
    var_map = tf_compat.effnet_var_map(pre_model)

    def get(tree, path):
      node = tree
      for k in path:
        node = node[k]
      return np.asarray(node)

    fake_ckpt = {}
    for tf_name, (path, _) in var_map.items():
      v = get(pre_params, path)
      if tf_name.endswith("depthwise_kernel"):
        v = np.transpose(v, (0, 1, 3, 2))  # ours [k,k,1,C] -> TF [k,k,C,1]
      fake_ckpt[tf_name] = v

    # finetune target: Cifar10Ft registry config, 10-class head
    cfg = get_model_config("efficientnetv2-b0")
    cfg.override(ds_lib.get_dataset_config("Cifar10Ft").as_dict(),
                 allow_new_keys=True)
    cfg.model.override(dict(num_classes=10, blocks_args=blocks,
                            feature_size=16))
    cfg.train.override(dict(batch_size=4, stages=0, min_steps=0,
                            ft_init_ckpt=None))
    cfg.train.isize = 1.0          # ft convention: fraction of eval size
    cfg.eval.isize = 32
    cfg.data.update(dict(ibase=None))
    cfg.runtime.mixed_precision = False

    model = build_model(cfg.model)
    params = model.init(jax.random.key(0))
    params = tf_compat.convert_effnet_checkpoint(
        fake_ckpt, model, params=params, strict=False,
        exclude_prefixes=(("head", "fc"),))
    # backbone weights identical to the pretrained export; head differs
    np.testing.assert_allclose(
        get(params, ("stem", "conv2d", "kernel")),
        fake_ckpt["efficientnetv2-b0/stem/conv2d/kernel"])
    assert get(params, ("head", "fc", "kernel")).shape[-1] == 10

    metrics = runners.run_classification(cfg, str(tmp_path / "ft"),
                                         train_steps=3, log_every=3)
    assert np.isfinite(metrics["loss"])
  finally:
    nn.set_policy("mixed_bfloat16")


def test_average_precision_pr_golden():
  """AUC-PR metric (ref: efficientnetv2/main.py:231-287 AUC(curve='PR')):
  hand-computed average-precision cases."""
  from automl_tpu.eval.classification import (MultiLabelEvaluator,
                                              average_precision_pr,
                                              precision_at_1)
  # perfect ranking -> AP 1.0
  s = np.array([[0.9, 0.1], [0.8, 0.2]])
  y = np.array([[1, 0], [1, 0]])
  assert average_precision_pr(s, y) == 1.0
  # ranking [pos, neg, pos, neg]: AP = (1/1 + 2/3) / 2
  s = np.array([[0.9, 0.7], [0.8, 0.6]])
  y = np.array([[1, 1], [0, 0]])
  np.testing.assert_allclose(average_precision_pr(s, y),
                             (1.0 + 2.0 / 3.0) / 2)
  assert average_precision_pr(s, np.zeros_like(y)) == 0.0
  assert precision_at_1(s, y) == 0.5  # ex0 top is class0 (pos), ex1 class0 (neg)

  ev = MultiLabelEvaluator()
  ev.add_batch(s[:1], y[:1])
  ev.add_batch(s[1:], y[1:])
  r = ev.result()
  assert r["samples"] == 2
  np.testing.assert_allclose(r["auc_pr"], (1.0 + 2.0 / 3.0) / 2)


def test_multilabel_tfrecord_loader_and_eval(tmp_path):
  """Round trip: write {image, labels} TFRecords (the 21k schema,
  ref: efficientnetv2/datasets.py:481-489), load through
  MultiLabelTFRecordLoader, and score with the AUC-PR evaluator."""
  import tensorflow as tf
  from automl_tpu.data.pipeline import MultiLabelTFRecordLoader
  from automl_tpu.eval.classification import MultiLabelEvaluator

  path = str(tmp_path / "ml-00000-of-00001")
  rng = np.random.RandomState(0)
  with tf.io.TFRecordWriter(path) as w:
    for i in range(6):
      img = rng.randint(0, 255, (20, 24, 3), np.uint8)
      jpeg = tf.io.encode_jpeg(img).numpy()
      ex = tf.train.Example(features=tf.train.Features(feature={
          "image": tf.train.Feature(
              bytes_list=tf.train.BytesList(value=[jpeg])),
          "labels": tf.train.Feature(
              int64_list=tf.train.Int64List(value=[i % 5, (i + 2) % 5])),
      }))
      w.write(ex.SerializeToString())

  loader = MultiLabelTFRecordLoader(path, is_training=False, batch_size=4,
                                    canvas_size=16, max_labels=3,
                                    drop_remainder=False)
  ev = MultiLabelEvaluator()
  n = 0
  for batch in loader:
    assert batch["image"].shape[1:] == (16, 16, 3)
    assert batch["label_ids"].shape[1:] == (3,)
    # pad ids are -1; real ids in [0, 5)
    assert (batch["label_ids"] >= -1).all() and (batch["label_ids"] < 5).all()
    multihot = np.zeros((len(batch["label_ids"]), 5), np.int8)
    for r, ids in enumerate(batch["label_ids"]):
      for c in ids[ids >= 0]:
        multihot[r, c] = 1
    ev.add_batch(rng.rand(len(multihot), 5), multihot)
    n += len(multihot)
  assert n == 6
  r = ev.result()
  assert r["samples"] == 6 and 0.0 <= r["auc_pr"] <= 1.0
