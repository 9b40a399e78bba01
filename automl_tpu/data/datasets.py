"""Dataset registry: per-dataset input specs + training-config overlays.

The reference keeps two registries in efficientnetv2/datasets.py — input
classes (ImageNetInput/ImageNet21kInput/CIFAR10Input/... :72-630) and
dataset training configs (ds:ImageNet/ImageNet21k/ImagenetFt/Cifar10Ft/...
:646-771, applied by main.py:319-323 as `config.override(ds_config)`).
Both live here: `DatasetSpec` carries the input-side facts (classes,
multiclass, splits) and `get_dataset_config(name)` returns the training
overlay merged with its dataset's spec. Hyperparameter values reproduce the
reference tables verbatim (required for result parity).

TPU-native input split: the host loaders below only read TFRecords, decode
JPEG and resize to a fixed uint8 canvas; every random op (crop, flip,
randaug, mixup/cutmix, cutout) runs on device inside the jitted train step
(data/preprocessing.py). Multi-hot ImageNet21k labels are shipped as padded
label-id lists and expanded to dense multi-hot ON DEVICE (one_hot+sum on the
MXU) instead of materializing 21843-wide host tensors
(ref: ImageNet21kInput.dataset_parser, datasets.py:472-504).

The tfds-backed variants (CIFAR/Flowers/Cars) read the same TFRecord schema
from `data_dir`; with data_dir=None/'null' every loader degrades to the
synthetic fixture (the reference's data_dir='null' null-input mode,
datasets.py:178-189).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from automl_tpu.config import Config


@dataclasses.dataclass(frozen=True)
class SplitSpec:
  num_images: int
  file_pattern: str | None = None


@dataclasses.dataclass(frozen=True)
class DatasetSpec:
  """Input-side facts (ref: the *Input classes, datasets.py:72-630)."""
  name: str
  num_classes: int
  multiclass: bool = False
  max_labels: int = 16          # padded multi-hot ids per example (21k)
  default_canvas: int = 260
  splits: dict = dataclasses.field(default_factory=dict)


DATASETS: dict[str, DatasetSpec] = {}


def register_dataset(spec: DatasetSpec):
  DATASETS[spec.name] = spec
  return spec


register_dataset(DatasetSpec(
    "imagenet", num_classes=1000,
    splits=dict(train=SplitSpec(1_281_167, "train-*"),
                minival=SplitSpec(25_021, "train-*"),
                eval=SplitSpec(50_000, "validation-*"))))
register_dataset(DatasetSpec(
    "imagenet21k", num_classes=21843, multiclass=True,
    splits=dict(train=SplitSpec(12_720_275, "imagenet21k*"),
                minival=SplitSpec(25_089, "imagenet21k*"),
                eval=SplitSpec(100_357, "imagenet21k*"))))
register_dataset(DatasetSpec(
    "imagenettfds", num_classes=1000,
    splits=dict(train=SplitSpec(1_281_167, "train-*"),
                minival=SplitSpec(50_000, "validation-*"),
                eval=SplitSpec(50_000, "validation-*"))))
register_dataset(DatasetSpec(
    "cifar10", num_classes=10, default_canvas=48,
    splits=dict(train=SplitSpec(50_000, "cifar10-train*"),
                minival=SplitSpec(10_000, "cifar10-test*"),
                eval=SplitSpec(10_000, "cifar10-test*"))))
register_dataset(DatasetSpec(
    "cifar100", num_classes=100, default_canvas=48,
    splits=dict(train=SplitSpec(50_000, "cifar100-train*"),
                minival=SplitSpec(10_000, "cifar100-test*"),
                eval=SplitSpec(10_000, "cifar100-test*"))))
register_dataset(DatasetSpec(
    "flowers", num_classes=102,
    splits=dict(train=SplitSpec(1_020, "flowers-train*"),
                minival=SplitSpec(1_020, "flowers-val*"),
                eval=SplitSpec(6_149, "flowers-test*"))))
register_dataset(DatasetSpec(
    "tfflowers", num_classes=5,
    splits=dict(train=SplitSpec(3_303, "tfflowers-train*"),
                minival=SplitSpec(367, "tfflowers-val*"),
                eval=SplitSpec(367, "tfflowers-val*"))))
register_dataset(DatasetSpec(
    "cars", num_classes=196,
    splits=dict(train=SplitSpec(8_144, "cars-train*"),
                minival=SplitSpec(8_041, "cars-test*"),
                eval=SplitSpec(8_041, "cars-test*"))))


# ---------------------------------------------------------------------------
# Training-config overlays (values verbatim from datasets.py:646-771).
# ---------------------------------------------------------------------------

_DS_CONFIGS: dict[str, Config] = {}


def register_ds_config(name: str, cfg: dict):
  _DS_CONFIGS[name.lower()] = Config(cfg)


register_ds_config("imagenet", dict(
    data=dict(ds_name="imagenet", multiclass=False),
    train=dict(epochs=350, lr_base=0.016, lr_warmup_epoch=5,
               lr_sched="exponential", label_smoothing=0.1),
    eval=dict(batch_size=8),
))
register_ds_config("imagenet21k", dict(
    model=dict(dropout_rate=0.000001, survival_prob=1.0),
    data=dict(ds_name="imagenet21k", multiclass=True, augname=None,
              mixup_alpha=0, cutmix_alpha=0),
    train=dict(epochs=60, lr_base=0.008, lr_warmup_epoch=1,
               lr_sched="cosine", label_smoothing=0.0, isize=224,
               stages=0, loss_type="sigmoid"),
    eval=dict(batch_size=128, isize=224),
))
_FT_BASE = dict(
    model=dict(dropout_rate=0.000001, survival_prob=0.8),
    train=dict(batch_size=512, stages=0, epochs=15, optimizer="rmsprop",
               lr_sched="constant", lr_base=0.0005, lr_warmup_epoch=1,
               ema_decay=0.9996, weight_decay=1e-5, label_smoothing=0.1,
               min_steps=10000, isize=1.0),
    data=dict(augname="ft", mixup_alpha=0, cutmix_alpha=0),
)


def _ft(ds_name: str) -> dict:
  import copy
  cfg = copy.deepcopy(_FT_BASE)
  cfg["data"]["ds_name"] = ds_name
  return cfg


register_ds_config("imagenetft", _ft("imagenettfds"))
register_ds_config("cifar10ft", _ft("cifar10"))
register_ds_config("cifar100ft", _ft("cifar100"))
register_ds_config("flowersft", _ft("flowers"))
register_ds_config("tfflowersft", _ft("tfflowers"))
register_ds_config("carsft", _ft("cars"))


def dataset_names() -> list[str]:
  return sorted(_DS_CONFIGS)


def get_dataset_config(name: str) -> Config:
  """Training overlay for `name`, with data.{num_classes, multiclass,
  max_labels} filled from its DatasetSpec (ref: get_dataset_config,
  datasets.py:764-771)."""
  key = name.lower()
  if key not in _DS_CONFIGS:
    raise KeyError(f"Unknown dataset config {name!r}; "
                   f"available: {dataset_names()}")
  import copy
  cfg = copy.deepcopy(_DS_CONFIGS[key])
  spec = DATASETS[cfg.data.ds_name]
  cfg.data.update(dict(num_classes=spec.num_classes,
                       multiclass=spec.multiclass,
                       max_labels=spec.max_labels))
  return cfg


# ---------------------------------------------------------------------------
# Loader dispatch.
# ---------------------------------------------------------------------------


class SyntheticMultiLabel:
  """Synthetic 21k-style batches: padded label-id lists (ids, pad = -1)."""

  def __init__(self, batch_size: int, image_size: int, num_classes: int,
               max_labels: int = 16, seed: int = 0):
    self.b, self.s, self.k = batch_size, image_size, num_classes
    self.max_labels = max_labels
    self.rng = np.random.RandomState(seed)

  def __iter__(self):
    while True:
      ids = np.full((self.b, self.max_labels), -1, np.int32)
      for i in range(self.b):
        n = self.rng.randint(1, 4)
        ids[i, :n] = self.rng.randint(0, self.k, n)
      yield {
          "image": self.rng.randint(0, 256, (self.b, self.s, self.s, 3),
                                    np.uint8),
          "label_ids": ids,
      }


def multihot_on_device(label_ids, num_classes: int):
  """[B, K] padded ids (-1 pad) -> [B, num_classes] dense multi-hot, on
  device (ref host path: datasets.py:493-498 sparse_to_dense)."""
  import jax
  import jax.numpy as jnp
  # iota-compare one_hot, NOT an eye-gather: eye(21843) would be a ~1.9 GB
  # constant inside the jitted step. one_hot maps pad ids (-1) to all-zero
  # rows already.
  oh = jnp.sum(jax.nn.one_hot(label_ids, num_classes, dtype=jnp.float32),
               axis=1)
  return jnp.minimum(oh, 1.0)


def build_dataset(config, split: str, batch_size: int,
                  canvas_size: int | None = None, shard_index: int = 0,
                  num_shards: int = 1):
  """Host iterator for `config.data` (train/minival/eval split).

  data_dir None/'null' -> synthetic fixtures (the reference's null-input
  mode); otherwise TFRecords under data_dir with the spec's file pattern.
  """
  from automl_tpu.data import pipeline
  spec = DATASETS[config.data.ds_name]
  canvas = canvas_size or spec.default_canvas
  data_dir = config.data.get("data_dir")
  is_training = split == "train"
  if not data_dir or data_dir == "null":
    if spec.multiclass:
      return SyntheticMultiLabel(batch_size, canvas, spec.num_classes,
                                 spec.max_labels)
    return pipeline.SyntheticClassification(batch_size, canvas,
                                            spec.num_classes)
  pattern = f"{data_dir}/{spec.splits[split].file_pattern}"
  if spec.multiclass:
    return pipeline.MultiLabelTFRecordLoader(
        pattern, is_training, batch_size, canvas,
        max_labels=spec.max_labels, shard_index=shard_index,
        num_shards=num_shards)
  return pipeline.ImageNetTFRecordLoader(
      pattern, is_training, batch_size, canvas, spec.num_classes,
      shard_index=shard_index, num_shards=num_shards)
