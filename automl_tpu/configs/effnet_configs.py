"""Named EfficientNet V1/V2/lite configs and the classification base config.

Config facts (scaling coefficients, block strings, train/eval sizes, aug
settings) reproduce the reference tables:
  V1 params + b0 block strings  ref: efficientnetv2/effnetv2_configs.py:90-135,
                                     efficientdet/backbone/efficientnet_builder.py:31-46
  V2 blocks + params            ref: efficientnetv2/effnetv2_configs.py:138-216
  lite params                   ref: efficientdet/backbone/efficientnet_lite_builder.py:33-79
  base (train/eval/data/runtime) ref: efficientnetv2/hparams.py:221-312
"""

from __future__ import annotations

from automl_tpu.config import Config, register
from automl_tpu.models.efficientnet import model_defaults

# --- V1 ---------------------------------------------------------------------

V1_B0_BLOCKS = [
    "r1_k3_s1_e1_i32_o16_se0.25",
    "r2_k3_s2_e6_i16_o24_se0.25",
    "r2_k5_s2_e6_i24_o40_se0.25",
    "r3_k3_s2_e6_i40_o80_se0.25",
    "r3_k5_s1_e6_i80_o112_se0.25",
    "r4_k5_s2_e6_i112_o192_se0.25",
    "r1_k3_s1_e6_i192_o320_se0.25",
]

# (width_coefficient, depth_coefficient, eval_resolution, dropout_rate)
EFFICIENTNET_V1_PARAMS = {
    "efficientnet-b0": (1.0, 1.0, 224, 0.2),
    "efficientnet-b1": (1.0, 1.1, 240, 0.2),
    "efficientnet-b2": (1.1, 1.2, 260, 0.3),
    "efficientnet-b3": (1.2, 1.4, 300, 0.3),
    "efficientnet-b4": (1.4, 1.8, 380, 0.4),
    "efficientnet-b5": (1.6, 2.2, 456, 0.4),
    "efficientnet-b6": (1.8, 2.6, 528, 0.5),
    "efficientnet-b7": (2.0, 3.1, 600, 0.5),
    "efficientnet-b8": (2.2, 3.6, 672, 0.5),
    "efficientnet-l2": (4.3, 5.3, 800, 0.5),
}

# --- V2 ---------------------------------------------------------------------

V2_BASE_BLOCKS = [
    "r1_k3_s1_e1_i32_o16_c1",
    "r2_k3_s2_e4_i16_o32_c1",
    "r2_k3_s2_e4_i32_o48_c1",
    "r3_k3_s2_e4_i48_o96_se0.25",
    "r5_k3_s1_e6_i96_o112_se0.25",
    "r8_k3_s2_e6_i112_o192_se0.25",
]
V2_S_BLOCKS = [
    "r2_k3_s1_e1_i24_o24_c1",
    "r4_k3_s2_e4_i24_o48_c1",
    "r4_k3_s2_e4_i48_o64_c1",
    "r6_k3_s2_e4_i64_o128_se0.25",
    "r9_k3_s1_e6_i128_o160_se0.25",
    "r15_k3_s2_e6_i160_o256_se0.25",
]
V2_M_BLOCKS = [
    "r3_k3_s1_e1_i24_o24_c1",
    "r5_k3_s2_e4_i24_o48_c1",
    "r5_k3_s2_e4_i48_o80_c1",
    "r7_k3_s2_e4_i80_o160_se0.25",
    "r14_k3_s1_e6_i160_o176_se0.25",
    "r18_k3_s2_e6_i176_o304_se0.25",
    "r5_k3_s1_e6_i304_o512_se0.25",
]
V2_L_BLOCKS = [
    "r4_k3_s1_e1_i32_o32_c1",
    "r7_k3_s2_e4_i32_o64_c1",
    "r7_k3_s2_e4_i64_o96_c1",
    "r10_k3_s2_e4_i96_o192_se0.25",
    "r19_k3_s1_e6_i192_o224_se0.25",
    "r25_k3_s2_e6_i224_o384_se0.25",
    "r7_k3_s1_e6_i384_o640_se0.25",
]
V2_XL_BLOCKS = [
    "r4_k3_s1_e1_i32_o32_c1",
    "r8_k3_s2_e4_i32_o64_c1",
    "r8_k3_s2_e4_i64_o96_c1",
    "r16_k3_s2_e4_i96_o192_se0.25",
    "r24_k3_s1_e6_i192_o256_se0.25",
    "r32_k3_s2_e6_i256_o512_se0.25",
    "r8_k3_s1_e6_i512_o640_se0.25",
]

# (blocks, width, depth, train_size, eval_size, dropout, randaug_mag, mixup, augname)
EFFICIENTNET_V2_PARAMS = {
    "efficientnetv2-s": (V2_S_BLOCKS, 1.0, 1.0, 300, 384, 0.2, 10, 0, "randaug"),
    "efficientnetv2-m": (V2_M_BLOCKS, 1.0, 1.0, 384, 480, 0.3, 15, 0.2, "randaug"),
    "efficientnetv2-l": (V2_L_BLOCKS, 1.0, 1.0, 384, 480, 0.4, 20, 0.5, "randaug"),
    "efficientnetv2-xl": (V2_XL_BLOCKS, 1.0, 1.0, 384, 512, 0.4, 20, 0.5, "randaug"),
    "efficientnetv2-b0": (V2_BASE_BLOCKS, 1.0, 1.0, 192, 224, 0.2, 0, 0, "effnetv1_autoaug"),
    "efficientnetv2-b1": (V2_BASE_BLOCKS, 1.0, 1.1, 192, 240, 0.2, 0, 0, "effnetv1_autoaug"),
    "efficientnetv2-b2": (V2_BASE_BLOCKS, 1.1, 1.2, 208, 260, 0.3, 0, 0, "effnetv1_autoaug"),
    "efficientnetv2-b3": (V2_BASE_BLOCKS, 1.2, 1.4, 240, 300, 0.3, 0, 0, "effnetv1_autoaug"),
}

# --- lite --------------------------------------------------------------------

EFFICIENTNET_LITE_PARAMS = {
    "efficientnet-lite0": (1.0, 1.0, 224, 0.2),
    "efficientnet-lite1": (1.0, 1.1, 240, 0.2),
    "efficientnet-lite2": (1.1, 1.2, 260, 0.3),
    "efficientnet-lite3": (1.2, 1.4, 280, 0.3),
    "efficientnet-lite4": (1.4, 1.8, 300, 0.3),
}


def base_config() -> Config:
  """Full classification config (model/train/eval/data/runtime sections)."""
  return Config(dict(
      model=model_defaults().as_dict(),
      train=dict(
          stages=0,
          epochs=350,
          min_steps=0,
          optimizer="rmsprop",
          lr_sched="exponential",
          lr_base=0.016,
          lr_decay_epoch=2.4,
          lr_decay_factor=0.97,
          lr_warmup_epoch=5,
          lr_min=0.0,
          ema_decay=0.9999,
          weight_decay=1e-5,
          weight_decay_exclude=".*(bias|gamma|beta).*",
          label_smoothing=0.1,
          gclip=0.0,
          batch_size=4096,
          isize=None,
          loss_type=None,     # None->softmax; 'sigmoid' for multilabel
          ft_init_ckpt=None,
          ft_init_ema=True,
          qat=False,        # fake-quant QAT (nn/quant.py)
          qat_bits=8,
      ),
      eval=dict(batch_size=8, isize=None),
      data=dict(
          ds_name="imagenet",
          augname="randaug",
          ra_num_layers=2,
          ram=15,
          mixup_alpha=0.0,
          cutmix_alpha=0.0,
          ibase=128,           # progressive-resize starting size
          num_classes=1000,
          multiclass=False,
          data_dir=None,
          cache=True,
      ),
      runtime=dict(
          mixed_precision=True,
          iterations_per_loop=1000,
          keep_checkpoint_max=5,
          log_every=100,
          skip_host_call=False,
          strategy="tpu",
      ),
  ))


def efficientnet_v1_config(model_name: str) -> Config:
  wc, dc, isize, dropout = EFFICIENTNET_V1_PARAMS[model_name]
  cfg = base_config()
  cfg.model.override(dict(
      model_name=model_name, blocks_args=list(V1_B0_BLOCKS),
      width_coefficient=wc, depth_coefficient=dc, dropout_rate=dropout,
      bn_momentum=0.99,   # V1 BN momentum (ref: backbone/efficientnet_model.py:36)
  ))
  cfg.eval.isize = isize
  cfg.train.isize = 0.8  # fraction of eval size (ref: effnetv2_configs.py:130)
  cfg.data.augname = "effnetv1_autoaug"
  return cfg


def efficientnet_v2_config(model_name: str) -> Config:
  blocks, wc, dc, tsize, esize, dropout, ram, mix, aug = (
      EFFICIENTNET_V2_PARAMS[model_name])
  cfg = base_config()
  cfg.model.override(dict(
      model_name=model_name, blocks_args=list(blocks),
      width_coefficient=wc, depth_coefficient=dc, dropout_rate=dropout,
  ))
  cfg.train.override(dict(isize=tsize, stages=4))
  cfg.eval.isize = esize
  cfg.data.override(dict(augname=aug, ram=ram, mixup_alpha=float(mix),
                         cutmix_alpha=float(mix)))
  return cfg


def efficientnet_lite_config(model_name: str) -> Config:
  wc, dc, isize, dropout = EFFICIENTNET_LITE_PARAMS[model_name]
  cfg = base_config()
  cfg.model.override(dict(
      model_name=model_name, blocks_args=list(V1_B0_BLOCKS),
      width_coefficient=wc, depth_coefficient=dc, dropout_rate=dropout,
      bn_momentum=0.99, act_fn="relu6", use_se=False, fix_head_stem=True,
      min_depth=None, round_down_protect=True,
  ))
  cfg.eval.isize = isize
  cfg.train.isize = 0.8
  cfg.data.augname = "effnetv1_autoaug"
  return cfg


def _test_config() -> Config:
  """Tiny config for smoke tests / CLI dry runs."""
  cfg = base_config()
  cfg.model.override(dict(
      model_name="efficientnetv2-test",
      blocks_args=["r1_k3_s1_e1_i8_o8_c1", "r1_k3_s2_e4_i8_o16_se0.25"],
      feature_size=16, num_classes=4))
  cfg.train.override(dict(isize=32, batch_size=4, stages=0))
  cfg.eval.isize = 32
  cfg.data.override(dict(num_classes=4, ram=5))
  return cfg


def get_model_config(model_name: str) -> Config:
  """Named model -> full config (model/train/eval/data/runtime)."""
  if model_name == "efficientnetv2-test":
    return _test_config()
  if model_name.startswith("efficientnet-lite"):
    return efficientnet_lite_config(model_name)
  if model_name.startswith("efficientnet-"):
    return efficientnet_v1_config(model_name)
  if model_name.startswith("efficientnetv2-"):
    return efficientnet_v2_config(model_name)
  raise ValueError(f"Unknown model name {model_name!r}")


for _name in (list(EFFICIENTNET_V1_PARAMS) + list(EFFICIENTNET_V2_PARAMS)
               + list(EFFICIENTNET_LITE_PARAMS)):
  register(_name, (lambda n: (lambda: get_model_config(n)))(_name))
