"""Named EfficientDet configs (d0..d7x, lite0..4) + detection defaults.

Config facts reproduce efficientdet/hparams_config.py:170-467 verbatim as
data (hyperparameters, not code).
"""

from __future__ import annotations

import copy

from automl_tpu.config import Config, register


def default_detection_configs() -> Config:
  """Detection defaults (ref: hparams_config.py:170-298)."""
  return Config(dict(
      name="efficientdet-d1",
      act_type="swish",
      # input preprocessing
      image_size=640,
      target_size=None,
      input_rand_hflip=True,
      jitter_min=0.1,
      jitter_max=2.0,
      autoaugment_policy=None,
      grid_mask=False,
      sample_image=None,
      map_freq=5,
      # dataset
      num_classes=90,
      seg_num_classes=3,
      heads=["object_detection"],
      skip_crowd_during_training=True,
      label_map=None,
      max_instances_per_image=100,
      regenerate_source_id=False,
      # anchors
      min_level=3,
      max_level=7,
      num_scales=3,
      aspect_ratios=[1.0, 2.0, 0.5],
      anchor_scale=4.0,
      is_training_bn=True,
      # optimization
      momentum=0.9,
      optimizer="sgd",
      learning_rate=0.08,
      lr_warmup_init=0.008,
      lr_warmup_epoch=1.0,
      first_lr_drop_epoch=200.0,
      second_lr_drop_epoch=250.0,
      poly_lr_power=0.9,
      clip_gradients_norm=10.0,
      num_epochs=300,
      data_format="channels_last",
      mean_rgb=[0.485 * 255, 0.456 * 255, 0.406 * 255],
      stddev_rgb=[0.229 * 255, 0.224 * 255, 0.225 * 255],
      scale_range=False,
      # losses
      label_smoothing=0.0,
      alpha=0.25,
      gamma=1.5,
      delta=0.1,
      box_loss_weight=50.0,
      iou_loss_type=None,
      iou_loss_weight=1.0,
      weight_decay=4e-5,
      strategy=None,
      mixed_precision=False,
      loss_scale=None,
      # detection head / BiFPN
      box_class_repeats=3,
      fpn_cell_repeats=3,
      fpn_num_filters=88,
      separable_conv=True,
      apply_bn_for_resampling=True,
      conv_after_downsample=False,
      conv_bn_act_pattern=False,
      drop_remainder=True,
      # NMS
      nms_configs=dict(
          method="gaussian",
          iou_thresh=None,     # default per method
          score_thresh=0.0,
          sigma=None,
          pyfunc=False,
          max_nms_inputs=0,
          max_output_size=100,
          # Pre-NMS per-anchor-max candidate cap. 5000 matches the
          # reference exactly (tf2/anchors.py:27 MAX_DETECTION_POINTS,
          # consumed at tf2/postprocess.py:82-117) — the eval-parity
          # default. 2048 is the documented serving fast path (D0 b32
          # postprocess 9.6 ms vs ~15 ms; PERF_NOTES round 4 quantifies
          # both the AP and ms deltas).
          pre_nms_topk=5000,
      ),
      tflite_max_detections=100,
      # fpn variants
      fpn_name=None,
      fpn_weight_method=None,
      fpn_config=None,
      # regularization
      survival_prob=None,
      img_summary_steps=None,
      lr_decay_method="cosine",
      moving_average_decay=0.9998,
      ckpt_var_scope=None,
      skip_mismatch=True,
      backbone_name="efficientnet-b1",
      backbone_config=None,
      var_freeze_expr=None,
      use_keras_model=True,
      dataset_type=None,
      positives_momentum=None,
      grad_checkpoint=False,
      # adversarial regularization (the reference's AdversarialLoss is an
      # unwired nsl WIP, tf2/train_lib.py:328-354; here it is a working
      # FGSM-style neighbor loss computed inside the jitted train step)
      adv_multiplier=0.0,   # 0 = off; nsl default when enabled is 0.2
      adv_step_size=0.01,   # sign-gradient step in normalized-image units
      # quantization-aware training (ref: tf2/tfmot.py; here fake-quant with
      # straight-through gradients, nn/quant.py)
      qat=False,
      qat_bits=8,
      # training runtime
      batch_size=64,
      verbose=1,
      save_freq="epoch",
  ))


EFFICIENTDET_MODEL_PARAMS = {
    "efficientdet-d0": dict(
        backbone_name="efficientnet-b0", image_size=512,
        fpn_num_filters=64, fpn_cell_repeats=3, box_class_repeats=3),
    "efficientdet-d1": dict(
        backbone_name="efficientnet-b1", image_size=640,
        fpn_num_filters=88, fpn_cell_repeats=4, box_class_repeats=3),
    "efficientdet-d2": dict(
        backbone_name="efficientnet-b2", image_size=768,
        fpn_num_filters=112, fpn_cell_repeats=5, box_class_repeats=3),
    "efficientdet-d3": dict(
        backbone_name="efficientnet-b3", image_size=896,
        fpn_num_filters=160, fpn_cell_repeats=6, box_class_repeats=4),
    "efficientdet-d4": dict(
        backbone_name="efficientnet-b4", image_size=1024,
        fpn_num_filters=224, fpn_cell_repeats=7, box_class_repeats=4),
    "efficientdet-d5": dict(
        backbone_name="efficientnet-b5", image_size=1280,
        fpn_num_filters=288, fpn_cell_repeats=7, box_class_repeats=4),
    "efficientdet-d6": dict(
        backbone_name="efficientnet-b6", image_size=1280,
        fpn_num_filters=384, fpn_cell_repeats=8, box_class_repeats=5,
        fpn_weight_method="sum"),
    "efficientdet-d7": dict(
        backbone_name="efficientnet-b6", image_size=1536,
        fpn_num_filters=384, fpn_cell_repeats=8, box_class_repeats=5,
        anchor_scale=5.0, fpn_weight_method="sum"),
    "efficientdet-d7x": dict(
        backbone_name="efficientnet-b7", image_size=1536,
        fpn_num_filters=384, fpn_cell_repeats=8, box_class_repeats=5,
        anchor_scale=4.0, max_level=8, fpn_weight_method="sum"),
}

_LITE_COMMON = dict(mean_rgb=127.0, stddev_rgb=128.0, act_type="relu6",
                    fpn_weight_method="sum")

EFFICIENTDET_LITE_PARAMS = {
    "efficientdet-lite0": dict(
        backbone_name="efficientnet-lite0", image_size=320,
        fpn_num_filters=64, fpn_cell_repeats=3, box_class_repeats=3,
        anchor_scale=3.0, **_LITE_COMMON),
    "efficientdet-lite1": dict(
        backbone_name="efficientnet-lite1", image_size=384,
        fpn_num_filters=88, fpn_cell_repeats=4, box_class_repeats=3,
        anchor_scale=3.0, **_LITE_COMMON),
    "efficientdet-lite2": dict(
        backbone_name="efficientnet-lite2", image_size=448,
        fpn_num_filters=112, fpn_cell_repeats=5, box_class_repeats=3,
        anchor_scale=3.0, **_LITE_COMMON),
    "efficientdet-lite3": dict(
        backbone_name="efficientnet-lite3", image_size=512,
        fpn_num_filters=160, fpn_cell_repeats=6, box_class_repeats=4,
        **_LITE_COMMON),
    "efficientdet-lite3x": dict(
        backbone_name="efficientnet-lite3", image_size=640,
        fpn_num_filters=200, fpn_cell_repeats=6, box_class_repeats=4,
        anchor_scale=3.0, **_LITE_COMMON),
    "efficientdet-lite4": dict(
        backbone_name="efficientnet-lite4", image_size=640,
        fpn_num_filters=224, fpn_cell_repeats=7, box_class_repeats=4,
        **_LITE_COMMON),
}


def _test_config() -> Config:
  """Tiny config for smoke tests / CLI dry runs (cf. hero TransformerLMTest)."""
  cfg = default_detection_configs()
  cfg.override(dict(
      name="efficientdet-test", backbone_name="efficientnet-b0",
      image_size=64, fpn_num_filters=16, fpn_cell_repeats=1,
      box_class_repeats=1, num_classes=3, batch_size=2))
  cfg.backbone_config = dict(
      blocks_args=["r1_k3_s1_e1_i8_o8", "r1_k3_s2_e2_i8_o16",
                   "r1_k3_s2_e2_i16_o16", "r1_k3_s2_e2_i16_o24",
                   "r1_k3_s2_e2_i24_o32"],
      feature_size=32, width_coefficient=1.0, depth_coefficient=1.0)
  return cfg


def get_efficientdet_config(model_name: str = "efficientdet-d1") -> Config:
  if model_name == "efficientdet-test":
    return _test_config()
  cfg = default_detection_configs()
  params = {**EFFICIENTDET_MODEL_PARAMS, **EFFICIENTDET_LITE_PARAMS}
  if model_name not in params:
    raise KeyError(f"Unknown detection model {model_name!r}. "
                   f"Available: {sorted(params) + ['efficientdet-test']}")
  cfg.override(dict(name=model_name, **copy.deepcopy(params[model_name])))
  return cfg


for _name in list(EFFICIENTDET_MODEL_PARAMS) + list(EFFICIENTDET_LITE_PARAMS):
  register(_name, (lambda n: (lambda: get_efficientdet_config(n)))(_name))
