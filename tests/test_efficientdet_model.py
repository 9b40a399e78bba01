"""EfficientDet model tests: FPN DAG structure, param counts, forward shapes."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from automl_tpu import nn
from automl_tpu.configs.efficientdet_configs import get_efficientdet_config
from automl_tpu.models import fpn_configs
from automl_tpu.models.efficientdet import (
    EfficientDet, build_detection_model, flatten_predictions)


def test_bifpn_dag_structure():
  # Golden DAG from the reference docstring (tf2/fpn_configs.py:31-46)
  p = fpn_configs.bifpn_config(3, 7, None)
  assert p.weight_method == "fastattn"
  got = [(n["feat_level"], list(n["inputs_offsets"])) for n in p.nodes]
  assert got == [
      (6, [3, 4]), (5, [2, 5]), (4, [1, 6]), (3, [0, 7]),
      (4, [1, 7, 8]), (5, [2, 6, 9]), (6, [3, 5, 10]), (7, [4, 11]),
  ]


def test_qufpn_dag_is_valid():
  p = fpn_configs.qufpn_config(3, 7, None)
  num_inputs = 5
  for i, node in enumerate(p.nodes):
    for off in node["inputs_offsets"]:
      assert off < num_inputs + i  # only references existing nodes


def test_d0_param_count_close_to_published():
  # Published: 3.9M params (efficientdet/README.md:67). Count includes BN stats.
  model = build_detection_model("efficientdet-d0")
  shapes = jax.eval_shape(model.init, jax.random.key(0))
  total = sum(math.prod(s.shape) for s in jax.tree_util.tree_leaves(shapes))
  assert 3.8e6 < total < 4.1e6, total


def test_tiny_forward_shapes_and_flatten():
  nn.set_policy("float32")
  try:
    cfg = get_efficientdet_config("efficientdet-d0")
    cfg.override(dict(
        image_size=64, fpn_num_filters=16, fpn_cell_repeats=1,
        box_class_repeats=1, num_classes=3), allow_new_keys=True)
    cfg.backbone_config = dict(
        blocks_args=[
            "r1_k3_s1_e1_i8_o8", "r1_k3_s2_e2_i8_o16",
            "r1_k3_s2_e2_i16_o16", "r1_k3_s2_e2_i16_o24",
            "r1_k3_s2_e2_i24_o32"],
        feature_size=32, width_coefficient=1.0, depth_coefficient=1.0)
    model = EfficientDet(cfg)
    params = model.init(jax.random.key(0))
    x = jnp.ones((1, 64, 64, 3))
    cls_out, box_out = model(params, x)
    assert len(cls_out) == 5 and len(box_out) == 5
    # levels 3..7 at strides 8..128 of a 64 input -> 8,4,2,1,1
    sizes = [c.shape[1] for c in cls_out]
    assert sizes == [8, 4, 2, 1, 1], sizes
    assert cls_out[0].shape[-1] == 9 * 3 and box_out[0].shape[-1] == 9 * 4
    flat_cls = flatten_predictions(cls_out, 3)
    flat_box = flatten_predictions(box_out, 4)
    a_total = sum(s * s * 9 for s in [8, 4, 2, 1, 1])
    assert flat_cls.shape == (1, a_total, 3)
    assert flat_box.shape == (1, a_total, 4)
    # class-predict bias init -> sigmoid(prior) ~= 0.01
    probs = jax.nn.sigmoid(flat_cls)
    np.testing.assert_allclose(float(jnp.mean(probs)), 0.01, atol=0.05)
  finally:
    nn.set_policy("mixed_bfloat16")


def test_segmentation_head():
  nn.set_policy("float32")
  try:
    from automl_tpu.configs.efficientdet_configs import get_efficientdet_config
    cfg = get_efficientdet_config("efficientdet-test")
    cfg.heads = ["object_detection", "segmentation"]
    cfg.image_size = 128
    model = EfficientDet(cfg)
    params = model.init(jax.random.key(0))
    cls_out, box_out, seg = model(params, jnp.ones((1, 128, 128, 3)))
    assert len(cls_out) == 5
    # seg output upsamples P3 (stride 8) by 2: 128/8*2 = 32
    assert seg.shape == (1, 32, 32, cfg.seg_num_classes)
  finally:
    nn.set_policy("mixed_bfloat16")


def test_grad_checkpoint_train_no_tracer_leak():
  """Regression (ADVICE r1): BN moving-stat updates recorded inside a
  jax.checkpoint region leaked remat tracers through the state collector."""
  nn.set_policy("float32")
  try:
    cfg = get_efficientdet_config("efficientdet-d0")
    cfg.override(dict(
        image_size=32, fpn_num_filters=8, fpn_cell_repeats=1,
        box_class_repeats=2, num_classes=3,
        grad_checkpoint=True), allow_new_keys=True)
    cfg.backbone_config = dict(
        blocks_args=["r1_k3_s1_e1_i8_o8", "r1_k3_s2_e2_i8_o16",
                     "r1_k3_s2_e2_i16_o16", "r1_k3_s2_e2_i16_o24",
                     "r1_k3_s2_e2_i24_o32"],
        feature_size=16, width_coefficient=1.0, depth_coefficient=1.0)
    model = EfficientDet(cfg)
    params = model.init(jax.random.key(0))
    x = jnp.ones((1, 32, 32, 3))

    @jax.jit
    def train_fwd(params, x):
      def fwd(p):
        with nn.rng_scope(jax.random.key(1)):
          (cls_out, box_out), updates = nn.run_and_collect_state(
              model, p, x, True)
        loss = sum(jnp.mean(jnp.square(c)) for c in cls_out)
        return loss, updates
      (loss, updates), grads = jax.value_and_grad(fwd, has_aux=True)(params)
      return loss, updates, grads

    loss, updates, grads = train_fwd(params, x)
    assert bool(jnp.isfinite(loss))
    # head BN stats were actually collected from inside the remat region
    head_bn = [p for p in updates if "class_net" in p and "moving_mean" in p[-1]]
    assert head_bn, list(updates)[:5]
    assert all(bool(jnp.isfinite(v).all()) for v in updates.values())
  finally:
    nn.set_policy("mixed_bfloat16")
