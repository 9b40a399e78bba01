"""EfficientNet golden tests: exact param counts vs the reference's published
test values (ref: efficientnetv2/effnetv2_model_test.py:24-48) + forward shapes."""

import math

import jax
import jax.numpy as jnp
import pytest

from automl_tpu import nn
from automl_tpu.models import build_model, decode_block_strings, round_filters
from automl_tpu.models.efficientnet import decode_block_string

# Param-count goldens include BN moving statistics (Keras count_params()).
GOLDEN_PARAMS = {
    "efficientnet-b0": 5330564,
    "efficientnet-b1": 7856232,
    "efficientnet-b2": 9177562,
    "efficientnet-b3": 12314268,
    "efficientnet-b4": 19466816,
    "efficientnet-b5": 30562520,
    "efficientnet-b6": 43265136,
    "efficientnetv2-b0": 7200312,
    "efficientnetv2-b1": 8212124,
    "efficientnetv2-b2": 10178374,
    "efficientnetv2-b3": 14467622,
    "efficientnetv2-s": 21612360,
    "efficientnetv2-m": 54431388,
    "efficientnetv2-l": 119027848,
    "efficientnetv2-xl": 208896832,
}


def _count(model_name):
  m = build_model(model_name)
  shapes = jax.eval_shape(m.init, jax.random.key(0))
  return sum(math.prod(s.shape) for s in jax.tree_util.tree_leaves(shapes))


@pytest.mark.parametrize("name", sorted(GOLDEN_PARAMS))
def test_param_counts(name):
  assert _count(name) == GOLDEN_PARAMS[name]


def test_block_string_decode():
  a = decode_block_string("r2_k3_s2_e4_i48_o64_se0.25")
  assert (a.num_repeat, a.kernel_size, a.strides, a.expand_ratio) == (2, 3, 2, 4)
  assert (a.input_filters, a.output_filters, a.se_ratio) == (48, 64, 0.25)
  assert a.conv_type == 0 and a.id_skip
  b = decode_block_string("r1_k3_s11_e1_i32_o16_c1_noskip")
  assert b.strides == 1 and b.conv_type == 1 and not b.id_skip
  assert len(decode_block_strings(["r1_k3_s1_e1_i8_o8", "r1_k3_s2_e2_i8_o16"])) == 2


def test_round_filters_variants():
  # effnetv2 style (no round-down protection): 16*1.2=19.2 -> 16
  assert round_filters(16, 1.2) == 16
  # efficientdet style (protected): 16 -> 24
  assert round_filters(16, 1.2, round_down_protect=True) == 24
  assert round_filters(32, None) == 32
  assert round_filters(32, 1.0, skip=True) == 32


# Tiny 5-stage config: full models compile too slowly for grads on 1-core CPU.
TINY_BLOCKS = [
    "r1_k3_s1_e1_i8_o8_c1",
    "r1_k3_s2_e4_i8_o16_c1",
    "r1_k3_s2_e4_i16_o16_se0.25",
    "r1_k3_s2_e4_i16_o24_se0.25",
    "r1_k3_s2_e6_i24_o32_se0.25",
]


def _tiny(num_classes=10):
  return build_model("efficientnetv2-b0", num_classes=num_classes,
                     blocks_args=list(TINY_BLOCKS), feature_size=32)


def test_forward_and_endpoints():
  nn.set_policy("float32")
  try:
    m = _tiny()
    params = m.init(jax.random.key(0))
    x = jnp.ones((1, 64, 64, 3))
    logits = m(params, x)
    assert logits.shape == (1, 10)
    eps = m(params, x, features_only=True)
    for i, stride in zip(range(1, 6), (2, 4, 8, 16, 32)):
      assert eps[f"reduction_{i}"].shape[1] == 64 // stride, (i, eps[f"reduction_{i}"].shape)
  finally:
    nn.set_policy("mixed_bfloat16")


def test_train_mode_records_bn_state():
  nn.set_policy("float32")
  try:
    m = _tiny()
    params = m.init(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 3))
    with nn.rng_scope(jax.random.key(2)):
      (logits), updates = nn.run_and_collect_state(
          lambda: m(params, x, train=True))
    assert logits.shape == (2, 10)
    assert updates, "BN must record moving-stat updates in train mode"
    new_params = nn.apply_state_updates({m.name: params}, updates)[m.name]
    assert jax.tree_util.tree_structure(new_params) == jax.tree_util.tree_structure(params)
  finally:
    nn.set_policy("mixed_bfloat16")
