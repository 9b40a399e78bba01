"""Layer tests: shapes, BN state collection, mixed precision, stochastic ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from automl_tpu import nn
from automl_tpu.nn import layers as L


@pytest.fixture(autouse=True)
def f32_policy():
  nn.set_policy("float32")
  yield
  nn.set_policy("mixed_bfloat16")


def test_conv_shape_and_stride():
  conv = L.Conv2D(3, 16, kernel_size=3, strides=2, name="c")
  params = conv.init(jax.random.key(0))
  x = jnp.ones((2, 8, 8, 3))
  y = conv(params, x)
  assert y.shape == (2, 4, 4, 16)


def test_depthwise_conv():
  dw = L.DepthwiseConv2D(8, kernel_size=3, name="dw")
  params = dw.init(jax.random.key(0))
  assert params["kernel"].shape == (3, 3, 1, 8)
  y = dw(params, jnp.ones((1, 4, 4, 8)))
  assert y.shape == (1, 4, 4, 8)


def test_separable_conv():
  sc = L.SeparableConv2D(8, 16, name="sc")
  params = sc.init(jax.random.key(0))
  y = sc(params, jnp.ones((1, 4, 4, 8)))
  assert y.shape == (1, 4, 4, 16)


def test_bn_train_records_state_and_normalizes():
  bn = L.BatchNorm(4, momentum=0.9, name="bn")
  params = bn.init(None)
  x = jax.random.normal(jax.random.key(1), (16, 8, 8, 4)) * 3.0 + 2.0

  (y, updates) = nn.run_and_collect_state(lambda: bn(params, x, train=True))
  assert y.shape == x.shape
  np.testing.assert_allclose(np.mean(np.asarray(y)), 0.0, atol=1e-3)
  np.testing.assert_allclose(np.std(np.asarray(y)), 1.0, atol=1e-2)
  assert ("bn", "moving_mean") in updates
  # moving_mean moved 10% of the way toward the batch mean (~2.0).
  np.testing.assert_allclose(
      np.asarray(updates[("bn", "moving_mean")]),
      0.1 * np.mean(np.asarray(x), axis=(0, 1, 2)), rtol=1e-5)

  new_tree = nn.apply_state_updates({"bn": params}, updates)
  assert not np.allclose(new_tree["bn"]["moving_mean"], params["moving_mean"])


def test_bn_eval_uses_moving_stats():
  bn = L.BatchNorm(2, name="bn")
  params = bn.init(None)
  params["moving_mean"] = jnp.array([1.0, -1.0])
  params["moving_variance"] = jnp.array([4.0, 4.0])
  x = jnp.ones((1, 1, 1, 2))
  y = bn(params, x, train=False)
  np.testing.assert_allclose(
      np.asarray(y)[0, 0, 0], [(1 - 1) / 2.0, (1 + 1) / 2.0], atol=1e-3)


def test_trainable_mask_excludes_batch_stats():
  bn = L.BatchNorm(4, name="bn")
  params = {"bn": bn.init(None)}
  mask = nn.trainable_mask(params)
  assert mask["bn"]["gamma"] is True
  assert mask["bn"]["moving_mean"] is False
  assert mask["bn"]["moving_variance"] is False


def test_drop_connect_train_vs_eval():
  x = jnp.ones((8, 2, 2, 3))
  assert (L.drop_connect(x, train=False, survival_prob=0.5) == x).all()
  with nn.rng_scope(jax.random.key(0)):
    y = L.drop_connect(x, train=True, survival_prob=0.5)
  vals = np.unique(np.asarray(y))
  assert set(vals.tolist()) <= {0.0, 2.0}


def test_squeeze_excite():
  se = L.SqueezeExcite(8, 2, name="se")
  params = se.init(jax.random.key(0))
  y = se(params, jnp.ones((2, 4, 4, 8)))
  assert y.shape == (2, 4, 4, 8)


def test_mixed_precision_policy():
  nn.set_policy("mixed_bfloat16")
  conv = L.Conv2D(3, 8, name="c")
  params = conv.init(jax.random.key(0))
  assert params["kernel"].dtype == jnp.float32
  y = conv(params, jnp.ones((1, 4, 4, 3), jnp.bfloat16))
  assert y.dtype == jnp.bfloat16


def test_resize_nearest_and_pool():
  x = jnp.arange(16.0).reshape(1, 4, 4, 1)
  up = L.resize_nearest(x, (8, 8))
  assert up.shape == (1, 8, 8, 1)
  assert up[0, 0, 0, 0] == up[0, 1, 1, 0] == x[0, 0, 0, 0]
  down = L.max_pool(x, 2, 2)
  assert down.shape == (1, 2, 2, 1)
  assert down[0, 0, 0, 0] == 5.0


def test_rng_scope_deterministic():
  with nn.rng_scope(jax.random.key(7)):
    k1 = nn.make_rng("a")
  with nn.rng_scope(jax.random.key(7)):
    k2 = nn.make_rng("a")
    k3 = nn.make_rng("b")
  assert (jax.random.key_data(k1) == jax.random.key_data(k2)).all()
  assert not (jax.random.key_data(k2) == jax.random.key_data(k3)).all()
