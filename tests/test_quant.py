"""QAT fake-quant tests (capability parity: efficientdet/tf2/tfmot.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from automl_tpu import nn
from automl_tpu.nn import layers as L
from automl_tpu.nn import quant


def test_fake_quant_levels_and_range():
  x = jnp.linspace(-1.0, 1.0, 1000)
  q = quant.fake_quant(x, bits=8)
  # symmetric int8: at most 255 distinct levels, max abs error <= scale/2
  assert len(np.unique(np.asarray(q))) <= 255
  np.testing.assert_allclose(np.asarray(q), np.asarray(x),
                             atol=(1.0 / 127) / 2 + 1e-6)
  # zero input passes through
  np.testing.assert_array_equal(np.asarray(quant.fake_quant(jnp.zeros(4))),
                                np.zeros(4))


def test_fake_quant_per_channel_axis():
  # two channels with very different ranges: per-channel scales keep the
  # small channel precise
  x = jnp.stack([jnp.linspace(-1, 1, 64), 100 * jnp.linspace(-1, 1, 64)], -1)
  q_pc = quant.fake_quant(x, bits=8, axis=-1)
  np.testing.assert_allclose(np.asarray(q_pc[:, 0]), np.asarray(x[:, 0]),
                             atol=1.0 / 127)
  q_pt = quant.fake_quant(x, bits=8, axis=None)
  err_pt = np.abs(np.asarray(q_pt[:, 0] - x[:, 0])).max()
  assert err_pt > 0.1  # per-tensor scale destroys the small channel


def test_fake_quant_straight_through_gradient():
  g = jax.grad(lambda x: jnp.sum(quant.fake_quant(x, bits=4) ** 2))(
      jnp.array([0.3, -0.7, 0.9]))
  # STE: d/dx sum(q(x)^2) = 2*q(x) (identity through the rounding)
  q = quant.fake_quant(jnp.array([0.3, -0.7, 0.9]), bits=4)
  np.testing.assert_allclose(np.asarray(g), 2 * np.asarray(q), rtol=1e-6)


def test_conv_dense_apply_under_qat_scope():
  nn.set_policy("float32")
  try:
    conv = L.Conv2D(4, 8, 3, name="c")
    dense = L.Dense(8, 2, name="d")
    cp = conv.init(jax.random.key(0))
    dp = dense.init(jax.random.key(1))
    x = jax.random.normal(jax.random.key(2), (2, 8, 8, 4))
    y_float = conv(cp, x)
    with quant.qat_scope(bits=8):
      y_qat = conv(cp, x)
      z_qat = dense(dp, y_qat.mean(axis=(1, 2)))
    assert not np.array_equal(np.asarray(y_float), np.asarray(y_qat))
    np.testing.assert_allclose(np.asarray(y_qat), np.asarray(y_float),
                               atol=0.15, rtol=0.25)
    assert np.isfinite(np.asarray(z_qat)).all()
    assert not quant.qat_enabled()  # scope restored
  finally:
    nn.set_policy("mixed_bfloat16")


def test_qat_train_step_converges():
  """A tiny classifier still learns with QAT on (STE gradients flow)."""
  nn.set_policy("float32")
  try:
    import optax
    dense = L.Dense(8, 4, name="d")
    params = dense.init(jax.random.key(0))
    tx = optax.sgd(0.5)
    opt_state = tx.init(params)
    x = jax.random.normal(jax.random.key(1), (32, 8))
    y = jnp.eye(4)[jnp.arange(32) % 4]

    def loss_fn(p):
      logits = dense(p, x)
      return -jnp.mean(jnp.sum(y * jax.nn.log_softmax(logits), -1))

    with quant.qat_scope(bits=8):
      step = jax.jit(lambda p, s: _sgd_step(loss_fn, tx, p, s))
      l0 = float(loss_fn(params))
      for _ in range(30):
        params, opt_state, l = step(params, opt_state)
      assert float(l) < l0 * 0.8, (l0, float(l))
  finally:
    nn.set_policy("mixed_bfloat16")


def _sgd_step(loss_fn, tx, params, opt_state):
  import optax
  l, g = jax.value_and_grad(loss_fn)(params)
  updates, opt_state = tx.update(g, opt_state, params)
  return optax.apply_updates(params, updates), opt_state, l
