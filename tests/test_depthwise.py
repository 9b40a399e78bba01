"""Pallas depthwise filter-grad kernel: numerics vs XLA (interpret mode on
CPU; the kernel itself was compile- and numerics-checked on the chip, see
ops/depthwise.py). The kernel is OFF by default (measured whole-step
regression — honest negative recorded in ops/depthwise.py / PERF_NOTES)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from automl_tpu.ops import depthwise


@pytest.mark.parametrize("h,w,c,k", [(16, 16, 8, 3), (15, 17, 8, 5),
                                     (32, 32, 16, 3)])
def test_filter_grad_matches_xla(h, w, c, k):
  rng = np.random.RandomState(0)
  x = jnp.asarray(rng.randn(2, h, w, c), jnp.float32)
  ker = jnp.asarray(rng.randn(k, k, 1, c), jnp.float32)
  dy_shape = jax.eval_shape(
      lambda a, b: depthwise._dw_forward(a, b, (1, 1), "SAME"), x, ker).shape
  dy = jnp.asarray(rng.randn(*dy_shape), jnp.float32)
  dw_pallas = depthwise.depthwise_filter_grad(x, dy, k, 1, interpret=True)
  _, vjp = jax.vjp(lambda kk: depthwise._dw_forward(x, kk, (1, 1), "SAME"),
                   ker)
  (dw_xla,) = vjp(dy)
  np.testing.assert_allclose(np.asarray(dw_pallas), np.asarray(dw_xla),
                             atol=2e-4, rtol=1e-5)


def test_custom_vjp_wrapper_grads_match_plain_conv():
  """The opt-in depthwise_conv wrapper (XLA fallback path on CPU) must give
  identical dx/dw to the plain conv, including stride 2 and k5."""
  rng = np.random.RandomState(1)
  for (s, k) in [(1, 3), (2, 3), (1, 5)]:
    x = jnp.asarray(rng.randn(2, 12, 12, 4), jnp.float32)
    ker = jnp.asarray(rng.randn(k, k, 1, 4), jnp.float32)

    def loss_wrap(x, ker):
      return jnp.sum(jnp.sin(depthwise.depthwise_conv(x, ker, (s, s),
                                                      "SAME")))

    def loss_plain(x, ker):
      return jnp.sum(jnp.sin(depthwise._dw_forward(x, ker, (s, s), "SAME")))

    g1 = jax.grad(loss_wrap, (0, 1))(x, ker)
    g2 = jax.grad(loss_plain, (0, 1))(x, ker)
    for a, b in zip(g1, g2):
      np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_default_off_and_toggle():
  assert not depthwise.pallas_filter_grad_enabled()
  depthwise.enable_pallas_filter_grad(True)
  try:
    assert depthwise.pallas_filter_grad_enabled()
  finally:
    depthwise.enable_pallas_filter_grad(False)


@pytest.mark.parametrize("s,k,pad", [(1, 3, "SAME"), (2, 3, "SAME"),
                                     (1, 5, "SAME"), (2, 5, "SAME"),
                                     (1, 3, "VALID"), (2, 3, "VALID")])
def test_shift_and_add_matches_conv_values_and_grads(s, k, pad):
  """The shift-and-add forward must equal the XLA grouped conv — values AND
  both gradients — incl. odd sizes (asymmetric SAME pads) and stride 2."""
  rng = np.random.RandomState(2)
  x = jnp.asarray(rng.randn(2, 13, 11, 8), jnp.float32)
  ker = jnp.asarray(rng.randn(k, k, 1, 8), jnp.float32)

  def loss(fn):
    def f(x, ker):
      return jnp.sum(jnp.sin(fn(x, ker)))
    return f

  conv = lambda x, kk: depthwise._dw_forward(x, kk, (s, s), pad)
  shift = lambda x, kk: depthwise.depthwise_shift_and_add(x, kk, (s, s), pad)
  y_conv, y_shift = conv(x, ker), shift(x, ker)
  assert y_conv.shape == y_shift.shape
  np.testing.assert_allclose(np.asarray(y_shift), np.asarray(y_conv),
                             atol=1e-5, rtol=1e-5)
  g_conv = jax.grad(loss(conv), argnums=(0, 1))(x, ker)
  g_shift = jax.grad(loss(shift), argnums=(0, 1))(x, ker)
  for a, b in zip(g_shift, g_conv):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-5, rtol=1e-5)


def test_shift_and_add_layer_dispatch():
  """DepthwiseConv2D routes through shift-and-add when the impl is set, and
  the module output matches the default conv path exactly (f32)."""
  from automl_tpu import nn
  from automl_tpu.nn import layers

  nn.set_policy("float32")
  try:
    layer = layers.DepthwiseConv2D(8, kernel_size=3, strides=2)
    params = layer.init(jax.random.key(0))
    x = jnp.asarray(np.random.RandomState(3).randn(2, 9, 9, 8), jnp.float32)
    y_conv = layer(params, x)
    depthwise.set_forward_impl("shift")
    try:
      y_shift = layer(params, x)
    finally:
      depthwise.set_forward_impl("conv")
    np.testing.assert_allclose(np.asarray(y_shift), np.asarray(y_conv),
                               atol=1e-5, rtol=1e-5)
    assert depthwise.forward_impl() == "conv"
  finally:
    nn.set_policy("mixed_bfloat16")
