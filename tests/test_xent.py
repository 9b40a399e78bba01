"""Fused softmax-xent kernel (ops/xent.py) vs dense reference.

Shapes are deliberately non-divisible (M=100 vs block_m=64, V=1000 vs
block_v=256) so grid padding / column masking / pad-row zeroing are all
exercised — interpret mode pads out-of-bounds reads with NaN (CLAUDE.md),
so any missing mask shows up as NaN here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from automl_tpu.ops import xent as xent_ops


def dense_loss(x, w, targets, weights, *, tied=True, logit_cap=0.0,
               dtype=jnp.float32):
  """Literal transcription of the XLA chain (models/lm.py unembed_logits +
  lm_loss): projection at `dtype` operands / f32 accum, cap, f32 xent."""
  x2 = x.reshape(-1, x.shape[-1]).astype(dtype)
  eq = "md,vd->mv" if tied else "md,dv->mv"
  logits = jnp.einsum(eq, x2, w.astype(dtype),
                      preferred_element_type=jnp.float32)
  if logit_cap:
    logits = logit_cap * jnp.tanh(logits / logit_cap)
  logp = jax.nn.log_softmax(logits)
  t = targets.reshape(-1)
  nll = -jnp.take_along_axis(logp, t[:, None], axis=-1)[:, 0]
  wts = (jnp.ones(t.shape, jnp.float32) if weights is None
         else weights.reshape(-1).astype(jnp.float32))
  return jnp.sum(nll * wts) / jnp.maximum(jnp.sum(wts), 1.0)


def make_case(key, m=100, d=128, v=1000, tied=True, x_dtype=jnp.float32):
  kx, kw, kt, kwt = jax.random.split(key, 4)
  x = (jax.random.normal(kx, (m, d)) * 0.5).astype(x_dtype)
  w_shape = (v, d) if tied else (d, v)
  w = jax.random.normal(kw, w_shape) * (d ** -0.5)
  targets = jax.random.randint(kt, (m,), 0, v)
  weights = jnp.where(jax.random.uniform(kwt, (m,)) > 0.2, 1.0, 0.0)
  return x, w, targets, weights


BLOCKS = dict(block_m=64, block_v=256)


@pytest.mark.parametrize("logit_cap", [0.0, 30.0])
def test_forward_matches_dense_f32(logit_cap):
  x, w, targets, weights = make_case(jax.random.key(0))
  got = xent_ops.fused_softmax_xent(
      x, w, targets, weights, logit_cap=logit_cap,
      operand_dtype="float32", **BLOCKS)
  want = dense_loss(x, w, targets, weights, logit_cap=logit_cap)
  np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_grads_match_dense_f32():
  x, w, targets, weights = make_case(jax.random.key(1))
  cap = 30.0

  def ours(x, w):
    return xent_ops.fused_softmax_xent(
        x, w, targets, weights, logit_cap=cap,
        operand_dtype="float32", **BLOCKS)

  def ref(x, w):
    return dense_loss(x, w, targets, weights, logit_cap=cap)

  (gx, gw) = jax.grad(ours, argnums=(0, 1))(x, w)
  (rx, rw) = jax.grad(ref, argnums=(0, 1))(x, w)
  np.testing.assert_allclose(gx, rx, rtol=1e-4, atol=1e-6)
  np.testing.assert_allclose(gw, rw, rtol=1e-4, atol=1e-6)


def test_bf16_operands_match_dense_bf16():
  x, w, targets, weights = make_case(jax.random.key(2),
                                     x_dtype=jnp.bfloat16)
  got = xent_ops.fused_softmax_xent(x, w, targets, weights,
                                    logit_cap=30.0, **BLOCKS)
  want = dense_loss(x, w, targets, weights, logit_cap=30.0,
                    dtype=jnp.bfloat16)
  np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

  # grads: vs autodiff of the bf16 dense chain with a bf16 cotangent cast
  # (the bfloat16_vjp structure) — same operand precision, loose tol for
  # the bf16 dz rounding
  def ours(x, w):
    return xent_ops.fused_softmax_xent(x, w, targets, weights,
                                       logit_cap=30.0, **BLOCKS)

  def ref(x, w):
    return dense_loss(x, w, targets, weights, logit_cap=30.0,
                      dtype=jnp.bfloat16)

  gx, gw = jax.grad(ours, argnums=(0, 1))(x, w)
  rx, rw = jax.grad(ref, argnums=(0, 1))(x, w)
  assert gx.dtype == x.dtype
  np.testing.assert_allclose(gx.astype(np.float32), rx.astype(np.float32),
                             rtol=0.05, atol=1e-4)
  np.testing.assert_allclose(gw, rw, rtol=0.05, atol=1e-4)


def test_untied_layout():
  x, w, targets, weights = make_case(jax.random.key(3), tied=False)

  def ours(x, w):
    return xent_ops.fused_softmax_xent(
        x, w, targets, weights, tied=False, logit_cap=30.0,
        operand_dtype="float32", **BLOCKS)

  def ref(x, w):
    return dense_loss(x, w, targets, weights, tied=False, logit_cap=30.0)

  np.testing.assert_allclose(ours(x, w), ref(x, w), rtol=1e-5, atol=1e-5)
  gx, gw = jax.grad(ours, argnums=(0, 1))(x, w)
  rx, rw = jax.grad(ref, argnums=(0, 1))(x, w)
  assert gw.shape == w.shape
  np.testing.assert_allclose(gx, rx, rtol=1e-4, atol=1e-6)
  np.testing.assert_allclose(gw, rw, rtol=1e-4, atol=1e-6)


def test_default_weights_and_3d_input():
  b, t, d, v = 2, 50, 128, 1000
  key = jax.random.key(4)
  x = jax.random.normal(key, (b, t, d)) * 0.5
  w = jax.random.normal(jax.random.key(5), (v, d)) * (d ** -0.5)
  targets = jax.random.randint(jax.random.key(6), (b, t), 0, v)
  got = xent_ops.fused_softmax_xent(x, w, targets, operand_dtype="float32",
                                    **BLOCKS)
  want = dense_loss(x, w, targets, None)
  np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_zero_weight_tokens_have_zero_grad_contribution():
  """A token with loss weight 0 must not influence dx at its own row."""
  x, w, targets, _ = make_case(jax.random.key(7))
  weights = jnp.ones((x.shape[0],)).at[3].set(0.0)

  def ours(x):
    return xent_ops.fused_softmax_xent(
        x, w, targets, weights, operand_dtype="float32", **BLOCKS)

  gx = jax.grad(ours)(x)
  np.testing.assert_allclose(gx[3], np.zeros_like(gx[3]), atol=1e-9)


def test_lm_loss_fused_pallas_matches_unfused():
  """Trainer-level parity: fused_softmax_loss='pallas' == the bf16-operand
  XLA path (same training precision), loss and grads."""
  from automl_tpu.models import lm as lm_lib
  from automl_tpu.train import lm_trainer, optimizers as opt_lib

  def build(loss_mode):
    cfg = lm_lib.lm_defaults()
    cfg.update(dict(model_dim=64, n_layers=2, n_heads=2, n_kv_heads=2,
                    head_dim=32, vocab_size=256, seq_len=32,
                    use_flash_attention=False))
    if loss_mode == "pallas":
      cfg.update(dict(fused_softmax_loss="pallas"))
    else:
      cfg.update(dict(unembed_matmul_dtype="bfloat16_vjp"))
    model = lm_lib.TransformerLM(cfg)
    return cfg, model

  cfg, model = build("pallas")
  params = model.init(jax.random.key(0))
  tx = opt_lib.build_optimizer("lion", 1e-3)
  batch = {"tokens": jax.random.randint(jax.random.key(1), (2, 33), 0,
                                        cfg.vocab_size)}
  state = lm_trainer.LMTrainState(jnp.zeros((), jnp.int32), params,
                                  tx.init(params))
  step_p = lm_trainer.make_lm_train_step(model, tx)
  _, logs_p = step_p(state, batch)

  _, model_u = build("unfused")
  step_u = lm_trainer.make_lm_train_step(model_u, tx)
  _, logs_u = step_u(state, batch)

  np.testing.assert_allclose(logs_p["loss"], logs_u["loss"],
                             rtol=2e-3, atol=2e-3)
  np.testing.assert_allclose(logs_p["gnorm"], logs_u["gnorm"],
                             rtol=2e-2, atol=2e-3)
