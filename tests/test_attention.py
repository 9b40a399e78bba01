"""Flash attention golden tests vs dense attention (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from automl_tpu.ops.attention import dense_attention, flash_attention


def _qkv(b=2, t=64, n=2, nkv=None, h=16, seed=0):
  nkv = nkv or n
  keys = jax.random.split(jax.random.key(seed), 3)
  q = jax.random.normal(keys[0], (b, t, n, h))
  k = jax.random.normal(keys[1], (b, t, nkv, h))
  v = jax.random.normal(keys[2], (b, t, nkv, h))
  return q, k, v


@pytest.mark.parametrize("window,logit_cap", [
    (None, 0.0), (None, 50.0), (16, 0.0), (16, 50.0)])
def test_flash_matches_dense(window, logit_cap):
  q, k, v = _qkv()
  out = flash_attention(q, k, v, window=window, logit_cap=logit_cap,
                        block_q=16, block_k=16, interpret=True)
  want = dense_attention(q, k, v, window=window, logit_cap=logit_cap)
  np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-5)


def test_flash_gqa():
  q, k, v = _qkv(n=4, nkv=2)
  out = flash_attention(q, k, v, block_q=16, block_k=16, interpret=True)
  want = dense_attention(q, k, v)
  np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-5)


def test_flash_non_divisible_t():
  q, k, v = _qkv(t=48)
  out = flash_attention(q, k, v, block_q=32, block_k=32, interpret=True)
  want = dense_attention(q, k, v)
  np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-5)


def _segments(b, t, seed=7):
  """Random monotone segment ids (packed-documents shape)."""
  lengths = jax.random.randint(jax.random.key(seed), (b, t), 0, 2)
  return jnp.cumsum(lengths, axis=1).astype(jnp.int32)


@pytest.mark.parametrize("window,logit_cap", [(None, 0.0), (16, 50.0)])
def test_flash_segment_ids_match_dense(window, logit_cap):
  # Regression (ADVICE r1): flash path must honour packed-segment masks.
  q, k, v = _qkv(t=64)
  seg = _segments(2, 64)
  out = flash_attention(q, k, v, window=window, logit_cap=logit_cap,
                        segment_ids=seg, block_q=16, block_k=16,
                        interpret=True)
  want = dense_attention(q, k, v, window=window, logit_cap=logit_cap,
                         segment_ids=seg)
  np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-5)


def test_flash_segment_gradients_match_dense():
  q, k, v = _qkv(b=1, t=32, n=2, h=8)
  seg = _segments(1, 32)

  def loss_flash(q, k, v):
    return jnp.sum(jnp.square(flash_attention(
        q, k, v, segment_ids=seg, block_q=16, block_k=16, interpret=True)))

  def loss_dense(q, k, v):
    return jnp.sum(jnp.square(dense_attention(q, k, v, segment_ids=seg)))

  g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
  g2 = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
  for a, b_ in zip(g1, g2):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                               atol=3e-4, rtol=1e-3)


def test_flash_segment_gqa():
  q, k, v = _qkv(n=4, nkv=2, t=64)
  seg = _segments(2, 64)
  out = flash_attention(q, k, v, segment_ids=seg, block_q=16, block_k=16,
                        interpret=True)
  want = dense_attention(q, k, v, segment_ids=seg)
  np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("window,logit_cap", [(None, 0.0), (8, 50.0)])
def test_flash_gradients_match_dense(window, logit_cap):
  q, k, v = _qkv(b=1, t=32, n=2, h=8)

  def loss_flash(q, k, v):
    return jnp.sum(jnp.square(flash_attention(
        q, k, v, window=window, logit_cap=logit_cap,
        block_q=16, block_k=16, interpret=True)))

  def loss_dense(q, k, v):
    return jnp.sum(jnp.square(dense_attention(
        q, k, v, window=window, logit_cap=logit_cap)))

  g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
  g2 = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
  for a, b_ in zip(g1, g2):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                               atol=3e-4, rtol=1e-3)


def test_flash_gradients_non_divisible_t():
  """Regression: with T % block_q != 0, pad q rows read uninitialized
  lse/delta; the unmasked p matrix used to poison dv with NaN
  (NEG_INF - NaN = NaN, then NaN * 0 = NaN in the contraction)."""
  q, k, v = _qkv(b=1, t=40, n=2, h=8)

  def loss_flash(q, k, v):
    return jnp.sum(jnp.square(flash_attention(
        q, k, v, block_q=16, block_k=16, interpret=True)))

  def loss_dense(q, k, v):
    return jnp.sum(jnp.square(dense_attention(q, k, v)))

  g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
  g2 = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
  for a, b_ in zip(g1, g2):
    assert np.isfinite(np.asarray(a)).all()
    np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                               atol=3e-4, rtol=1e-3)


@pytest.mark.parametrize("window,logit_cap", [(None, 0.0), (8, 50.0)])
def test_flash_fused_bwd_gradients_match_dense(window, logit_cap):
  """bwd_fused=True: one kernel emits dq partials + dk/dv from a single
  s/p recompute; grads must match dense exactly like the split kernels."""
  q, k, v = _qkv(b=1, t=32, n=2, h=8)

  def loss_flash(q, k, v):
    return jnp.sum(jnp.square(flash_attention(
        q, k, v, window=window, logit_cap=logit_cap,
        block_q=16, block_k=16, bwd_fused=True, interpret=True)))

  def loss_dense(q, k, v):
    return jnp.sum(jnp.square(dense_attention(
        q, k, v, window=window, logit_cap=logit_cap)))

  g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
  g2 = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
  for a, b_ in zip(g1, g2):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                               atol=3e-4, rtol=1e-3)


def test_flash_fused_bwd_segments_gqa_nondivisible():
  """Fused backward with packed segments + GQA + T % block != 0 (pads):
  the dq-partial buffer zeroes dead blocks, so pad/masked tiles must not
  poison the sum-over-k reduction."""
  q, k, v = _qkv(b=1, t=40, n=4, nkv=2, h=8)
  seg = _segments(1, 40)

  def loss_flash(q, k, v):
    return jnp.sum(jnp.square(flash_attention(
        q, k, v, segment_ids=seg, block_q=16, block_k=16,
        bwd_fused=True, interpret=True)))

  def loss_dense(q, k, v):
    return jnp.sum(jnp.square(dense_attention(q, k, v, segment_ids=seg)))

  g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
  g2 = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
  for a, b_ in zip(g1, g2):
    assert np.isfinite(np.asarray(a)).all()
    np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                               atol=3e-4, rtol=1e-3)


def test_flash_bwd_blocks_differ_from_fwd():
  """block_q_bwd/block_k_bwd tile ONLY the dq/dkv kernels; grads must match
  dense for bwd blocks that differ from the fwd blocks (incl. non-dividing
  T on the bwd tiling)."""
  q, k, v = _qkv(b=1, t=48, n=2, h=8)

  def loss_dense(q, k, v):
    return jnp.sum(jnp.square(dense_attention(q, k, v)))

  g2 = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
  for bq_bwd, bk_bwd in ((32, 8), (8, 32), (16, 16)):
    def loss_flash(q, k, v):
      return jnp.sum(jnp.square(flash_attention(
          q, k, v, block_q=16, block_k=16,
          block_q_bwd=bq_bwd, block_k_bwd=bk_bwd, interpret=True)))

    out = flash_attention(q, k, v, block_q=16, block_k=16,
                          block_q_bwd=bq_bwd, block_k_bwd=bk_bwd,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(dense_attention(q, k, v)),
                               atol=2e-5)
    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
      assert np.isfinite(np.asarray(a)).all()
      np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                 atol=3e-4, rtol=1e-3)
