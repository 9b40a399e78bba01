"""Fused softmax cross-entropy for TPU: the [M, V] logits never exist.

The LM loss chain (unembed dot + f32 log-softmax + xent backward + unembed
grads) is ~10% of the 234M train step at near-zero counted matmul flops
(PERF_NOTES round 5 op budget): the [B*T, V] f32 logits are 2.1 GiB at
b8 T2048 V32k and the XLA chain streams them through HBM several times.
The reference computes exactly this chain dense (hero/model_lib.py:
1100-1104 final projection + logit cap, 1285-1304 masked xent).

Here the chain is three flash-style Pallas kernels over (token-block,
vocab-block) tiles; logits live only as a [block_m, block_v] f32 VMEM tile:

  * forward: grid (num_m, num_v), v innermost. VMEM scratch carries the
    running (row-max, sum-exp, target-logit) across vocab blocks — online
    logsumexp exactly as in flash attention (ops/attention.py), plus a
    masked row-sum that extracts each row's target logit in-kernel (each
    target id hits exactly one vocab block). Outputs per token: lse and
    z[target]; loss = sum(w * (lse - z_tgt)) / max(sum(w), 1).
  * backward dx: grid (num_m, num_v). Recomputes the logit tile, forms
    dz = coef * (softmax - onehot) (* the tanh-cap jacobian), accumulates
    dz @ W into a [block_m, D] VMEM scratch across vocab blocks.
  * backward dW: grid (num_v, num_m), m innermost. Same dz recompute,
    accumulates dz^T @ x into a [block_v, D] f32 scratch across token
    blocks.

Matmul operands are bf16 with f32 accumulation by default — the same
training precision as the reference (hero runs the final projection at the
activation dtype, model_lib.py:1101) and as unembed_matmul_dtype=
"bfloat16_vjp"; operand_dtype="float32" gives a bit-strict variant for
golden tests. Per-token values (targets, lse, coef) ride lane-broadcast
[M, 128] operands so rows land on sublanes without in-kernel transposes
(same layout trick as the attention backward).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LANES = 128


def _logit_tile(x, w, vj, block_v, vocab, logit_cap):
  """One [block_m, block_v] f32 logit tile (+ cap), cols >= vocab -> NEG_INF.

  Returns (z_masked, dcap, valid): dcap is the tanh-cap jacobian evaluated
  at the raw logits (1.0 when no cap), valid the in-vocab column mask."""
  z = jax.lax.dot_general(x, w, (((1,), (1,)), ((), ())),
                          preferred_element_type=jnp.float32)
  if logit_cap:
    t = jnp.tanh(z / logit_cap)
    dcap = 1.0 - jnp.square(t)
    z = logit_cap * t
  else:
    dcap = None
  cols = vj * block_v + jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
  valid = cols < vocab
  return jnp.where(valid, z, NEG_INF), dcap, cols, valid


def _fwd_kernel(x_ref, w_ref, tgt_ref, lse_ref, tz_ref, m_scr, l_scr, t_scr,
                *, block_v, num_v_blocks, vocab, logit_cap):
  vj = pl.program_id(1)

  @pl.when(vj == 0)
  def _init():
    m_scr[:] = jnp.full_like(m_scr, NEG_INF)
    l_scr[:] = jnp.zeros_like(l_scr)
    t_scr[:] = jnp.zeros_like(t_scr)

  x = x_ref[:]
  w = w_ref[:]
  z, _, cols, valid = _logit_tile(x, w, vj, block_v, vocab, logit_cap)

  m_prev = m_scr[:]
  m_new = jnp.maximum(m_prev, jnp.max(z, axis=1, keepdims=True))
  alpha = jnp.exp(m_prev - m_new)
  l_scr[:] = alpha * l_scr[:] + jnp.sum(jnp.exp(z - m_new), axis=1,
                                        keepdims=True)
  m_scr[:] = m_new

  tgt = tgt_ref[:, :1]                      # [bm, 1] (lane-broadcast input)
  sel = jnp.logical_and(cols == tgt, valid)
  t_scr[:] = t_scr[:] + jnp.sum(jnp.where(sel, z, 0.0), axis=1,
                                keepdims=True)

  @pl.when(vj == num_v_blocks - 1)
  def _finalize():
    lse = (m_scr[:] + jnp.log(l_scr[:]))[:, 0]
    # (8, bm) output blocks satisfy TPU (8, 128) tiling; caller reads row 0
    lse_ref[:] = jnp.broadcast_to(lse[None, :], (8, lse.shape[0]))
    tz_ref[:] = jnp.broadcast_to(t_scr[:, 0][None, :], (8, lse.shape[0]))


def _dz_tile(x, w, tgt_ref, lse_ref, coef_ref, vj, block_v, vocab, logit_cap):
  """Recompute one logit tile and its xent gradient dz [bm, bv] (f32)."""
  z, dcap, cols, valid = _logit_tile(x, w, vj, block_v, vocab, logit_cap)
  lse = lse_ref[:, :1]                       # [bm, 1]
  coef = coef_ref[:, :1]                     # [bm, 1] = g * w_i / sum_w
  p = jnp.where(valid, jnp.exp(z - lse), 0.0)
  sel = jnp.logical_and(cols == tgt_ref[:, :1], valid)
  dz = coef * (p - jnp.where(sel, 1.0, 0.0))
  if dcap is not None:
    dz = dz * dcap
  return jnp.where(valid, dz, 0.0)


def _dx_kernel(x_ref, w_ref, tgt_ref, lse_ref, coef_ref, dx_ref, dx_scr,
               *, block_v, num_v_blocks, vocab, logit_cap):
  vj = pl.program_id(1)

  @pl.when(vj == 0)
  def _init():
    dx_scr[:] = jnp.zeros_like(dx_scr)

  x = x_ref[:]
  # zero pad vocab rows: they are uninitialized and dz == 0 there cannot
  # mask NaNs through the dz @ w dot (0 * NaN = NaN)
  rows = vj * block_v + jax.lax.broadcasted_iota(
      jnp.int32, (w_ref.shape[0], 1), 0)
  w = jnp.where(rows < vocab, w_ref[:], 0)
  dz = _dz_tile(x, w, tgt_ref, lse_ref, coef_ref, vj, block_v, vocab,
                logit_cap)
  dx_scr[:] = dx_scr[:] + jax.lax.dot_general(
      dz.astype(w.dtype), w, (((1,), (0,)), ((), ())),
      preferred_element_type=jnp.float32)

  @pl.when(vj == num_v_blocks - 1)
  def _finalize():
    dx_ref[:] = dx_scr[:].astype(dx_ref.dtype)


def _dw_kernel(x_ref, w_ref, tgt_ref, lse_ref, coef_ref, dw_ref, dw_scr,
               *, block_m, block_v, num_m_blocks, n_tokens, vocab, logit_cap):
  mi = pl.program_id(1)
  vj = pl.program_id(0)

  @pl.when(mi == 0)
  def _init():
    dw_scr[:] = jnp.zeros_like(dw_scr)

  # zero pad token rows: their x/lse/coef are uninitialized and would
  # pollute the dw accumulation (and 0 * NaN = NaN through the dot)
  rows = mi * block_m + jax.lax.broadcasted_iota(
      jnp.int32, (x_ref.shape[0], 1), 0)
  m_valid = rows < n_tokens
  x = jnp.where(m_valid, x_ref[:], 0)
  dz = _dz_tile(x, w_ref[:], tgt_ref, lse_ref, coef_ref, vj, block_v,
                vocab, logit_cap)
  dz = jnp.where(m_valid, dz, 0.0)
  dw_scr[:] = dw_scr[:] + jax.lax.dot_general(
      dz.astype(x.dtype), x, (((0,), (0,)), ((), ())),
      preferred_element_type=jnp.float32)

  @pl.when(mi == num_m_blocks - 1)
  def _finalize():
    dw_ref[:] = dw_scr[:].astype(dw_ref.dtype)


def _broadcast_lanes(a, dtype):
  return jnp.broadcast_to(a.astype(dtype)[:, None], (a.shape[0], LANES))


def _fwd_pallas(xo, wo, tgt, *, logit_cap, block_m, block_v, interpret):
  m, d = xo.shape
  v = wo.shape[0]
  block_m = min(block_m, m)
  block_v = min(block_v, v)
  num_m = pl.cdiv(m, block_m)
  num_v = pl.cdiv(v, block_v)
  lse8, tz8 = pl.pallas_call(
      functools.partial(_fwd_kernel, block_v=block_v, num_v_blocks=num_v,
                        vocab=v, logit_cap=logit_cap),
      grid=(num_m, num_v),
      in_specs=[
          pl.BlockSpec((block_m, d), lambda i, j: (i, 0)),
          pl.BlockSpec((block_v, d), lambda i, j: (j, 0)),
          pl.BlockSpec((block_m, LANES), lambda i, j: (i, 0)),
      ],
      out_specs=[
          pl.BlockSpec((8, block_m), lambda i, j: (0, i)),
          pl.BlockSpec((8, block_m), lambda i, j: (0, i)),
      ],
      out_shape=[
          jax.ShapeDtypeStruct((8, m), jnp.float32),
          jax.ShapeDtypeStruct((8, m), jnp.float32),
      ],
      scratch_shapes=[pltpu.VMEM((block_m, 1), jnp.float32),
                      pltpu.VMEM((block_m, 1), jnp.float32),
                      pltpu.VMEM((block_m, 1), jnp.float32)],
      interpret=interpret,
  )(xo, wo, _broadcast_lanes(tgt, jnp.int32))
  return lse8[0], tz8[0]


def _bwd_pallas(xo, wo, tgt, lse, coef, *, logit_cap, block_m, block_v,
                interpret, x_dtype, w_dtype):
  m, d = xo.shape
  v = wo.shape[0]
  block_m = min(block_m, m)
  block_v = min(block_v, v)
  num_m = pl.cdiv(m, block_m)
  num_v = pl.cdiv(v, block_v)
  tgtb = _broadcast_lanes(tgt, jnp.int32)
  lseb = _broadcast_lanes(lse, jnp.float32)
  coefb = _broadcast_lanes(coef, jnp.float32)

  dx = pl.pallas_call(
      functools.partial(_dx_kernel, block_v=block_v, num_v_blocks=num_v,
                        vocab=v, logit_cap=logit_cap),
      grid=(num_m, num_v),
      in_specs=[
          pl.BlockSpec((block_m, d), lambda i, j: (i, 0)),
          pl.BlockSpec((block_v, d), lambda i, j: (j, 0)),
          pl.BlockSpec((block_m, LANES), lambda i, j: (i, 0)),
          pl.BlockSpec((block_m, LANES), lambda i, j: (i, 0)),
          pl.BlockSpec((block_m, LANES), lambda i, j: (i, 0)),
      ],
      out_specs=pl.BlockSpec((block_m, d), lambda i, j: (i, 0)),
      out_shape=jax.ShapeDtypeStruct((m, d), x_dtype),
      scratch_shapes=[pltpu.VMEM((block_m, d), jnp.float32)],
      interpret=interpret,
  )(xo, wo, tgtb, lseb, coefb)

  dw = pl.pallas_call(
      functools.partial(_dw_kernel, block_m=block_m, block_v=block_v,
                        num_m_blocks=num_m, n_tokens=m, vocab=v,
                        logit_cap=logit_cap),
      grid=(num_v, num_m),
      in_specs=[
          pl.BlockSpec((block_m, d), lambda j, i: (i, 0)),
          pl.BlockSpec((block_v, d), lambda j, i: (j, 0)),
          pl.BlockSpec((block_m, LANES), lambda j, i: (i, 0)),
          pl.BlockSpec((block_m, LANES), lambda j, i: (i, 0)),
          pl.BlockSpec((block_m, LANES), lambda j, i: (i, 0)),
      ],
      out_specs=pl.BlockSpec((block_v, d), lambda j, i: (j, 0)),
      out_shape=jax.ShapeDtypeStruct((v, d), w_dtype),
      scratch_shapes=[pltpu.VMEM((block_v, d), jnp.float32)],
      interpret=interpret,
  )(xo, wo, tgtb, lseb, coefb)
  return dx, dw


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _fused_xent(x, w, targets, weights, logit_cap, block_m, block_v,
                operand_dtype, interpret):
  loss, _ = _fused_xent_fwd(x, w, targets, weights, logit_cap, block_m,
                            block_v, operand_dtype, interpret)
  return loss


def _fused_xent_fwd(x, w, targets, weights, logit_cap, block_m, block_v,
                    operand_dtype, interpret):
  xo = x.astype(operand_dtype)
  wo = w.astype(operand_dtype)
  lse, tz = _fwd_pallas(xo, wo, targets, logit_cap=logit_cap,
                        block_m=block_m, block_v=block_v,
                        interpret=interpret)
  wts = weights.astype(jnp.float32)
  sum_w = jnp.maximum(jnp.sum(wts), 1.0)
  loss = jnp.sum((lse - tz) * wts) / sum_w
  # zero-size dtype carriers: residuals must be JAX types, not dtypes
  return loss, (xo, wo, targets, wts, lse, sum_w,
                jnp.zeros((0,), x.dtype), jnp.zeros((0,), w.dtype))


def _fused_xent_bwd(logit_cap, block_m, block_v, operand_dtype, interpret,
                    res, g):
  xo, wo, targets, wts, lse, sum_w, xdt_c, wdt_c = res
  coef = g * wts / sum_w
  dx, dw = _bwd_pallas(xo, wo, targets, lse, coef, logit_cap=logit_cap,
                       block_m=block_m, block_v=block_v, interpret=interpret,
                       x_dtype=xdt_c.dtype, w_dtype=wdt_c.dtype)
  # targets are integral; loss weights are data, not trained through
  return dx, dw, None, jnp.zeros(wts.shape, jnp.float32)


_fused_xent.defvjp(_fused_xent_fwd, _fused_xent_bwd)


def fused_softmax_xent(x, w, targets, weights=None, *, tied: bool = True,
                       logit_cap: float = 0.0, block_m: int = 1024,
                       block_v: int = 1024, operand_dtype="bfloat16",
                       interpret: bool | None = None):
  """Masked softmax cross-entropy against a projection, fully fused.

  Equivalent math (ref: hero/model_lib.py:1100-1104 + 1285-1304):
    logits = x @ w.T (tied, w [V, D]) or x @ w (untied, w [D, V])
    logits = cap * tanh(logits / cap)           (if logit_cap)
    loss = sum(weights * xent(logits, targets)) / max(sum(weights), 1)
  but the [M, V] logits never materialize — see module docstring.

  x: [B, T, D] or [M, D]; targets/weights: [B, T] or [M]. The matmuls run
  at `operand_dtype` (bf16 + f32 accumulation by default — the reference's
  own training precision). Untied w is transposed once to the [V, D] kernel
  layout (a [D, V] relayout per step; the flagship config ties embeddings).
  """
  if x.ndim == 3:
    x = x.reshape(-1, x.shape[-1])
  targets = targets.reshape(-1)
  if weights is None:
    weights = jnp.ones(targets.shape, jnp.float32)
  weights = weights.reshape(-1).astype(jnp.float32)
  if not tied:
    w = w.T  # [D, V] -> kernel layout [V, D]; grad transposes back via AD
  if interpret is None:
    interpret = jax.default_backend() != "tpu"
  return _fused_xent(x, w, targets, weights, float(logit_cap or 0.0),
                     int(block_m), int(block_v),
                     jnp.dtype(operand_dtype), bool(interpret))
