"""Flash attention for TPU: Pallas forward + Pallas backward kernels.

The reference plumbs a `use_flash_attention` flag that is never implemented
(hero/config_lib.py:171 -> model_lib.py:574,1007, unread in Attention.apply).
Here it is real: an online-softmax streaming kernel that never materializes
the [T, T] score matrix, with causal + sliding-window + packed-segment
masking and the reference's attention logit soft-cap (50.0) fused in.

Design (per pallas_guide.md):
  * forward: grid (batch*heads, q_blocks, k_blocks), k innermost; VMEM
    scratch carries the running (max, sum, accumulator) across k blocks;
    output written at the last k block. Default 512x512 blocks: measured
    2.3x faster than XLA's fused dense attention at T=2048 on-device
    (128x128 was 2x slower — block size dominates; see PERF_NOTES.md).
  * backward: two kernels sharing the forward's masking — dq with grid
    (BN, q_blocks, k_blocks) and dk/dv with grid (BN, k_blocks, q_blocks) —
    each streaming the opposite operand through VMEM scratch accumulators.
    delta = rowsum(g * o) and the saved logsumexp enter lane-broadcast
    ([BN, T, 128]) so per-q-row values land on sublanes without an in-kernel
    transpose (layout trick from jax.experimental.pallas.ops.tpu).
  * blocks fully dead under the causal/window masks are skipped with
    pl.when (upper triangle alone halves the MXU work).
  * segment ids (packed sequences: no cross-document attention) ride two
    layouts: q-side [B, T, 128] (lane-broadcast), kv-side [B, 8, T]
    (sublane-broadcast); the grid's batch*head axis indexes them by b // n
    so they are stored once per batch row, not per head.

flash_attention(q, k, v): q, k, v are [B, T, N, H] (kv may have fewer heads —
GQA is handled by repeating kv). segment_ids: optional [B, T] int32.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LANES = 128
SUBLANES = 8


def _block_mask(qi, kj, block_q, block_k, causal, window, seq_len,
                qseg_ref=None, kseg_ref=None):
  """Boolean [block_q, block_k] mask for q block qi, k block kj."""
  q_pos = qi * block_q + jax.lax.broadcasted_iota(
      jnp.int32, (block_q, block_k), 0)
  k_pos = kj * block_k + jax.lax.broadcasted_iota(
      jnp.int32, (block_q, block_k), 1)
  mask = k_pos < seq_len  # partial trailing block: pad lanes contribute 0
  if causal:
    mask &= q_pos >= k_pos
  if window is not None:
    mask &= (q_pos - k_pos) < window
  if qseg_ref is not None:
    # q ids are lane-broadcast [block_q, 128]; tile across the k block
    # (the slice is a no-op when block_k is a multiple of 128).
    rep = pl.cdiv(block_k, LANES)
    q_seg = jnp.tile(qseg_ref[0], (1, rep))[:, :block_k]  # [bq, bk]
    k_seg = kseg_ref[0, :1, :]                            # [1, bk]
    mask &= q_seg == k_seg
  return mask


def _block_live(qi, kj, block_q, block_k, causal, window):
  """Scalar predicate: does block (qi, kj) contain any unmasked entry?

  Causal/window pruning only (segments can't be pruned block-wise)."""
  live = True
  if causal:  # lowest q_pos in block must reach the first k_pos
    live = jnp.logical_and(live, qi * block_q + block_q - 1 >= kj * block_k)
  if window is not None:  # highest k_pos must be within window of some q
    live = jnp.logical_and(
        live, qi * block_q - (kj * block_k + block_k - 1) < window)
  return live


def _fwd_kernel(q_ref, k_ref, v_ref, qseg_ref, kseg_ref, o_ref, lse_ref,
                m_scr, l_scr, acc_scr, *, block_q, block_k, num_k_blocks,
                causal, window, logit_cap, sm_scale, seq_len):
  kj = pl.program_id(2)
  qi = pl.program_id(1)

  @pl.when(kj == 0)
  def _init():
    m_scr[:] = jnp.full_like(m_scr, NEG_INF)
    l_scr[:] = jnp.zeros_like(l_scr)
    acc_scr[:] = jnp.zeros_like(acc_scr)

  @pl.when(_block_live(qi, kj, block_q, block_k, causal, window))
  def _compute():
    # q/k stay at their input dtype for the s-dot: a bf16 x bf16 MXU pass
    # with f32 accumulation computes the exact same products as upcasting
    # bf16 inputs to f32 first, at a fraction of the MXU cost. sm_scale is
    # applied to the f32 result instead of pre-scaling q.
    q = q_ref[0]                                      # [bq, H]
    k = k_ref[0]                                      # [bk, H]
    v = v_ref[0].astype(jnp.float32)                  # [bk, H]
    # zero pad rows of the trailing partial block: they are uninitialized,
    # and even p == 0 can't mask NaNs through the p @ v dot (0 * NaN = NaN)
    k_rows = kj * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (block_k, 1), 0)
    row_valid = k_rows < seq_len
    k = jnp.where(row_valid, k, 0.0)
    v = jnp.where(row_valid, v, 0.0)
    s = sm_scale * jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)           # [bq, bk]
    if logit_cap:
      s = logit_cap * jnp.tanh(s / logit_cap)
    mask = _block_mask(qi, kj, block_q, block_k, causal, window, seq_len,
                       qseg_ref, kseg_ref)
    s = jnp.where(mask, s, NEG_INF)

    m_prev = m_scr[:]                                 # [bq, 1]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    # Fully-masked rows keep m == NEG_INF; their p rows are exp(0) garbage
    # but alpha == 0 on the first live block flushes them (classic online
    # softmax) and _finalize guards l == 0.
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)                            # [bq, bk]
    l_new = alpha * l_scr[:] + jnp.sum(p, axis=1, keepdims=True)
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    m_scr[:] = m_new
    l_scr[:] = l_new

  @pl.when(kj == num_k_blocks - 1)
  def _finalize():
    l = jnp.maximum(l_scr[:], 1e-30)
    o_ref[0] = (acc_scr[:] / l).astype(o_ref.dtype)
    # lse block is (1, 8, block_q) to satisfy TPU (8, 128) tiling; broadcast
    # the row values across the 8 sublanes (caller reads sublane 0)
    lse = (m_scr[:] + jnp.log(l))[:, 0]
    lse_ref[0] = jnp.broadcast_to(lse[None, :], (8, lse.shape[0]))


def _seg_operands(segment_ids, n_heads):
  """[B, T] int32 -> (qseg [B, T, 128], kseg [B, 8, T]) + head index maps."""
  qseg = jnp.broadcast_to(segment_ids[:, :, None],
                          (*segment_ids.shape, LANES))
  kseg = jnp.broadcast_to(segment_ids[:, None, :],
                          (segment_ids.shape[0], SUBLANES,
                           segment_ids.shape[1]))
  return qseg.astype(jnp.int32), kseg.astype(jnp.int32)


def _flash_fwd_pallas(q, k, v, segs, *, n_heads, causal, window, logit_cap,
                      sm_scale, block_q, block_k, interpret):
  """q, k, v: [BN, T, H] -> (out [BN, T, H], lse [BN, 8, T])."""
  bn, t, h = q.shape
  block_q = min(block_q, t)
  block_k = min(block_k, t)
  num_q = pl.cdiv(t, block_q)
  num_k = pl.cdiv(t, block_k)
  n = n_heads

  kernel = functools.partial(
      _fwd_kernel, block_q=block_q, block_k=block_k, num_k_blocks=num_k,
      causal=causal, window=window, logit_cap=logit_cap, sm_scale=sm_scale,
      seq_len=t)

  in_specs = [
      pl.BlockSpec((1, block_q, h), lambda b, i, j: (b, i, 0)),
      pl.BlockSpec((1, block_k, h), lambda b, i, j: (b, j, 0)),
      pl.BlockSpec((1, block_k, h), lambda b, i, j: (b, j, 0)),
  ]
  operands = [q, k, v]
  if segs is not None:
    qseg, kseg = segs
    in_specs += [
        pl.BlockSpec((1, block_q, LANES), lambda b, i, j: (b // n, i, 0)),
        pl.BlockSpec((1, SUBLANES, block_k), lambda b, i, j: (b // n, 0, j)),
    ]
    operands += [qseg, kseg]
  else:
    # bind None segment refs positionally via a wrapper
    inner = kernel
    kernel = lambda q_ref, k_ref, v_ref, *rest: inner(
        q_ref, k_ref, v_ref, None, None, *rest)

  out, lse = pl.pallas_call(
      kernel,
      grid=(bn, num_q, num_k),
      in_specs=in_specs,
      out_specs=[
          pl.BlockSpec((1, block_q, h), lambda b, i, j: (b, i, 0)),
          pl.BlockSpec((1, 8, block_q), lambda b, i, j: (b, 0, i)),
      ],
      out_shape=[
          jax.ShapeDtypeStruct((bn, t, h), q.dtype),
          jax.ShapeDtypeStruct((bn, 8, t), jnp.float32),
      ],
      scratch_shapes=[
          pltpu.VMEM((block_q, 1), jnp.float32),
          pltpu.VMEM((block_q, 1), jnp.float32),
          pltpu.VMEM((block_q, h), jnp.float32),
      ],
      interpret=interpret,
  )(*operands)
  return out, lse


def _bwd_compute(q, k, v, g, lse, delta, mask, *, logit_cap, sm_scale):
  """Shared backward math for one (q block, k block) tile.

  q, g: [bq, H]; k, v: [bk, H]; lse, delta: [bq, 1]; mask: [bq, bk].
  Operands arrive at their INPUT dtype: the s and dp dots run as
  bf16 x bf16 MXU passes with f32 accumulation — the exact same products
  as upcasting first (see _fwd_kernel), with sm_scale folded into the f32
  result. Returns (ds_raw [bq, bk] — grad wrt pre-cap scaled logits,
  p [bq, bk]), both f32."""
  s = sm_scale * jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
  if logit_cap:
    capped = jnp.tanh(s / logit_cap)
    dcap = 1.0 - jnp.square(capped)     # d(cap*tanh(s/cap))/ds
    s_eff = logit_cap * capped
  else:
    dcap = 1.0
    s_eff = s
  s_eff = jnp.where(mask, s_eff, NEG_INF)
  # Explicit where, not exp(NEG_INF - lse): on pad q rows lse/delta read
  # uninitialized memory (NaN in interpret mode), and NEG_INF - NaN = NaN
  # would poison the dv contraction (NaN * 0 = NaN) for any seq_len not a
  # multiple of block_q.
  p = jnp.where(mask, jnp.exp(s_eff - lse), 0.0)  # [bq, bk]
  dp = jax.lax.dot_general(g, v, (((1,), (1,)), ((), ())),
                           preferred_element_type=jnp.float32)
  ds = p * (dp - delta) * dcap
  ds = jnp.where(mask, ds, 0.0)
  return ds, p


def _bwd_dq_kernel(q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref,
                   qseg_ref, kseg_ref, dq_ref, dq_scr, *,
                   block_q, block_k, num_k_blocks, causal, window,
                   logit_cap, sm_scale, seq_len):
  kj = pl.program_id(2)
  qi = pl.program_id(1)

  @pl.when(kj == 0)
  def _init():
    dq_scr[:] = jnp.zeros_like(dq_scr)

  @pl.when(_block_live(qi, kj, block_q, block_k, causal, window))
  def _compute():
    q = q_ref[0]
    g = g_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    k_rows = kj * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (block_k, 1), 0)
    valid = k_rows < seq_len
    k = jnp.where(valid, k, 0.0)
    v = jnp.where(valid, v, 0.0)
    lse = lse_ref[0, :, :1]      # [bq, 1] (lane-broadcast input)
    delta = delta_ref[0, :, :1]
    mask = _block_mask(qi, kj, block_q, block_k, causal, window, seq_len,
                       qseg_ref, kseg_ref)
    ds, _ = _bwd_compute(q, k, v, g, lse, delta, mask,
                         logit_cap=logit_cap, sm_scale=sm_scale)
    dq_scr[:] = dq_scr[:] + sm_scale * jax.lax.dot_general(
        ds, k.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

  @pl.when(kj == num_k_blocks - 1)
  def _finalize():
    dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref,
                    qseg_ref, kseg_ref, dk_ref, dv_ref, dk_scr, dv_scr, *,
                    block_q, block_k, num_q_blocks, causal, window,
                    logit_cap, sm_scale, seq_len):
  qi = pl.program_id(2)
  kj = pl.program_id(1)

  @pl.when(qi == 0)
  def _init():
    dk_scr[:] = jnp.zeros_like(dk_scr)
    dv_scr[:] = jnp.zeros_like(dv_scr)

  @pl.when(_block_live(qi, kj, block_q, block_k, causal, window))
  def _compute():
    q = q_ref[0]
    g = g_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    q_rows = qi * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, 1), 0)
    valid = q_rows < seq_len
    q = jnp.where(valid, q, 0.0)
    g = jnp.where(valid, g, 0.0)
    lse = lse_ref[0, :, :1]
    delta = delta_ref[0, :, :1]
    mask = _block_mask(qi, kj, block_q, block_k, causal, window, seq_len,
                       qseg_ref, kseg_ref)
    mask &= valid  # pad q rows: lse/delta are garbage there
    ds, p = _bwd_compute(q, k, v, g, lse, delta, mask,
                         logit_cap=logit_cap, sm_scale=sm_scale)
    dv_scr[:] = dv_scr[:] + jax.lax.dot_general(
        p, g.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dk_scr[:] = dk_scr[:] + sm_scale * jax.lax.dot_general(
        ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

  @pl.when(qi == num_q_blocks - 1)
  def _finalize():
    dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
    dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _bwd_fused_kernel(q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref,
                      qseg_ref, kseg_ref, dqp_ref, dk_ref, dv_ref,
                      dk_scr, dv_scr, *, block_q, block_k, num_q_blocks,
                      causal, window, logit_cap, sm_scale, seq_len):
  """One-pass backward: dq partials + dk/dv from a single s/p/ds recompute.

  The split dq/dkv kernels each rebuild s = q k^T and dp = g v^T per tile —
  7 matmul-units per tile total where 5 suffice. This kernel shares the
  rebuild: grid (BN, k_blocks, q_blocks) with dk/dv accumulated in VMEM
  scratch across q blocks (as in _bwd_dkv_kernel) while each step writes
  its dq tile as an f32 PARTIAL into a [num_k, BN, T, H] buffer (every
  (kj, b, qi) block is visited exactly once — no cross-step output
  accumulation needed); the caller reduces over the leading num_k axis.
  f32 partials keep dq bit-comparable to the split kernels' f32 scratch
  accumulation."""
  qi = pl.program_id(2)
  kj = pl.program_id(1)

  @pl.when(qi == 0)
  def _init():
    dk_scr[:] = jnp.zeros_like(dk_scr)
    dv_scr[:] = jnp.zeros_like(dv_scr)

  live = _block_live(qi, kj, block_q, block_k, causal, window)

  @pl.when(live)
  def _compute():
    q = q_ref[0]
    g = g_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    q_rows = qi * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, 1), 0)
    q_valid = q_rows < seq_len
    q = jnp.where(q_valid, q, 0.0)
    g = jnp.where(q_valid, g, 0.0)
    k_rows = kj * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (block_k, 1), 0)
    k_valid = k_rows < seq_len
    k = jnp.where(k_valid, k, 0.0)
    v = jnp.where(k_valid, v, 0.0)
    lse = lse_ref[0, :, :1]
    delta = delta_ref[0, :, :1]
    mask = _block_mask(qi, kj, block_q, block_k, causal, window, seq_len,
                       qseg_ref, kseg_ref)
    mask &= q_valid  # pad q rows: lse/delta are garbage there
    ds, p = _bwd_compute(q, k, v, g, lse, delta, mask,
                         logit_cap=logit_cap, sm_scale=sm_scale)
    dv_scr[:] = dv_scr[:] + jax.lax.dot_general(
        p, g.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dk_scr[:] = dk_scr[:] + sm_scale * jax.lax.dot_general(
        ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dqp_ref[0, 0] = sm_scale * jax.lax.dot_general(
        ds, k.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

  @pl.when(jnp.logical_not(live))
  def _dead():  # dq partial blocks are write-once: zero the dead ones
    dqp_ref[0, 0] = jnp.zeros_like(dqp_ref[0, 0])

  @pl.when(qi == num_q_blocks - 1)
  def _finalize():
    dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
    dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _flash_bwd_fused_pallas(q, k, v, g, lse, delta, segs, *, n_heads, causal,
                            window, logit_cap, sm_scale, block_q, block_k,
                            interpret):
  """Fused-backward dispatch: (dq, dk, dv) from ONE kernel (see above)."""
  bn, t, h = q.shape
  block_q = min(block_q, t)
  block_k = min(block_k, t)
  num_q = pl.cdiv(t, block_q)
  num_k = pl.cdiv(t, block_k)
  n = n_heads

  lse_b = jnp.broadcast_to(lse[:, :, None], (bn, t, LANES))
  delta_b = jnp.broadcast_to(delta[:, :, None], (bn, t, LANES))

  qi_map = lambda b, j, i: (b, i, 0)
  kj_map = lambda b, j, i: (b, j, 0)
  in_specs = [
      pl.BlockSpec((1, block_q, h), qi_map),
      pl.BlockSpec((1, block_k, h), kj_map),
      pl.BlockSpec((1, block_k, h), kj_map),
      pl.BlockSpec((1, block_q, h), qi_map),
      pl.BlockSpec((1, block_q, LANES), qi_map),
      pl.BlockSpec((1, block_q, LANES), qi_map),
  ]
  operands = [q, k, v, g, lse_b, delta_b]
  kernel = functools.partial(
      _bwd_fused_kernel, block_q=block_q, block_k=block_k,
      num_q_blocks=num_q, causal=causal, window=window,
      logit_cap=logit_cap, sm_scale=sm_scale, seq_len=t)
  if segs is not None:
    in_specs += [
        pl.BlockSpec((1, block_q, LANES), lambda b, j, i: (b // n, i, 0)),
        pl.BlockSpec((1, SUBLANES, block_k), lambda b, j, i: (b // n, 0, j)),
    ]
    operands += list(segs)
  else:
    inner = kernel
    kernel = lambda q_r, k_r, v_r, g_r, l_r, d_r, *rest: inner(
        q_r, k_r, v_r, g_r, l_r, d_r, None, None, *rest)

  dq_part, dk, dv = pl.pallas_call(
      kernel,
      grid=(bn, num_k, num_q),
      in_specs=in_specs,
      out_specs=[
          pl.BlockSpec((1, 1, block_q, h), lambda b, j, i: (j, b, i, 0)),
          pl.BlockSpec((1, block_k, h), kj_map),
          pl.BlockSpec((1, block_k, h), kj_map),
      ],
      out_shape=[
          jax.ShapeDtypeStruct((num_k, bn, t, h), jnp.float32),
          jax.ShapeDtypeStruct((bn, t, h), k.dtype),
          jax.ShapeDtypeStruct((bn, t, h), v.dtype),
      ],
      scratch_shapes=[pltpu.VMEM((block_k, h), jnp.float32),
                      pltpu.VMEM((block_k, h), jnp.float32)],
      interpret=interpret,
  )(*operands)
  dq = jnp.sum(dq_part, axis=0).astype(q.dtype)
  return dq, dk, dv


def _flash_bwd_pallas(q, k, v, g, lse, delta, segs, *, n_heads, causal,
                      window, logit_cap, sm_scale, block_q, block_k,
                      interpret):
  """All operands [BN, T, H] except lse/delta [BN, T] -> (dq, dk, dv)."""
  bn, t, h = q.shape
  block_q = min(block_q, t)
  block_k = min(block_k, t)
  num_q = pl.cdiv(t, block_q)
  num_k = pl.cdiv(t, block_k)
  n = n_heads

  # Per-q-row values must land on sublanes inside [bq, bk] tiles: store them
  # lane-broadcast (layout trick from jax.experimental.pallas.ops.tpu).
  lse_b = jnp.broadcast_to(lse[:, :, None], (bn, t, LANES))
  delta_b = jnp.broadcast_to(delta[:, :, None], (bn, t, LANES))

  common = dict(block_q=block_q, block_k=block_k, causal=causal,
                window=window, logit_cap=logit_cap, sm_scale=sm_scale,
                seq_len=t)

  def specs(order):
    """order='dq' -> grid (bn, q, k); 'dkv' -> grid (bn, k, q)."""
    if order == "dq":
      qi_map = lambda b, i, j: (b, i, 0)
      kj_map = lambda b, i, j: (b, j, 0)
      qseg_map = lambda b, i, j: (b // n, i, 0)
      kseg_map = lambda b, i, j: (b // n, 0, j)
    else:
      qi_map = lambda b, j, i: (b, i, 0)
      kj_map = lambda b, j, i: (b, j, 0)
      qseg_map = lambda b, j, i: (b // n, i, 0)
      kseg_map = lambda b, j, i: (b // n, 0, j)
    sp = [
        pl.BlockSpec((1, block_q, h), qi_map),
        pl.BlockSpec((1, block_k, h), kj_map),
        pl.BlockSpec((1, block_k, h), kj_map),
        pl.BlockSpec((1, block_q, h), qi_map),
        pl.BlockSpec((1, block_q, LANES), qi_map),
        pl.BlockSpec((1, block_q, LANES), qi_map),
    ]
    if segs is not None:
      sp += [pl.BlockSpec((1, block_q, LANES), qseg_map),
             pl.BlockSpec((1, SUBLANES, block_k), kseg_map)]
    return sp, qi_map, kj_map

  operands = [q, k, v, g, lse_b, delta_b]
  if segs is not None:
    operands += list(segs)
    wrap = lambda fn: fn
  else:
    wrap = lambda fn: (lambda q_r, k_r, v_r, g_r, l_r, d_r, *rest: fn(
        q_r, k_r, v_r, g_r, l_r, d_r, None, None, *rest))

  dq_specs, qi_map, _ = specs("dq")
  dq = pl.pallas_call(
      wrap(functools.partial(_bwd_dq_kernel, num_k_blocks=num_k, **common)),
      grid=(bn, num_q, num_k),
      in_specs=dq_specs,
      out_specs=pl.BlockSpec((1, block_q, h), qi_map),
      out_shape=jax.ShapeDtypeStruct((bn, t, h), q.dtype),
      scratch_shapes=[pltpu.VMEM((block_q, h), jnp.float32)],
      interpret=interpret,
  )(*operands)

  dkv_specs, _, kj_map = specs("dkv")
  dk, dv = pl.pallas_call(
      wrap(functools.partial(_bwd_dkv_kernel, num_q_blocks=num_q, **common)),
      grid=(bn, num_k, num_q),
      in_specs=dkv_specs,
      out_specs=[pl.BlockSpec((1, block_k, h), kj_map),
                 pl.BlockSpec((1, block_k, h), kj_map)],
      out_shape=[jax.ShapeDtypeStruct((bn, t, h), k.dtype),
                 jax.ShapeDtypeStruct((bn, t, h), v.dtype)],
      scratch_shapes=[pltpu.VMEM((block_k, h), jnp.float32),
                      pltpu.VMEM((block_k, h), jnp.float32)],
      interpret=interpret,
  )(*operands)
  return dq, dk, dv


def _full_mask(t, causal, window, segment_ids=None):
  q_pos = jnp.arange(t)[:, None]
  k_pos = jnp.arange(t)[None, :]
  mask = jnp.ones((t, t), bool)
  if causal:
    mask &= q_pos >= k_pos
  if window is not None:
    mask &= (q_pos - k_pos) < window
  if segment_ids is not None:  # [B, T] -> [B, T, T]
    mask = mask[None] & (segment_ids[:, :, None] == segment_ids[:, None, :])
  return mask


# Residual-style custom_vjp: the forward pallas kernel runs OUTSIDE the vjp
# on stop_gradient'ed inputs, and its outputs (out, lse) enter `_flash_res`
# as ordinary ARGUMENTS that the fwd rule captures as residuals. Why: under
# jax.checkpoint a custom_vjp's fwd always re-runs in the backward pass to
# regenerate residuals — no checkpoint policy can elide it (measured 16.4 ms
# per 234M-b8 step as the "remat re-forward", PERF_NOTES round 5). With this
# structure the residuals are checkpoint_name'd values in the PRIMAL jaxpr,
# so a `save_only_these_names("flash_out", "flash_lse")` policy saves them
# and the bwd recompute drops the fwd kernel entirely (the identity fwd rule
# costs nothing). Policies that don't save the names recompute the fwd
# kernel exactly as before — behavior-neutral otherwise.
@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(6, 7, 8, 9, 10, 11, 12, 13, 14))
def _flash_res(q, k, v, segs, out, lse, n_heads, causal, window, logit_cap,
               sm_scale, block_q_bwd, block_k_bwd, interpret, bwd_fused):
  return out


def _flash_res_fwd(q, k, v, segs, out, lse, n_heads, causal, window,
                   logit_cap, sm_scale, block_q_bwd, block_k_bwd, interpret,
                   bwd_fused):
  return out, (q, k, v, segs, out, lse)


def _flash_res_bwd(n_heads, causal, window, logit_cap, sm_scale, block_q_bwd,
                   block_k_bwd, interpret, bwd_fused, res, g):
  q, k, v, segs, out, lse = res
  delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
  bwd = _flash_bwd_fused_pallas if bwd_fused else _flash_bwd_pallas
  dq, dk, dv = bwd(
      q, k, v, g, lse, delta, segs, n_heads=n_heads, causal=causal,
      window=window, logit_cap=logit_cap, sm_scale=sm_scale,
      block_q=block_q_bwd, block_k=block_k_bwd, interpret=interpret)
  # out/lse enter as stop_gradient'ed values — zero cotangents, dropped.
  return dq, dk, dv, None, jnp.zeros_like(out), jnp.zeros_like(lse)


_flash_res.defvjp(_flash_res_fwd, _flash_res_bwd)


def _flash(q, k, v, segs, n_heads, causal, window, logit_cap, sm_scale,
           block_q, block_k, block_q_bwd, block_k_bwd, interpret,
           bwd_fused=False):
  sg = jax.lax.stop_gradient
  segs_sg = None if segs is None else tuple(sg(s) for s in segs)
  out, lse = _flash_fwd_pallas(sg(q), sg(k), sg(v), segs_sg, n_heads=n_heads,
                               causal=causal, window=window,
                               logit_cap=logit_cap, sm_scale=sm_scale,
                               block_q=block_q, block_k=block_k,
                               interpret=interpret)
  from jax.ad_checkpoint import checkpoint_name
  out = checkpoint_name(out, "flash_out")
  lse = checkpoint_name(lse[:, 0, :], "flash_lse")
  return _flash_res(q, k, v, segs, out, lse, n_heads, causal, window,
                    logit_cap, sm_scale, block_q_bwd or block_q,
                    block_k_bwd or block_k, interpret, bwd_fused)


def flash_attention(q, k, v, *, causal: bool = True, window: int | None = None,
                    logit_cap: float = 0.0, sm_scale: float | None = None,
                    segment_ids=None, block_q: int = 512, block_k: int = 512,
                    block_q_bwd: int | None = None,
                    block_k_bwd: int | None = None,
                    bwd_fused: bool = False,
                    interpret: bool | None = None):
  """Multi-head flash attention.

  q: [B, T, N, H]; k, v: [B, T, Nkv, H] (Nkv divides N -> GQA repeat).
  Returns [B, T, N, H]. `window`: sliding-window size (None = full causal).
  `logit_cap`: tanh soft-cap on attention logits (reference uses 50.0).
  `segment_ids`: optional [B, T] int32 — attention only within equal ids
  (packed sequences; ref: hero/model_lib.py:405-461 segment masking).
  `block_q_bwd`/`block_k_bwd`: dq/dkv kernel blocks (None = fwd blocks) —
  the bwd kernels' optimal tiling differs from the forward's.
  `bwd_fused`: one backward kernel producing dq partials + dk/dv from a
  single s/p recompute per tile (5 matmul-units/tile vs the split
  kernels' 7) — see _bwd_fused_kernel.
  """
  b, t, n, h = q.shape
  nkv = k.shape[2]
  if nkv != n:
    if n % nkv != 0:
      raise ValueError(f"GQA requires n_heads ({n}) divisible by "
                       f"n_kv_heads ({nkv})")
    rep = n // nkv
    k = jnp.repeat(k, rep, axis=2)
    v = jnp.repeat(v, rep, axis=2)
  if sm_scale is None:
    sm_scale = 1.0 / math.sqrt(h)
  if interpret is None:
    interpret = jax.default_backend() != "tpu"
  qf = q.transpose(0, 2, 1, 3).reshape(b * n, t, h)
  kf = k.transpose(0, 2, 1, 3).reshape(b * n, t, h)
  vf = v.transpose(0, 2, 1, 3).reshape(b * n, t, h)
  segs = None
  if segment_ids is not None:
    if segment_ids.shape != (b, t):
      raise ValueError(f"segment_ids must be [B={b}, T={t}], "
                       f"got {segment_ids.shape}")
    segs = _seg_operands(segment_ids, n)
  out = _flash(qf, kf, vf, segs, n, causal, window, logit_cap, sm_scale,
               block_q, block_k, block_q_bwd, block_k_bwd, interpret,
               bwd_fused)
  return out.reshape(b, n, t, h).transpose(0, 2, 1, 3)


def dense_attention(q, k, v, *, causal=True, window=None, logit_cap=0.0,
                    sm_scale=None, segment_ids=None):
  """Reference O(T^2) attention for golden tests."""
  b, t, n, h = q.shape
  nkv = k.shape[2]
  if nkv != n:
    rep = n // nkv
    k = jnp.repeat(k, rep, axis=2)
    v = jnp.repeat(v, rep, axis=2)
  if sm_scale is None:
    sm_scale = 1.0 / math.sqrt(h)
  s = jnp.einsum("bqnh,bknh->bnqk", q.astype(jnp.float32),
                 k.astype(jnp.float32)) * sm_scale
  if logit_cap:
    s = logit_cap * jnp.tanh(s / logit_cap)
  mask = _full_mask(t, causal, window, segment_ids)
  mask = mask[:, None] if mask.ndim == 3 else mask[None, None]
  s = jnp.where(mask, s, NEG_INF)
  p = jax.nn.softmax(s, axis=-1)
  return jnp.einsum("bnqk,bknh->bqnh", p,
                    v.astype(jnp.float32)).astype(q.dtype)
