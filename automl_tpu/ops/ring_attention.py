"""Ring attention: causal attention with the SEQUENCE dim sharded over a
mesh axis, K/V blocks rotated around the ICI ring with jax.lax.ppermute.

This is sequence/context parallelism — a capability the reference does NOT
have (hero never shards the sequence axis: hero/config_lib.py:86-98 keeps
seq `None` in every PartitionSpec and reduces long-seq cost algorithmically
instead, SURVEY §2.7). It extends the framework beyond reference parity:
attention memory per device drops by the ring size, so sequence length
scales with the number of chips.

Algorithm (blockwise online softmax, the flash-attention recurrence across
devices): each device holds a contiguous sequence chunk of Q, K, V. For
`ring_size` steps, every device attends its Q chunk against the K/V block
it currently holds (running max / sum-exp / weighted-accumulator merge),
then passes the block to the next device on the ring. Causality is enforced
per (q-chunk, kv-chunk) pair from global chunk indices: strictly-past
blocks attend fully, the diagonal block uses the triangular mask, future
blocks are skipped (zero contribution).

Use inside shard_map over a named mesh axis:

    out = shard_map(
        functools.partial(ring_attention, axis_name="model"),
        mesh=mesh,
        in_specs=(P(("replica", "data"), "model", None, None),) * 3,
        out_specs=P(("replica", "data"), "model", None, None))(q, k, v)

Collectives ride the ring as neighbor ppermutes (ICI-friendly: constant
per-step payload, no all-gather of the full sequence).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _block_attend(q, k, v, mask, *, sm_scale: float, logit_cap: float,
                  m_prev, l_prev, acc_prev):
  """One (q-chunk, kv-block) step of the online-softmax recurrence.

  q [B,Tq,N,H], k/v [B,Tk,N,H]; mask [Tq,Tk] (shared across batch),
  [B,Tq,Tk] (per-example, e.g. packed segments), or None (fully visible).
  Carries m (running max) [B,Tq,N], l (running sum-exp) [B,Tq,N],
  acc (weighted V accumulator) [B,Tq,N,H]; all f32.
  """
  s = jnp.einsum("bqnh,bknh->bqnk", q, k).astype(jnp.float32) * sm_scale
  if logit_cap:
    s = logit_cap * jnp.tanh(s / logit_cap)
  if mask is not None:
    mexp = (mask[None, :, None, :] if mask.ndim == 2
            else mask[:, :, None, :])
    s = jnp.where(mexp, s, NEG_INF)
  m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1))
  # guard fully-masked rows: exp(NEG_INF - NEG_INF) would be 1
  safe_m = jnp.where(m_new <= NEG_INF / 2, 0.0, m_new)
  p = jnp.exp(s - safe_m[..., None])
  if mask is not None:
    p = jnp.where(mexp, p, 0.0)
  correction = jnp.exp(jnp.where(m_prev <= NEG_INF / 2, NEG_INF,
                                 m_prev - safe_m))
  l_new = l_prev * correction + jnp.sum(p, axis=-1)
  acc_new = (acc_prev * correction[..., None]
             + jnp.einsum("bqnk,bknh->bqnh", p, v.astype(jnp.float32)))
  return m_new, l_new, acc_new


def ring_attention(q, k, v, segment_ids=None, *, axis_name: str,
                   causal: bool = True, window: int | None = None,
                   sm_scale: float | None = None, logit_cap: float = 0.0):
  """Causal attention over a sequence sharded along `axis_name`.

  Call inside shard_map; q, k, v are this device's [B, T_local, N, H]
  chunks (device i holds global positions [i*T_local, (i+1)*T_local)).
  segment_ids: optional [B, T_local] packed-document ids — rides the ring
  with K/V so cross-document attention is masked exactly as in the dense
  path. window: optional sliding-window size (key visible iff
  q_pos - window < k_pos <= q_pos). Returns this device's output chunk.
  GQA: repeat K/V heads to match Q before calling.
  """
  b, t, n, h = q.shape
  if sm_scale is None:
    sm_scale = h ** -0.5
  if window and not causal:
    raise ValueError("ring_attention: window implies causal "
                     "(q_pos - window < k_pos <= q_pos semantics)")
  ring = jax.lax.axis_size(axis_name)
  my = jax.lax.axis_index(axis_name)
  qf = q.astype(jnp.float32)

  # send my block to the next device each step; after s steps I hold
  # block (my - s) mod ring
  perm = [(j, (j + 1) % ring) for j in range(ring)]
  q_seg = segment_ids
  # the placeholder must carry k's device-varying type (vma) through the
  # ppermute in the loop body, hence the empty slice of k, not jnp.zeros
  k_seg0 = (segment_ids if segment_ids is not None
            else k[:, :0, 0, 0].astype(jnp.int32))

  def body(step, carry):
    k_blk, v_blk, k_seg, m, l, acc = carry
    src = (my - step) % ring
    mask = None
    if causal:
      # global-position mask covers all block relations in one pass: past
      # blocks all-visible, the diagonal triangular, and a fully-masked
      # future block is a no-op through the recurrence (p == 0)
      qpos = my * t + jnp.arange(t)
      kpos = src * t + jnp.arange(t)
      mask = kpos[None, :] <= qpos[:, None]
      if window:
        mask &= kpos[None, :] > qpos[:, None] - window
    if q_seg is not None:
      # fold the per-example packed-segment constraint into a [B,Tq,Tk]
      # mask; _block_attend handles both mask ranks with one recurrence
      seg_ok = q_seg[:, :, None] == k_seg[:, None, :]
      mask = seg_ok if mask is None else (mask[None] & seg_ok)
    m, l, acc = _block_attend(
        qf, k_blk.astype(jnp.float32), v_blk.astype(jnp.float32), mask,
        sm_scale=sm_scale, logit_cap=logit_cap,
        m_prev=m, l_prev=l, acc_prev=acc)
    k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
    v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
    k_seg = jax.lax.ppermute(k_seg, axis_name, perm)
    return k_blk, v_blk, k_seg, m, l, acc

  # build the initial carry FROM q so it inherits q's device-varying type
  # (shard_map's vma system requires carry-in == carry-out types)
  zeros = jnp.sum(qf * 0.0, axis=-1)  # [B, T, N]
  m0 = zeros + NEG_INF
  l0 = zeros
  acc0 = qf * 0.0
  _, _, _, m, l, acc = jax.lax.fori_loop(
      0, ring, body, (k, v, k_seg0, m0, l0, acc0))
  out = acc / jnp.maximum(l, 1e-30)[..., None]
  return out.astype(q.dtype)


def ring_attention_sharded(q, k, v, mesh, segment_ids=None, *,
                           seq_axis: str = "model",
                           batch_axes=("replica", "data"),
                           causal: bool = True, window: int | None = None,
                           sm_scale: float | None = None,
                           logit_cap: float = 0.0):
  """Convenience wrapper: shard_map ring_attention over `mesh`.

  q, k, v: [B, T, N, H] global arrays (T divisible by the ring size);
  segment_ids: optional [B, T].
  """
  from jax.sharding import PartitionSpec as P
  shard_map = getattr(jax, "shard_map", None)
  if shard_map is None:  # older jax
    from jax.experimental.shard_map import shard_map
  spec = P(batch_axes, seq_axis, None, None)
  seg_spec = P(batch_axes, seq_axis)
  fn = functools.partial(ring_attention, axis_name=seq_axis, causal=causal,
                         window=window, sm_scale=sm_scale,
                         logit_cap=logit_cap)
  if segment_ids is None:
    return shard_map(fn, mesh=mesh, in_specs=(spec, spec, spec),
                     out_specs=spec)(q, k, v)
  return shard_map(fn, mesh=mesh,
                   in_specs=(spec, spec, spec, seg_spec),
                   out_specs=spec)(q, k, v, segment_ids)
