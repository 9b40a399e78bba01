"""Pallas decode-attention kernel: KV-cached attention for serving.

Why a kernel (PERF_NOTES round 3, decode layout forensics): every XLA
formulation of the decode QK product either lowers to a VPU
multiply-reduce fusion with heads on lanes (8/128 lane occupancy, 23x off
the HBM roofline) or forces a full relayout copy of the loop-carried KV
cache every step (~91 us/layer). A pallas_call pins its operands to
default layouts, so the carried cache stays put and the K/V reads stream
at full HBM bandwidth.

Design:
  * operates directly on the rank-3 cache layout the model stores
    (models/lm.py init_cache): k [B*n_kv, hd, S] (sequence on lanes),
    v [B*n_kv, S, hd]; rows are batch-major (r = b*n_kv + h) on a single
    chip, or head-major (r = h*B + b) for tensor-parallel serving where
    each device holds a contiguous head slice (decode_attention_tp
    shard_maps the kernel — GSPMD would all-gather around the opaque
    custom call otherwise);
  * grid (B*n_heads, T_blocks, S_blocks), S innermost, classic
    online-softmax accumulators in VMEM scratch (same scheme as
    ops/attention.py _fwd_kernel); T is tiled so prefill-with-cache
    (T = prompt length) fits scoped VMEM, while decode (T <= 8) stays a
    single block;
  * GQA is resolved in the BlockSpec index_map (q row r reads kv row
    (r // n)*n_kv + (r % n)//rep) — no jnp.repeat materialization of the
    cache;
  * masking is fully general: the caller passes the [B, T, S] boolean
    mask it already computes (causal + window + segments + prefix-LM),
    which at decode T is tiny;
  * forward-only: no gradients flow through serving, so there is no
    custom_vjp boundary to block XLA fusions around the call
    (the round-2 lesson from the depthwise kernel).

The reference's serving path is a plain einsum on [B, S, n, h]
(hero/model_lib.py:700-760 attention); this kernel is the TPU-native
replacement.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *rest, block_s,
            num_s_blocks, s_len, logit_cap, return_stats=False):
  if return_stats:  # extra outputs: per-row softmax max + normalizer
    m_out, l_out, m_scr, l_scr, acc_scr = rest
  else:
    m_scr, l_scr, acc_scr = rest
  j = pl.program_id(2)

  @pl.when(j == 0)
  def _init():
    m_scr[:] = jnp.full_like(m_scr, NEG_INF)
    l_scr[:] = jnp.zeros_like(l_scr)
    acc_scr[:] = jnp.zeros_like(acc_scr)

  t = q_ref.shape[1]
  q = q_ref[0].astype(jnp.float32)                    # [T, hd]
  k = k_ref[0].astype(jnp.float32)                    # [hd, bs]
  v = v_ref[0].astype(jnp.float32)                    # [bs, hd]
  # zero the pad lanes of a trailing partial block: they are uninitialized
  # (NaN in interpret mode) and 0 * NaN = NaN would poison the p @ v dot
  col = j * block_s + jax.lax.broadcasted_iota(jnp.int32, (t, block_s), 1)
  k_cols = j * block_s + jax.lax.broadcasted_iota(
      jnp.int32, (1, block_s), 1)
  v_rows = j * block_s + jax.lax.broadcasted_iota(
      jnp.int32, (block_s, 1), 0)
  k = jnp.where(k_cols < s_len, k, 0.0)
  v = jnp.where(v_rows < s_len, v, 0.0)

  s = jax.lax.dot_general(q, k, (((1,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32)  # [T, bs]
  if logit_cap:
    s = logit_cap * jnp.tanh(s / logit_cap)
  live = (mask_ref[0] != 0) & (col < s_len)
  s = jnp.where(live, s, NEG_INF)

  m_prev = m_scr[:]                                   # [T, 1]
  m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
  # fully-masked-so-far rows keep m == NEG_INF; alpha == 0 on the first
  # live block flushes their garbage p rows (classic online softmax)
  alpha = jnp.exp(m_prev - m_new)
  p = jnp.exp(s - m_new)
  p = jnp.where(live, p, 0.0)
  l_scr[:] = alpha * l_scr[:] + jnp.sum(p, axis=1, keepdims=True)
  acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
      p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
  m_scr[:] = m_new

  @pl.when(j == num_s_blocks - 1)
  def _finalize():
    l = jnp.maximum(l_scr[:], 1e-30)
    o_ref[0] = (acc_scr[:] / l).astype(o_ref.dtype)
    if return_stats:
      # RAW l (no clamp): a fully-masked shard reports l == 0 so its
      # merge weight vanishes exactly. Broadcast across the h lanes —
      # a [.., 1] lane-dim output is a Mosaic layout hazard; h-wide is
      # layout-safe and tiny (S-independent).
      m_out[0] = jnp.broadcast_to(m_scr[:], m_out.shape[1:]).astype(
          m_out.dtype)
      l_out[0] = jnp.broadcast_to(l_scr[:], l_out.shape[1:]).astype(
          l_out.dtype)


def decode_attention(q, k_cache, v_cache, mask, *, n_kv_heads: int,
                     logit_cap: float = 0.0, block_s: int = 2048,
                     interpret: bool | None = None,
                     layout: str = "batch_major",
                     return_stats: bool = False):
  """KV-cached attention on the rank-3 decode cache.

  q: [B, T, N, H], already scaled (T = 1 for decode, small for
  speculative chunk verification / prefill-with-cache).
  layout="batch_major" (models/lm.py init_cache): cache row r = b*n_kv+h
  — k_cache [B*n_kv, H, S], v_cache [B*n_kv, S, H].
  layout="head_major" (tensor-parallel serving, where the head axis is
  sharded over the mesh and each device holds a contiguous head slice):
  cache row r = h*B + b.
  mask: [B, T, S] bool, True = attend.
  Returns [B, T, N, H] (f32 accumulation, cast to q.dtype).
  """
  b, t, n, h = q.shape
  rows_kv, _, s_len = k_cache.shape
  if rows_kv != b * n_kv_heads:
    raise ValueError(f"k_cache rows {rows_kv} != B*n_kv {b * n_kv_heads}")
  if n % n_kv_heads != 0:
    raise ValueError(f"GQA requires n_heads ({n}) divisible by "
                     f"n_kv_heads ({n_kv_heads})")
  rep = n // n_kv_heads
  if interpret is None:
    interpret = jax.default_backend() != "tpu"
  block_s = min(block_s, s_len)
  num_s = pl.cdiv(s_len, block_s)

  # Mosaic has no sublane broadcast: an M=1 (or any M<8) q row cannot be
  # broadcast across sublanes for the dot. Pad T to the 8-sublane minimum;
  # pad rows are fully masked (l clamps to 1e-30, acc stays 0) and sliced
  # off below — the kernel stays K/V-bandwidth-bound either way.
  #
  # T is ALSO tiled: prefill-with-cache (greedy_generate's first step,
  # serve_tp/serve_sp slot prefill, speculative chunk verification) calls
  # this kernel with T up to the full prompt length, and an untiled T
  # puts [T, block_s] f32 score/prob temps in scoped VMEM — at T=1536,
  # S=1664 that is a measured 29 MB scoped-vmem OOM on v5e (16 MB limit).
  # Decode (T<=8) keeps the single-block fast path bit-identically.
  #
  # Blocks are BALANCED across the T tiles rather than capped at 128:
  # a fixed 128-cap made t just past a multiple of 128 (t=130) pad almost
  # a full extra block of fully-masked rows (128+126 pad), nearly doubling
  # QK/PV work for those shapes; splitting t over ceil(t/128) equal
  # 8-aligned blocks (t=130 -> two 72-row blocks) pads at most 7 rows
  # per block.
  def ceil_div(a, d):
    return -(-a // d)
  num_t = ceil_div(t, 128)
  block_t = max(8, ceil_div(ceil_div(t, num_t), 8) * 8)
  t_pad = num_t * block_t
  if layout == "head_major":
    qf = q.transpose(2, 0, 1, 3).reshape(n * b, t, h)   # row r = h*B + b
  else:
    qf = q.transpose(0, 2, 1, 3).reshape(b * n, t, h)   # row r = b*n + h
  qf = jnp.pad(qf, ((0, 0), (0, t_pad - t), (0, 0)))
  mask8 = jnp.pad(mask.astype(jnp.int8), ((0, 0), (0, t_pad - t), (0, 0)))

  if layout == "head_major":
    def kv_row(r):
      return (r // (b * rep)) * b + r % b
    def mask_row(r):
      return r % b
  else:
    def kv_row(r):
      return (r // n) * n_kv_heads + (r % n) // rep
    def mask_row(r):
      return r // n

  row_spec = pl.BlockSpec((1, block_t, h), lambda r, i, j: (r, i, 0))
  out_specs = [row_spec]
  out_shape = [jax.ShapeDtypeStruct((b * n, t_pad, h), q.dtype)]
  if return_stats:
    out_specs += [row_spec, row_spec]
    out_shape += [jax.ShapeDtypeStruct((b * n, t_pad, h), jnp.float32)] * 2
  res = pl.pallas_call(
      functools.partial(_kernel, block_s=block_s, num_s_blocks=num_s,
                        s_len=s_len, logit_cap=logit_cap,
                        return_stats=return_stats),
      grid=(b * n, num_t, num_s),
      in_specs=[
          row_spec,
          pl.BlockSpec((1, h, block_s), lambda r, i, j: (kv_row(r), 0, j)),
          pl.BlockSpec((1, block_s, h), lambda r, i, j: (kv_row(r), j, 0)),
          pl.BlockSpec((1, block_t, block_s),
                       lambda r, i, j: (mask_row(r), i, j)),
      ],
      out_specs=out_specs if return_stats else out_specs[0],
      out_shape=out_shape if return_stats else out_shape[0],
      scratch_shapes=[
          pltpu.VMEM((block_t, 1), jnp.float32),
          pltpu.VMEM((block_t, 1), jnp.float32),
          pltpu.VMEM((block_t, h), jnp.float32),
      ],
      interpret=interpret,
  )(qf, k_cache, v_cache, mask8)

  def unflatten(x):   # [b*n or n*b, t_pad, ...] -> [B, T, N, ...]
    x = x[:, :t]
    if layout == "head_major":
      return x.reshape(n, b, t, h).transpose(1, 2, 0, 3)
    return x.reshape(b, n, t, h).transpose(0, 2, 1, 3)

  if return_stats:
    out, m, l = res
    return unflatten(out), unflatten(m)[..., 0], unflatten(l)[..., 0]
  return unflatten(res)


def decode_attention_tp(q, k_cache, v_cache, mask, mesh, *, n_kv_heads: int,
                        logit_cap: float = 0.0, axis: str = "model",
                        block_s: int = 2048, interpret: bool | None = None):
  """Tensor-parallel decode attention: heads sharded over a mesh axis.

  GSPMD treats a pallas_call as an opaque custom call and would REPLICATE
  the KV cache (an all-gather per layer per step); this wrapper shard_maps
  the kernel so each device attends over only its own head slice — zero
  decode-time communication (the wo projection's psum is the only
  collective, inserted by GSPMD outside).

  q: [B, T, N, H] with N sharded over `axis`.
  k_cache: [n_kv, B, H, S]; v_cache: [n_kv, B, S, H] — HEAD-LEADING
  rank-4 (models/lm.py init_cache(serve_tp=True)), dim 0 sharded over
  `axis`. Head-leading keeps each device's shard a contiguous head
  slice; the local flatten [n_kv_local*B, ...] is then row r = h*B + b
  (the kernel's "head_major" layout). mask: [B, T, S], replicated.
  Requires n_heads % m == 0 and n_kv % m == 0 (m = mesh.shape[axis]) so
  every device's q-head slice maps onto whole local kv heads under GQA.
  """
  from jax.sharding import PartitionSpec as P
  b, t, n, h = q.shape
  m = mesh.shape[axis]
  if n % m or n_kv_heads % m:
    raise ValueError(
        f"serve_tp: n_heads ({n}) and n_kv_heads ({n_kv_heads}) must be "
        f"divisible by mesh axis '{axis}' size {m}")

  def local_fn(q_l, k_l, v_l, mask_l):
    nkv_l = k_l.shape[0]
    kf = k_l.reshape(nkv_l * b, h, k_l.shape[-1])
    vf = v_l.reshape(nkv_l * b, v_l.shape[2], h)
    return decode_attention(q_l, kf, vf, mask_l, n_kv_heads=nkv_l,
                            logit_cap=logit_cap, block_s=block_s,
                            interpret=interpret, layout="head_major")

  shard_map = getattr(jax, "shard_map", None)
  if shard_map is None:  # older jax
    from jax.experimental.shard_map import shard_map
  qspec = P(None, None, axis, None)
  kvspec = P(axis, None, None, None)
  # check_vma=False: pallas_call's out_shape carries no vma annotation
  return shard_map(local_fn, mesh=mesh,
                   in_specs=(qspec, kvspec, kvspec, P()),
                   out_specs=qspec,
                   check_vma=False)(q, k_cache, v_cache, mask)


def decode_attention_sp(q, k_cache, v_cache, mask, mesh, *, n_kv_heads: int,
                        logit_cap: float = 0.0, axis: str = "model",
                        block_s: int = 2048, interpret: bool | None = None):
  """Sequence-parallel decode attention: the KV CACHE is sharded over S.

  The long-context serving mode: when one device cannot hold (or stream)
  the whole cache, shard it over the sequence dim — k [B*n_kv, hd, S]
  P(None, None, axis), v [B*n_kv, S, hd] P(None, axis, None), mask
  [B, T, S] sharded on S; q is replicated (it is tiny at decode).
  Each device runs the kernel over its local S slice emitting online-
  softmax partials (out_i, m_i, l_i), merged exactly across the ring:

      m* = pmax(m_i);  w_i = l_i * exp(m_i - m*)
      out = psum(w_i * out_i) / psum(w_i)

  A fully-masked local shard reports l_i == 0 (raw, unclamped) so its
  weight vanishes exactly; if every shard is masked the clamped
  denominator yields zeros, not NaN. This is the decode-side counterpart
  of ops/ring_attention.py's training-time merge — the reference shards
  neither (hero/config_lib.py:86-98 never shards seq).
  """
  from jax.sharding import PartitionSpec as P

  n_dev = mesh.shape[axis]
  s = k_cache.shape[-1]
  s_pad = -(-s // n_dev) * n_dev
  if s_pad != s:  # pad S to a shard multiple; pad keys are mask=False
    k_cache = jnp.pad(k_cache, ((0, 0), (0, 0), (0, s_pad - s)))
    v_cache = jnp.pad(v_cache, ((0, 0), (0, s_pad - s), (0, 0)))
    mask = jnp.pad(mask, ((0, 0), (0, 0), (0, s_pad - s)))

  def local_fn(q_l, k_l, v_l, mask_l):
    out, m, l = decode_attention(
        q_l, k_l, v_l, mask_l, n_kv_heads=n_kv_heads, logit_cap=logit_cap,
        block_s=block_s, interpret=interpret, return_stats=True)
    m_star = jax.lax.pmax(m, axis)
    w = l * jnp.exp(m - m_star)                          # [B, T, N]
    num = jax.lax.psum(w[..., None] * out.astype(jnp.float32), axis)
    den = jax.lax.psum(w, axis)
    return (num / jnp.maximum(den[..., None], 1e-30)).astype(out.dtype)

  shard_map = getattr(jax, "shard_map", None)
  if shard_map is None:  # older jax
    from jax.experimental.shard_map import shard_map
  return shard_map(local_fn, mesh=mesh,
                   in_specs=(P(), P(None, None, axis), P(None, axis, None),
                             P(None, None, axis)),
                   out_specs=P(),
                   check_vma=False)(q, k_cache, v_cache, mask)
