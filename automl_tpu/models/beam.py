"""Beam-search decoding with in-place KV cache and per-step beam reorder.

The reference serves its LM with sampling only (hero/model_lib.py:2268-2394
sample_decode has temperature/top-k but no beam search); this adds standard
length-penalized beam search as a TPU-native fixed-trip fori_loop:

  * the prompt is prefilled ONCE at batch B, then the cache rows are
    replicated per beam (rank-3 b-major rows [B*n_kv, ...] ->
    [(B*beams)*n_kv, ...], beams innermost so row (b*K + j)*n_kv + h);
  * each step scores all beams in one batched forward, takes the top-K of
    the [K*V] joint (step 0 masks beams > 0 so identical starts don't
    fill the beam with duplicates), and REORDERS the cache rows to the
    surviving parents with one gather per layer — the classic beam
    shuffle; everything stays on-device inside one jit;
  * finished beams (eos) are frozen: they emit pad, their score stops
    accumulating, and expansion of a finished beam keeps exactly one
    continuation (the pad) so it competes as-is in the joint top-K;
  * final selection: highest score / (length ** length_penalty) per batch
    row (GNMT-style length normalization).

Token-for-token equal to a naive no-cache re-scoring implementation
(tests/test_beam.py oracle) and to greedy_generate at num_beams=1.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _replicate_cache_rows(cache, b, n_kv, beams):
  """Replicate per-batch cache entries per beam (beams innermost).

  Batch-major rank-3 layout: [B*n_kv, ...] -> [(B*beams)*n_kv, ...].
  Head-leading rank-4 (serve_tp): batch is dim 1 -> repeat along it."""
  def rep(x):
    if x.ndim == 4:                              # [n_kv, B, ...] serve_tp
      return jnp.repeat(x, beams, axis=1)
    return jnp.repeat(x.reshape(b, n_kv, *x.shape[1:]), beams, axis=0) \
              .reshape(b * beams * n_kv, *x.shape[1:])
  return tuple({k: rep(v) for k, v in layer.items()} for layer in cache)


def _gather_cache_rows(cache, row_parent, n_kv):
  """Reorder cache entries to surviving parents.

  row_parent: [B*beams] flat parent batch-beam index. Gathers dim 0
  (expanded by n_kv) for the batch-major rank-3 layout, dim 1 for the
  head-leading rank-4 serve_tp layout — either way the gathered dim is
  unsharded, so GSPMD keeps the head/sequence sharding intact."""
  idx3 = (row_parent[:, None] * n_kv
          + jnp.arange(n_kv)[None, :]).reshape(-1)    # [(B*beams)*n_kv]
  def gather(x):
    if x.ndim == 4:
      return jnp.take(x, row_parent, axis=1)
    return jnp.take(x, idx3, axis=0)
  return tuple({k: gather(v) for k, v in layer.items()} for layer in cache)


def beam_search_generate(model, params, prompt_tokens, max_new_tokens: int,
                         num_beams: int = 4, length_penalty: float = 0.6,
                         eos_id: Optional[int] = None):
  """Returns (tokens [B, T_prompt + max_new], scores [B]).

  tokens carry the best beam per batch row (finished rows pad with 0
  after their eos); scores are the length-normalized log-probabilities
  of the returned sequences. Composes with serve_tp (head-leading cache:
  the beam gather runs on the unsharded batch dim) and serve_sp
  (S-sharded cache: the gather runs on the unsharded row dim)."""
  cfg = getattr(model, "cfg", None)
  b, t0 = prompt_tokens.shape
  k = int(num_beams)
  total = t0 + max_new_tokens
  n_kv = model.cfg.n_kv_heads if cfg is not None else None

  # serve_sp: allocate at a shard multiple (same reasoning as
  # greedy_generate — never pad the sharded cache inside the loop)
  s_alloc = total
  if cfg is not None and cfg.get("serve_sp"):
    try:
      mesh = jax.sharding.get_abstract_mesh()
      m = 1 if mesh is None or mesh.empty else mesh.shape.get("model", 1)
    except Exception:
      m = 1
    s_alloc = -(-total // m) * m

  # prefill at batch B, then replicate rows per beam
  cache = model.init_cache(b, s_alloc)
  positions = jnp.broadcast_to(jnp.arange(t0)[None], (b, t0))
  kv_pos_b = jnp.broadcast_to(jnp.arange(s_alloc)[None], (b, s_alloc))
  logits, cache = model(params, prompt_tokens, positions=positions,
                        cache=cache, cache_index=0, kv_positions=kv_pos_b)
  cache = _replicate_cache_rows(cache, b, n_kv, k)
  first_lp = jax.nn.log_softmax(
      logits[:, t0 - 1].astype(jnp.float32), axis=-1)        # [B, V]
  v = first_lp.shape[-1]

  # step 0: top-k tokens of the shared prefix seed the beams
  scores, tok0 = jax.lax.top_k(first_lp, k)                  # [B, K]
  tokens = jnp.zeros((b, k, total), jnp.int32)
  tokens = tokens.at[:, :, :t0].set(prompt_tokens[:, None, :])
  tokens = tokens.at[:, :, t0].set(tok0)
  done = (tok0 == eos_id) if eos_id is not None else jnp.zeros((b, k), bool)
  lengths = jnp.ones((b, k), jnp.int32)  # generated tokens per beam

  kv_pos = jnp.broadcast_to(jnp.arange(s_alloc)[None], (b * k, s_alloc))

  def body(i, state):
    tokens, cache, scores, done, lengths = state
    cur = jax.lax.dynamic_slice(tokens, (0, 0, i), (b, k, 1))
    logits, cache = model(params, cur.reshape(b * k, 1),
                          positions=jnp.full((b * k, 1), i, jnp.int32),
                          cache=cache, cache_index=i, kv_positions=kv_pos)
    lp = jax.nn.log_softmax(logits[:, 0].astype(jnp.float32), axis=-1)
    lp = lp.reshape(b, k, v)
    # finished beams: exactly ONE continuation (pad, no score change) so
    # the beam competes as-is instead of flooding the top-K
    pad_row = jnp.full((v,), NEG_INF).at[0].set(0.0)
    lp = jnp.where(done[:, :, None], pad_row[None, None, :], lp)
    joint = scores[:, :, None] + lp                          # [B, K, V]
    scores, flat_idx = jax.lax.top_k(joint.reshape(b, k * v), k)
    parent = flat_idx // v                                   # [B, K]
    tok = flat_idx % v
    # reorder every per-beam quantity to the surviving parents
    batch_off = jnp.arange(b)[:, None] * k
    row_parent = (batch_off + parent).reshape(-1)            # [B*K]
    cache = _gather_cache_rows(cache, row_parent, n_kv)
    tokens = jnp.take_along_axis(tokens, parent[:, :, None], axis=1)
    done = jnp.take_along_axis(done, parent, axis=1)
    lengths = jnp.take_along_axis(lengths, parent, axis=1)
    tok = jnp.where(done, 0, tok)
    tokens = jax.lax.dynamic_update_slice(
        tokens, tok[:, :, None].astype(jnp.int32), (0, 0, i + 1))
    lengths = lengths + jnp.where(done, 0, 1)
    if eos_id is not None:
      done = done | (tok == eos_id)
    return tokens, cache, scores, done, lengths

  tokens, cache, scores, done, lengths = jax.lax.fori_loop(
      t0, total - 1, body, (tokens, cache, scores, done, lengths))

  norm = scores / jnp.maximum(lengths.astype(jnp.float32),
                              1.0) ** length_penalty
  best = jnp.argmax(norm, axis=1)                            # [B]
  out = jnp.take_along_axis(tokens, best[:, None, None], axis=1)[:, 0]
  return out, jnp.take_along_axis(norm, best[:, None], axis=1)[:, 0]
