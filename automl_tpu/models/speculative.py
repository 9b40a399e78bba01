"""Speculative decoding: cheap-draft proposals + one-pass target verification.

Beyond the reference: hero's decode loop emits ONE token per full-model
forward (hero/model_lib.py:2268-2394 sample_decode/continue_decode). On TPU
the per-token decode step is HBM-bandwidth-bound — every step streams all
weights + KV cache for a single matvec row — so the MXU idles. Speculative
decoding (Leviathan et al. 2023, "Fast Inference from Transformers via
Speculative Decoding"; Chen et al. 2023) drafts `n_draft` tokens with a
small model, then scores all of them with ONE chunked target forward: the
target reads its weights once per n_draft+1 positions instead of once per
position, and the verify matmuls are (k+1)-row — batched enough to engage
the MXU.

Guarantees:
  * temperature == 0 (greedy): output is TOKEN-EXACT vs greedy_generate on
    the target model, regardless of the draft model's quality — the draft
    only controls speed. (Verified by equality test with a *different*
    random draft model.)
  * temperature > 0: modified rejection sampling — accept draft x with
    prob min(1, p(x)/q(x)), else resample from normalize(max(p - q, 0)) —
    which preserves the target's (warped) sampling distribution exactly.

TPU-shape design (everything static under one jit):
  * The token buffer is padded by n_draft+1 so the final verify block can
    overshoot; output is truncated to t0 + max_new_tokens.
  * All rows of a batch advance together by the BATCH-MIN accepted length
    (keeps the KV cache_index a scalar; optimal at B=1, the latency case
    speculative decoding exists for; conservative-but-correct for B > 1).
  * Stale KV slots from rejected drafts are always overwritten by the next
    iteration's writes before any query can attend to them (the next chunk
    starts at or before the first stale slot).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from automl_tpu.models.lm import TransformerLM


def _warp(logits, temperature: float, top_k: int, top_p: float):
  """sample_logits' filtering (temperature/top-k/top-p) as a logits warp.

  temperature == 0 returns raw logits (callers argmax them)."""
  logits = logits.astype(jnp.float32)
  if temperature == 0.0:
    return logits
  logits = logits / temperature
  if top_k:
    kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
    logits = jnp.where(logits < kth, -1e9, logits)
  if top_p:
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits)
    cum = jnp.cumsum(probs, axis=-1)
    cutoff_idx = jnp.sum(cum < top_p, axis=-1, keepdims=True)
    cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
    logits = jnp.where(logits < cutoff, -1e9, logits)
  return logits


def speculative_generate(model: TransformerLM, params,
                         draft_model: TransformerLM, draft_params,
                         prompt_tokens, max_new_tokens: int,
                         n_draft: int = 4, rng=None,
                         temperature: float = 0.0, top_k: int = 0,
                         top_p: float = 0.0, eos_id: int | None = None,
                         return_stats: bool = False):
  """Decode with draft-model speculation; same contract as greedy_generate.

  prompt_tokens: [B, T0] int32. Returns [B, T0 + max_new_tokens] (plus a
  stats dict {iterations, emitted, accept_rate} when return_stats=True).
  The draft model must share the target's tokenizer/vocab.
  """
  k = int(n_draft)
  assert k >= 1, n_draft
  b, t0 = prompt_tokens.shape
  total = t0 + max_new_tokens
  buf = total + k + 1  # verify-block overshoot room
  greedy = (temperature == 0.0)

  t_cache = model.init_cache(b, buf)
  d_cache = draft_model.init_cache(b, buf)
  kv_pos = jnp.broadcast_to(jnp.arange(buf)[None], (b, buf))
  pos0 = jnp.broadcast_to(jnp.arange(t0)[None], (b, t0))
  # Prefill both caches. The target logits at t0-1 are recomputed by the
  # first verify block (it re-feeds tokens[:, cur]), so only caches matter.
  _, t_cache = model(params, prompt_tokens, positions=pos0, cache=t_cache,
                     cache_index=0, kv_positions=kv_pos)
  _, d_cache = draft_model(draft_params, prompt_tokens, positions=pos0,
                           cache=d_cache, cache_index=0, kv_positions=kv_pos)
  tokens = jnp.zeros((b, buf), jnp.int32).at[:, :t0].set(prompt_tokens)
  rng = rng if rng is not None else jax.random.key(0)

  def body(state):
    tokens, t_cache, d_cache, cur, done, rng, iters, accepted = state
    rng, r_draft, r_acc, r_resid = jax.random.split(rng, 4)

    # 1) draft k tokens, one single-token forward each, re-feeding
    #    tokens[:, cur] first (its KV slot is simply rewritten). k+1 steps,
    #    not k: the extra step commits the LAST draft's KV into the draft
    #    cache (its sampled output is discarded). Without it, a full-accept
    #    iteration leaves slot cur+k unwritten, and the next iteration's
    #    drafts attend to a zero KV row — silently degrading acceptance.
    tok0 = jax.lax.dynamic_slice(tokens, (0, cur), (b, 1))[:, 0]

    def dstep(carry, j):
      d_cache, tok, rr = carry
      p = cur + j
      logits, d_cache = draft_model(
          draft_params, tok[:, None],
          positions=jnp.full((b, 1), p, jnp.int32),
          cache=d_cache, cache_index=p, kv_positions=kv_pos)
      qlog = _warp(logits[:, 0], temperature, top_k, top_p)  # [B, V]
      rr, sub = jax.random.split(rr)
      nxt = (jnp.argmax(qlog, -1) if greedy
             else jax.random.categorical(sub, qlog)).astype(jnp.int32)
      ys = nxt if greedy else (nxt, jax.nn.softmax(qlog, -1))
      return (d_cache, nxt, rr), ys

    (d_cache, _, _), ys = jax.lax.scan(
        dstep, (d_cache, tok0, r_draft), jnp.arange(k + 1))
    if greedy:
      drafts = jnp.transpose(ys[:k])                  # [B, k]
    else:
      drafts = jnp.transpose(ys[0][:k])               # [B, k]
      q_full = jnp.transpose(ys[1][:k], (1, 0, 2))    # [B, k, V]

    # 2) verify: ONE target forward over [tokens[cur], d_1..d_k].
    chunk = jnp.concatenate(
        [jax.lax.dynamic_slice(tokens, (0, cur), (b, 1)), drafts], axis=1)
    vpos = jnp.broadcast_to(cur + jnp.arange(k + 1)[None],
                            (b, k + 1)).astype(jnp.int32)
    vlogits, t_cache = model(params, chunk, positions=vpos, cache=t_cache,
                             cache_index=cur, kv_positions=kv_pos)
    wlog = _warp(vlogits, temperature, top_k, top_p)   # [B, k+1, V]

    # 3) accept a leading run of drafts; produce the emitted values block.
    if greedy:
      t_next = jnp.argmax(wlog, -1).astype(jnp.int32)  # [B, k+1]
      ok = (drafts == t_next[:, :k]).astype(jnp.int32)
      m = jnp.sum(jnp.cumprod(ok, axis=1), axis=1)     # [B] leading accepts
      # accepted drafts EQUAL the target argmax, so the emitted value at
      # every offset is just t_next — acceptance only bounds the advance.
      vals = t_next
    else:
      p_full = jax.nn.softmax(wlog, -1)                # [B, k+1, V]
      p_d = jnp.take_along_axis(p_full[:, :k], drafts[..., None],
                                axis=-1)[..., 0]       # [B, k]
      q_d = jnp.take_along_axis(q_full, drafts[..., None],
                                axis=-1)[..., 0]       # [B, k]
      u = jax.random.uniform(r_acc, (b, k))
      acc = (u * jnp.maximum(q_d, 1e-20) < p_d).astype(jnp.int32)
      m = jnp.sum(jnp.cumprod(acc, axis=1), axis=1)    # [B]
      # Correction token at the rejection offset: residual max(p - q, 0);
      # at m == k (all accepted) it is the bonus sample from p_{k}.
      p_at = jnp.take_along_axis(
          p_full, m[:, None, None], axis=1)[:, 0]      # [B, V]
      q_idx = jnp.minimum(m, k - 1)
      q_at = jnp.take_along_axis(
          q_full, q_idx[:, None, None], axis=1)[:, 0]  # [B, V]
      q_at = jnp.where((m < k)[:, None], q_at, 0.0)
      resid = jnp.maximum(p_at - q_at, 0.0)
      resid = resid / jnp.maximum(resid.sum(-1, keepdims=True), 1e-20)
      corr = jax.random.categorical(
          r_resid, jnp.log(resid + 1e-20)).astype(jnp.int32)  # [B]
      off_k1 = jnp.arange(k + 1)[None]
      drafts_p = jnp.pad(drafts, ((0, 0), (0, 1)))     # [B, k+1]
      vals = jnp.where(off_k1 < m[:, None], drafts_p, corr[:, None])

    a = jnp.min(m + 1)  # batch-min advance (>= 1): m accepts + 1 correction
    off = jnp.arange(k + 1)[None]                      # new pos = cur+1+off
    write = off < a
    if eos_id is not None:
      hit = (vals == eos_id) & write & ~done[:, None]
      excl = jnp.concatenate(
          [jnp.zeros((b, 1), jnp.int32),
           jnp.cumsum(hit.astype(jnp.int32), axis=1)[:, :-1]], axis=1)
      vals = jnp.where(done[:, None] | (excl > 0), 0, vals)  # pad after eos
      done = done | jnp.any(hit, axis=1)
    old = jax.lax.dynamic_slice(tokens, (0, cur + 1), (b, k + 1))
    tokens = jax.lax.dynamic_update_slice(
        tokens, jnp.where(write, vals, old), (0, cur + 1))
    return (tokens, t_cache, d_cache, cur + a, done, rng,
            iters + 1, accepted + (a - 1))

  def cond(state):
    _, _, _, cur, done, _, _, _ = state
    return (cur < t0 - 1 + max_new_tokens) & ~jnp.all(done)

  done0 = jnp.zeros((b,), bool)
  state = (tokens, t_cache, d_cache, jnp.asarray(t0 - 1), done0, rng,
           jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
  tokens, _, _, cur, _, _, iters, accepted = jax.lax.while_loop(
      cond, body, state)
  out = tokens[:, :total]
  if return_stats:
    emitted = cur - (t0 - 1)
    stats = {"iterations": iters, "emitted": emitted,
             "accepted_drafts": accepted,
             # fraction of drafted tokens accepted (batch-min accounting)
             "accept_rate": accepted / jnp.maximum(iters * k, 1)}
    return out, stats
  return out
