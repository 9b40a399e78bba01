"""Continuous-batching LM serving engine (slot-based, TPU-native).

The reference serves its LM only as whole-batch generate calls
(hero/model_lib.py:2268-2394 sample_decode): every request in a batch
waits for the slowest one, and a new request waits for the whole batch.
Production TPU serving wants *continuous batching*: a fixed pool of B
decode slots over ONE persistent KV cache, where finished requests free
their slot immediately and queued requests are prefilled into free slots
while the other slots keep decoding.

Design (TPU-first):
  * ONE cache of shape [B, S] per layer lives across the whole serve
    loop; every slot sits at a different sequence offset, so cache writes
    use per-row scatter indices (models/lm.py Attention.apply vector
    cache_index) with out-of-range positions dropped — inactive slots
    simply park their writes at index S.
  * Decode runs in jitted BURSTS of `burst` steps (lax.scan): one
    host->device round trip and one cache materialization per burst, not
    per token; rows that finish mid-burst (EOS or budget) freeze exactly
    like greedy_generate's while_loop (emit pad, skip cache writes), so
    output is token-exact vs per-request greedy_generate.
  * Prefill compiles per power-of-two length bucket: a batch-1 forward
    into a bucket-sized temp cache, then one scatter of the real rows
    into the slot's row of the big cache (pad rows dropped at index S).

Greedy output is token-exact against greedy_generate per request
(tests/test_lm_server.py). Sampling params (temperature/top_k/top_p) and
eos_id are server-level; max_new_tokens is per-request.
"""

from __future__ import annotations

import collections
import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from automl_tpu.models.lm import (_pack_stops, chosen_logprob,
                                  sample_logits)


@dataclasses.dataclass
class GenRequest:
  """One generation request: a prompt and its decode budget."""
  prompt: Sequence[int]
  max_new_tokens: int = 64


@dataclasses.dataclass
class GenResult:
  tokens: list          # generated ids, EOS included when hit
  prompt_len: int
  finished_by_eos: bool
  logprobs: list = None  # per generated token (want_logprobs=True only)
  finished_by_stop: bool = False  # ended by a server stop_sequence


class LMServer:
  """Slot-based continuous batching over one persistent [B, S] KV cache."""

  def __init__(self, model, params, max_batch: int = 8,
               max_seq_len: int = 2048, temperature: float = 0.0,
               top_k: int = 0, top_p: float = 0.0,
               eos_id: Optional[int] = None, burst: int = 8, seed: int = 0,
               cast_weights: bool = True, stop_sequences=None,
               want_logprobs: bool = False):
    from automl_tpu.models.lm import cast_lm_params_for_serving
    if cast_weights and getattr(model, "cfg", None) is not None:
      # One-time f32 -> activation-dtype cast of the matmul weights:
      # the per-burst jit otherwise re-converts ~all weights every call
      # (~1.5 ms/burst at 234M on-chip). Bit-identical output — the same
      # rounding happens in-graph when the weights are left f32.
      params = cast_lm_params_for_serving(params, model.cfg)
    self.model, self.params = model, params
    self.B, self.S = int(max_batch), int(max_seq_len)
    cfg = getattr(model, "cfg", None)
    if cfg is not None and cfg.get("serve_sp"):
      # round the cache up to a 'model'-shard multiple so decode never
      # pads the S-sharded cache inside the burst (full-cache copy/step)
      try:
        mesh = jax.sharding.get_abstract_mesh()
        m = 1 if mesh is None or mesh.empty else mesh.shape.get("model", 1)
      except Exception:
        m = 1
      self.S = -(-self.S // m) * m
    # log_softmax over the whole vocab per step is not free: only pay it
    # when the caller wants GenResult.logprobs
    self.want_logprobs = bool(want_logprobs)
    self.temperature, self.top_k, self.top_p = temperature, top_k, top_p
    self.eos_id = eos_id
    # multi-token stop sequences (token-id lists): a slot finishes as
    # soon as its output ends with one (matched inside the jitted burst
    # via a rolling [B, K] window; the stop stays in the output like EOS)
    self.stop_seqs = [list(map(int, s)) for s in (stop_sequences or [])]
    self._stops = _pack_stops(self.stop_seqs) if self.stop_seqs else None
    self._stop_k = int(self._stops.shape[1]) if self.stop_seqs else 1
    self.burst = int(burst)
    self._rng = jax.random.key(seed)
    self._decode = jax.jit(self._decode_burst)
    self._prefill_cache = {}  # bucket length -> jitted prefill

  # -- prefill ---------------------------------------------------------------

  def _prefill_fn(self, bucket: int):
    if bucket not in self._prefill_cache:
      def prefill(params, cache, tokens, slot, true_len):
        # Batch-1 forward into a bucket-sized temp cache; pad positions
        # beyond true_len are parked at index S (dropped) when the rows
        # are scattered into the big cache.
        pos = jnp.arange(bucket)[None]
        tmp = self.model.init_cache(1, bucket)
        logits, tmp = self.model(params, tokens, positions=pos, cache=tmp,
                                 cache_index=0, kv_positions=pos)
        write = jnp.where(jnp.arange(bucket) < true_len,
                          jnp.arange(bucket), self.S)
        # Rank-3 batch-major cache (models/lm.py init_cache): k
        # [B*n_kv, hd, S], v [B*n_kv, S, hd]; slot b owns rows
        # b*n_kv .. (b+1)*n_kv. serve_tp stores head-leading rank-4
        # ([n_kv, B, hd, S]); slot b is column b. Either way the pad
        # columns park at index S and are dropped.
        new_cache = []
        for big, t in zip(cache, tmp):
          if big["k"].ndim == 4:               # serve_tp head-leading
            # `slot` is a traced scalar, so jnp treats it as an ADVANCED
            # index: together with `write` the advanced axes move to the
            # front -> target selection is [bucket, n_kv, hd]
            new_cache.append(
                {"k": big["k"].at[:, slot, :, write].set(
                    jnp.transpose(t["k"][:, 0], (2, 0, 1)), mode="drop"),
                 # v's advanced indices (dims 1, 2) are adjacent -> they
                 # stay in place: selection [n_kv, bucket, hd]
                 "v": big["v"].at[:, slot, write].set(
                    t["v"][:, 0], mode="drop")})
            continue
          nkv, hd, _ = t["k"].shape
          krow = jax.lax.dynamic_slice(
              big["k"], (slot * nkv, 0, 0), (nkv, hd, self.S))
          krow = krow.at[:, :, write].set(t["k"], mode="drop")
          vrow = jax.lax.dynamic_slice(
              big["v"], (slot * nkv, 0, 0), (nkv, self.S, hd))
          vrow = vrow.at[:, write].set(t["v"], mode="drop")
          new_cache.append(
              {"k": jax.lax.dynamic_update_slice(
                  big["k"], krow, (slot * nkv, 0, 0)),
               "v": jax.lax.dynamic_update_slice(
                  big["v"], vrow, (slot * nkv, 0, 0))})
        new_cache = tuple(new_cache)
        return new_cache, logits[0, true_len - 1]
      self._prefill_cache[bucket] = jax.jit(prefill)
    return self._prefill_cache[bucket]

  def _bucket(self, n: int) -> int:
    b = 8
    while b < n:
      b *= 2
    return min(b, self.S)

  # -- decode ----------------------------------------------------------------

  def _decode_burst(self, params, cache, last_tok, lengths, active,
                    remaining, rng, win):
    """`burst` decode steps for all slots at once.

    last_tok: [B] most recent token per slot (KV not yet written).
    lengths:  [B] tokens currently in each slot's cache row.
    active:   [B] bool; inactive rows emit 0 and park writes at index S.
    remaining:[B] decode budget left per row.
    Returns (cache, toks [B, burst], logprobs [B, burst], lengths,
    active, remaining, rng).
    """
    kv_pos = jnp.broadcast_to(jnp.arange(self.S)[None], (self.B, self.S))

    def step(carry, _):
      cache, tok, lengths, active, remaining, rng, win = carry
      rng, sub = jax.random.split(rng)
      pos = lengths[:, None].astype(jnp.int32)
      write_idx = jnp.where(active, lengths, self.S)
      logits, cache = self.model(params, tok[:, None], positions=pos,
                                 cache=cache, cache_index=write_idx,
                                 kv_positions=kv_pos)
      nxt = sample_logits(sub, logits[:, 0], self.temperature,
                          self.top_k, self.top_p)
      nxt = jnp.where(active, nxt, 0).astype(jnp.int32)
      lp = (chosen_logprob(logits[:, 0], nxt) if self.want_logprobs
            else jnp.zeros((self.B,), jnp.float32))  # junk on inactive
      lengths = lengths + active              # rows; host slices by emitted
      remaining = remaining - active
      still = active & (remaining > 0)
      if self.eos_id is not None:
        still = still & (nxt != self.eos_id)
      win = jnp.concatenate([win[:, 1:], nxt[:, None]], axis=1)
      if self._stops is not None:
        eq = (self._stops[None] == win[:, None, :]) | (self._stops[None] < 0)
        hit = jnp.all(eq, axis=-1).any(axis=-1)        # [B]
        still = still & ~(hit & active)
      return (cache, nxt, lengths, still, remaining, rng, win), (nxt, lp)

    (cache, last_tok, lengths, active, remaining, rng, win), (toks, lps) = \
        jax.lax.scan(
            step, (cache, last_tok, lengths, active, remaining, rng, win),
            None, length=self.burst)
    return cache, toks.T, lps.T, lengths, active, remaining, rng, win

  # -- serve loop ------------------------------------------------------------

  def serve(self, requests: Sequence[GenRequest]) -> list[GenResult]:
    """Run every request through the slot pool; returns results in order."""
    B, S = self.B, self.S
    queue = collections.deque(enumerate(requests))
    results: list[Optional[GenResult]] = [None] * len(requests)
    outputs: list[list[int]] = [[] for _ in requests]
    outlps: list[list[float]] = [[] for _ in requests]

    cache = self.model.init_cache(B, S)
    win = jnp.full((B, self._stop_k), -2, jnp.int32)  # -2 never matches
    lengths = jnp.zeros((B,), jnp.int32)
    last_tok = jnp.zeros((B,), jnp.int32)
    active = jnp.zeros((B,), bool)
    remaining = jnp.zeros((B,), jnp.int32)
    slot_req = [None] * B       # request index occupying each slot
    self.steps = self.busy_slot_steps = 0

    def finalize(ridx):
      toks = outputs[ridx]
      by_eos = (self.eos_id is not None and len(toks) > 0
                and toks[-1] == self.eos_id)
      seq = [int(t) for t in requests[ridx].prompt] + toks
      by_stop = any(len(seq) >= len(ss) and seq[-len(ss):] == ss
                    for ss in self.stop_seqs)
      results[ridx] = GenResult(tokens=toks, finished_by_eos=by_eos,
                                prompt_len=len(requests[ridx].prompt),
                                logprobs=outlps[ridx],
                                finished_by_stop=by_stop)

    while queue or any(r is not None for r in slot_req):
      active_np = np.asarray(active)
      # Admit queued requests into free slots.
      for b in range(B):
        if slot_req[b] is not None or not queue:
          continue
        ridx, req = queue.popleft()
        prompt = np.asarray(req.prompt, np.int32)
        lp = int(prompt.shape[0])
        if lp + req.max_new_tokens > S:
          raise ValueError(
              f"request {ridx}: prompt ({lp}) + max_new_tokens "
              f"({req.max_new_tokens}) exceeds max_seq_len ({S})")
        bucket = self._bucket(lp)
        padded = np.zeros((1, bucket), np.int32)
        padded[0, :lp] = prompt
        cache, last_logits = self._prefill_fn(bucket)(
            self.params, cache, jnp.asarray(padded), b, lp)
        self._rng, sub = jax.random.split(self._rng)
        first_arr = sample_logits(sub, last_logits[None], self.temperature,
                                  self.top_k, self.top_p)
        first = int(first_arr[0])
        outputs[ridx].append(first)
        if self.want_logprobs:
          outlps[ridx].append(float(
              chosen_logprob(last_logits[None], first_arr)[0]))
        seq = prompt.tolist() + [first]
        tail = seq[-self._stop_k:]
        hit_stop = any(len(seq) >= len(ss) and seq[-len(ss):] == ss
                       for ss in self.stop_seqs)
        done = (req.max_new_tokens <= 1 or hit_stop
                or (self.eos_id is not None and first == self.eos_id))
        if done:
          finalize(ridx)
          continue
        win = win.at[b].set([-2] * (self._stop_k - len(tail)) + tail)
        slot_req[b] = ridx
        lengths = lengths.at[b].set(lp)
        last_tok = last_tok.at[b].set(first)
        active = active.at[b].set(True)
        remaining = remaining.at[b].set(req.max_new_tokens - 1)
        active_np = np.asarray(active)

      if not active_np.any():
        continue
      prev_remaining = np.asarray(remaining)
      cache, toks, lps, lengths, active, remaining, self._rng, win = \
          self._decode(self.params, cache, last_tok, lengths, active,
                       remaining, self._rng, win)
      toks_np = np.asarray(toks)
      lps_np = np.asarray(lps)
      new_remaining = np.asarray(remaining)
      active_after = np.asarray(active)
      emitted = prev_remaining - new_remaining  # per-row tokens this burst
      self.steps += self.burst
      self.busy_slot_steps += int(emitted.sum())
      fixed_last = np.array(last_tok)  # writable host copy
      for b in range(B):
        ridx = slot_req[b]
        if ridx is None:
          continue
        n = int(emitted[b])
        outputs[ridx].extend(int(t) for t in toks_np[b, :n])
        if self.want_logprobs:
          outlps[ridx].extend(float(v) for v in lps_np[b, :n])
        if n > 0:
          fixed_last[b] = toks_np[b, n - 1]
        if not active_after[b]:
          finalize(ridx)
          slot_req[b] = None
      last_tok = jnp.asarray(fixed_last)

    return results
