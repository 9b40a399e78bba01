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
  * Prefill compiles per power-of-two length bucket AND per power-of-two
    GROUP size: every free slot admits in the same call, so an 8-slot
    cold start is ONE batched forward, not eight batch-1 forwards (a
    batch-1 forward at 234M is latency-bound; batching prefills is nearly
    free device time). The forward fills a group-sized temp cache; real
    rows scatter into their slots' rows of the big cache (pad rows and
    pad positions park at index S and are dropped).
  * Long prompts (> prefill_chunk) prefill in CHUNKS against an in-place
    view of their slot's cache row, one chunk per serve-loop iteration,
    INTERLEAVED with the decode bursts — a long prompt never stalls the
    other slots' decoding for more than one chunk-forward (the
    Sarathi/vLLM chunked-prefill idea, TPU-shaped: every chunk length is
    a compiled static shape).
  * serve() records a device-call `timeline` + per-request first-token /
    completion indices so TTFT and completion latency can be priced with
    measured per-call device costs (wall clock through the shared tunnel
    is unreliable — PERF_NOTES measurement-integrity note).
  * PREFIX CACHING: serve(requests, shared_prefix=ids) prefills the
    shared prefix (system prompt) ONCE, then every admission seeds its
    slot's cache from the template and prefills only its own suffix —
    the per-request prefill cost drops from O(prefix+prompt) to
    O(prompt). Token-exact vs serving prefix+prompt concatenations.

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
               want_logprobs: bool = False,
               prefill_chunk: Optional[int] = None,
               use_decode_kernel: Optional[bool] = None):
    from automl_tpu.models.lm import cast_lm_params_for_serving
    if use_decode_kernel is None:
      use_decode_kernel = False
    cfg0 = getattr(model, "cfg", None)
    if (not use_decode_kernel and cfg0 is not None
        and cfg0.get("use_decode_kernel", True)
        # serve_tp/serve_sp decode IS the kernel (shard_map'd per head /
        # per sequence shard) — the dots default is single-chip only
        and not cfg0.get("serve_tp") and not cfg0.get("serve_sp")):
      # The composed burst path defaults to the rank-3 XLA dots even above
      # the isolated-call crossover (S~766): measured end-to-end at
      # prompts 768-1536 on a 2048 cache, dots serves 1699 useful tok/s vs
      # the kernel's 1220 (0.72x) — inside a 16-step burst jit XLA
      # overlaps the dots across steps while 16 opaque pallas calls
      # serialize (PERF_NOTES round 5). Pass use_decode_kernel=True to
      # re-enable the kernel (it still wins per-call in isolation).
      import copy
      cfg0 = copy.deepcopy(cfg0)
      cfg0.update(dict(use_decode_kernel=False))
      model = type(model)(cfg0, getattr(model, "sh", None))
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
    # long prompts prefill in chunks of this many tokens, interleaved with
    # decode bursts (None = whole-prompt bucket prefill only)
    self.prefill_chunk = int(prefill_chunk) if prefill_chunk else None
    self._rng = jax.random.key(seed)
    self._decode = jax.jit(self._decode_burst)
    self._prefill_cache = {}  # (bucket, group, P) -> jitted batched prefill
    self._chunk_cache = {}    # chunk length -> jitted chunk prefill
    self._tpl_cache = {}      # prefix length -> jitted template prefill

  # -- prefill ---------------------------------------------------------------

  def _prefill_fn(self, bucket: int, group: int, prefix_len: int = 0):
    """Batched prefill: `group` prompts (padded to `bucket`) in ONE forward.

    tokens [group, bucket], slots [group], true_lens [group] (0 = pad row:
    every write position parks at index S and is dropped). Returns
    (cache, last_logits [group, V]) where row g holds the logits of its
    prompt's final real token.

    prefix_len P > 0 (prefix caching): tokens are the per-request SUFFIX
    after the shared prefix; the forward attends over a temp cache seeded
    with the prefix template KV (built once by _template_fn) and the
    scatter writes template + suffix into the slot's row."""
    if (bucket, group, prefix_len) not in self._prefill_cache:
      P = prefix_len
      span = P + bucket

      def prefill(params, cache, tokens, slots, true_lens, tpl):
        pos = jnp.broadcast_to(P + jnp.arange(bucket)[None],
                               (group, bucket))
        kv_pos = jnp.broadcast_to(jnp.arange(span)[None], (group, span))
        if P:
          tmp = []
          for t in tpl:
            if t["k"].ndim == 4:  # serve_tp head-leading [n_kv, 1, hd, P]
              nkv, _, hd, _ = t["k"].shape
              tmp.append(
                  {"k": jnp.concatenate(
                      [jnp.broadcast_to(t["k"], (nkv, group, hd, P)),
                       jnp.zeros((nkv, group, hd, bucket), t["k"].dtype)],
                      axis=-1),
                   "v": jnp.concatenate(
                      [jnp.broadcast_to(t["v"], (nkv, group, P, hd)),
                       jnp.zeros((nkv, group, bucket, hd), t["v"].dtype)],
                      axis=2)})
              continue
            nkv, hd, _ = t["k"].shape  # batch-major rank-3 [n_kv, hd, P]
            tmp.append(
                {"k": jnp.concatenate(
                    [jnp.tile(t["k"], (group, 1, 1)),
                     jnp.zeros((group * nkv, hd, bucket), t["k"].dtype)],
                    axis=-1),
                 "v": jnp.concatenate(
                    [jnp.tile(t["v"], (group, 1, 1)),
                     jnp.zeros((group * nkv, bucket, hd), t["v"].dtype)],
                    axis=1)})
          tmp = tuple(tmp)
        else:
          tmp = self.model.init_cache(group, bucket)
        logits, tmp = self.model(params, tokens, positions=pos, cache=tmp,
                                 cache_index=P, kv_positions=kv_pos)
        # Rank-3 batch-major cache (models/lm.py init_cache): k
        # [B*n_kv, hd, S], v [B*n_kv, S, hd]; slot b owns rows
        # b*n_kv .. (b+1)*n_kv. serve_tp stores head-leading rank-4
        # ([n_kv, B, hd, S]); slot b is column b. Either way the pad
        # positions park at index S and are dropped. The per-row scatter
        # loop below is a static unroll over `group` (<= max_batch) — the
        # expensive part (the forward) is batched; the scatters are tiny.
        new_cache = cache
        for g in range(group):
          slot, true_len = slots[g], true_lens[g]
          # pad rows (true_len == 0) park EVERYTHING — incl. the prefix
          # template — at S, or they would corrupt slot 0
          write = jnp.where((jnp.arange(span) < P + true_len)
                            & (true_len > 0), jnp.arange(span), self.S)
          out_cache = []
          for big, t in zip(new_cache, tmp):
            if big["k"].ndim == 4:               # serve_tp head-leading
              # `slot` is a traced scalar, so jnp treats it as an
              # ADVANCED index: together with `write` the advanced axes
              # move to the FRONT -> target selection is [bucket,n_kv,hd]
              out_cache.append(
                  {"k": big["k"].at[:, slot, :, write].set(
                      jnp.transpose(t["k"][:, g], (2, 0, 1)), mode="drop"),
                   # v's advanced indices (dims 1, 2) are adjacent ->
                   # they stay in place: selection [n_kv, bucket, hd]
                   "v": big["v"].at[:, slot, write].set(
                      t["v"][:, g], mode="drop")})
              continue
            nkv = t["k"].shape[0] // group
            hd = t["k"].shape[1]
            tk = t["k"][g * nkv:(g + 1) * nkv]
            tv = t["v"][g * nkv:(g + 1) * nkv]
            krow = jax.lax.dynamic_slice(
                big["k"], (slot * nkv, 0, 0), (nkv, hd, self.S))
            krow = krow.at[:, :, write].set(tk, mode="drop")
            vrow = jax.lax.dynamic_slice(
                big["v"], (slot * nkv, 0, 0), (nkv, self.S, hd))
            vrow = vrow.at[:, write].set(tv, mode="drop")
            out_cache.append(
                {"k": jax.lax.dynamic_update_slice(
                    big["k"], krow, (slot * nkv, 0, 0)),
                 "v": jax.lax.dynamic_update_slice(
                    big["v"], vrow, (slot * nkv, 0, 0))})
          new_cache = tuple(out_cache)
        last = jnp.take_along_axis(
            logits, jnp.maximum(true_lens - 1, 0)[:, None, None], axis=1)
        return new_cache, last[:, 0]
      self._prefill_cache[(bucket, group, prefix_len)] = jax.jit(prefill)
    return self._prefill_cache[(bucket, group, prefix_len)]

  def _template_fn(self, prefix_len: int):
    """Prefill the shared prefix ONCE -> (template per-layer KV for one
    row, last-token logits [V]). The template seeds every admission."""
    if prefix_len not in self._tpl_cache:
      P = prefix_len

      def build(params, tokens):
        pos = jnp.arange(P)[None]
        cache = self.model.init_cache(1, P)
        logits, cache = self.model(params, tokens, positions=pos,
                                   cache=cache, cache_index=0,
                                   kv_positions=pos)
        return cache, logits[0, -1]
      self._tpl_cache[prefix_len] = jax.jit(build)
    return self._tpl_cache[prefix_len]

  def _chunk_prefill_fn(self, chunk: int):
    """One prefill CHUNK for one slot, against an in-place view of the
    slot's cache row (the row already holds the previous chunks' K/V).

    tokens [1, chunk]; start = first position of this chunk; true_end =
    prompt length (positions >= true_end park at S and drop); rel_last =
    index of the prompt's final token within this chunk (only meaningful
    on the last chunk). Returns (cache, last_logits [V])."""
    if chunk not in self._chunk_cache:
      def chunk_prefill(params, cache, tokens, slot, start, true_end,
                        rel_last):
        kv_pos = jnp.arange(self.S)[None]
        pos = (start + jnp.arange(chunk))[None]
        write = jnp.where(pos < true_end, pos, self.S)   # [1, chunk]
        new_cache = []
        views = []
        for big in cache:
          if big["k"].ndim == 4:               # serve_tp head-leading
            views.append(
                {"k": jax.lax.dynamic_slice(
                    big["k"], (0, slot, 0, 0),
                    (big["k"].shape[0], 1, big["k"].shape[2], self.S)),
                 "v": jax.lax.dynamic_slice(
                    big["v"], (0, slot, 0, 0),
                    (big["v"].shape[0], 1, self.S, big["v"].shape[3]))})
            continue
          nkv = big["k"].shape[0] // self.B
          hd = big["k"].shape[1]
          views.append(
              {"k": jax.lax.dynamic_slice(
                  big["k"], (slot * nkv, 0, 0), (nkv, hd, self.S)),
               "v": jax.lax.dynamic_slice(
                  big["v"], (slot * nkv, 0, 0), (nkv, self.S, hd))})
        logits, views = self.model(params, tokens, positions=pos,
                                   cache=tuple(views), cache_index=write,
                                   kv_positions=kv_pos)
        for big, view in zip(cache, views):
          if big["k"].ndim == 4:
            new_cache.append(
                {"k": jax.lax.dynamic_update_slice(
                    big["k"], view["k"], (0, slot, 0, 0)),
                 "v": jax.lax.dynamic_update_slice(
                    big["v"], view["v"], (0, slot, 0, 0))})
            continue
          nkv = big["k"].shape[0] // self.B
          new_cache.append(
              {"k": jax.lax.dynamic_update_slice(
                  big["k"], view["k"], (slot * nkv, 0, 0)),
               "v": jax.lax.dynamic_update_slice(
                  big["v"], view["v"], (slot * nkv, 0, 0))})
        return tuple(new_cache), logits[0, rel_last]
      self._chunk_cache[chunk] = jax.jit(chunk_prefill)
    return self._chunk_cache[chunk]

  def _bucket(self, n: int) -> int:
    b = 8
    while b < n:
      b *= 2
    return min(b, self.S)

  def _group_bucket(self, n: int) -> int:
    g = 1
    while g < n:
      g *= 2
    return min(g, self.B)

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

  def serve(self, requests: Sequence[GenRequest],
            shared_prefix: Optional[Sequence[int]] = None
            ) -> list[GenResult]:
    """Run every request through the slot pool; returns results in order.

    shared_prefix: optional token ids logically PREPENDED to every
    request's prompt (a system prompt). Its KV is computed once and
    seeded into each admission — per-request prefill cost drops to the
    suffix only. Token-exact vs serving the concatenations. Requests
    must then carry at least one own prompt token, and chunked prefill
    applies only to non-prefix serving."""
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
    pending = {}                # slot -> chunked-prefill state
    self.steps = self.busy_slot_steps = 0
    # device-call timeline + per-request event indices: latency (TTFT /
    # completion) is priced offline with measured per-call device costs
    self.timeline = []
    self.request_events = {i: {} for i in range(len(requests))}

    tpl, tpl_P, pfx = None, 0, None
    if shared_prefix is not None:
      pfx = np.asarray(shared_prefix, np.int32)
      tpl_P = int(pfx.shape[0])
      tpl, _ = self._template_fn(tpl_P)(self.params,
                                        jnp.asarray(pfx[None]))
      self.timeline.append({"kind": "prefix", "len": tpl_P})
    eff_prompts = {}  # ridx -> full (prefix + own) prompt list

    def finalize(ridx):
      toks = outputs[ridx]
      by_eos = (self.eos_id is not None and len(toks) > 0
                and toks[-1] == self.eos_id)
      seq = eff_prompts.get(
          ridx, [int(t) for t in requests[ridx].prompt]) + toks
      by_stop = any(len(seq) >= len(ss) and seq[-len(ss):] == ss
                    for ss in self.stop_seqs)
      results[ridx] = GenResult(tokens=toks, finished_by_eos=by_eos,
                                prompt_len=len(requests[ridx].prompt),
                                logprobs=outlps[ridx],
                                finished_by_stop=by_stop)
      self.request_events[ridx]["done"] = len(self.timeline)

    def activate(b, ridx, req, prompt, last_logits):
      """Sample the first token off `last_logits`; occupy slot b (or
      finish immediately). Returns the updated device arrays."""
      nonlocal cache, win, lengths, last_tok, active, remaining
      self._rng, sub = jax.random.split(self._rng)
      first_arr = sample_logits(sub, last_logits[None], self.temperature,
                                self.top_k, self.top_p)
      first = int(first_arr[0])
      outputs[ridx].append(first)
      self.request_events[ridx]["first"] = len(self.timeline)
      if self.want_logprobs:
        outlps[ridx].append(float(
            chosen_logprob(last_logits[None], first_arr)[0]))
      seq = prompt.tolist() + [first]
      tail = seq[-self._stop_k:]
      hit_stop = any(len(seq) >= len(ss) and seq[-len(ss):] == ss
                     for ss in self.stop_seqs)
      lp = len(prompt)
      done = (req.max_new_tokens <= 1 or hit_stop
              or (self.eos_id is not None and first == self.eos_id))
      if done:
        finalize(ridx)
        return
      win = win.at[b].set([-2] * (self._stop_k - len(tail)) + tail)
      slot_req[b] = ridx
      lengths = lengths.at[b].set(lp)
      last_tok = last_tok.at[b].set(first)
      active = active.at[b].set(True)
      remaining = remaining.at[b].set(req.max_new_tokens - 1)

    while queue or pending or any(r is not None for r in slot_req):
      # Admit queued requests into free slots: long prompts become
      # chunked-prefill states; the rest prefill in per-bucket GROUPS
      # (one batched forward per bucket, not one call per request).
      admits = {}  # bucket -> list of (slot, ridx, req, prompt)
      for b in range(B):
        if slot_req[b] is not None or b in pending or not queue:
          continue
        ridx, req = queue.popleft()
        prompt = np.asarray(req.prompt, np.int32)
        lp = int(prompt.shape[0])
        if tpl is not None and lp < 1:
          raise ValueError(
              f"request {ridx}: shared_prefix serving needs at least one "
              "own prompt token per request")
        if tpl_P + lp + req.max_new_tokens > S:
          raise ValueError(
              f"request {ridx}: prefix ({tpl_P}) + prompt ({lp}) + "
              f"max_new_tokens ({req.max_new_tokens}) exceeds "
              f"max_seq_len ({S})")
        if self.prefill_chunk and lp > self.prefill_chunk and tpl is None:
          pending[b] = {"ridx": ridx, "req": req, "prompt": prompt,
                        "start": 0}
          continue
        admits.setdefault(self._bucket(lp), []).append(
            (b, ridx, req, prompt))
      for bucket in sorted(admits):
        group = admits[bucket]
        g = self._group_bucket(len(group))
        tokens = np.zeros((g, bucket), np.int32)
        slots = np.zeros((g,), np.int32)
        true_lens = np.zeros((g,), np.int32)  # pad rows: 0 -> all parked
        for i, (b, ridx, req, prompt) in enumerate(group):
          tokens[i, :len(prompt)] = prompt
          slots[i] = b
          true_lens[i] = len(prompt)
        cache, last_logits = self._prefill_fn(bucket, g, tpl_P)(
            self.params, cache, jnp.asarray(tokens), jnp.asarray(slots),
            jnp.asarray(true_lens), tpl if tpl is not None else ())
        self.timeline.append(
            {"kind": "prefill", "bucket": bucket, "group": g,
             "prefix": tpl_P})
        last_np = np.asarray(last_logits)
        for i, (b, ridx, req, prompt) in enumerate(group):
          if tpl is not None:
            eff_prompts[ridx] = [int(t) for t in pfx] + prompt.tolist()
            full = np.concatenate([pfx, prompt])
          else:
            full = prompt
          activate(b, ridx, req, full, jnp.asarray(last_np[i]))

      # Advance every pending chunked prefill by ONE chunk — decode
      # never stalls behind a long prompt for more than one chunk call.
      for b in sorted(pending):
        st = pending[b]
        C = self.prefill_chunk
        lp = len(st["prompt"])
        start = st["start"]
        piece = np.zeros((1, C), np.int32)
        n = min(C, lp - start)
        piece[0, :n] = st["prompt"][start:start + n]
        rel_last = min(lp - 1 - start, C - 1)
        cache, last_logits = self._chunk_prefill_fn(C)(
            self.params, cache, jnp.asarray(piece), b, start, lp,
            rel_last)
        self.timeline.append({"kind": "chunk", "chunk": C})
        st["start"] = start + n
        if st["start"] >= lp:
          activate(b, st["ridx"], st["req"], st["prompt"], last_logits)
          del pending[b]

      active_np = np.asarray(active)
      if not active_np.any():
        continue
      prev_remaining = np.asarray(remaining)
      cache, toks, lps, lengths, active, remaining, self._rng, win = \
          self._decode(self.params, cache, last_tok, lengths, active,
                       remaining, self._rng, win)
      self.timeline.append({"kind": "burst", "steps": self.burst,
                            "active": int(active_np.sum())})
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
