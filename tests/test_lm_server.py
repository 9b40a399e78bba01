"""Continuous-batching LM server: token-exactness vs greedy_generate.

The server (inference/lm_server.py) must produce byte-identical greedy
output to per-request greedy_generate while multiplexing requests through
a fixed slot pool — slots are freed mid-flight, queued requests prefill
into reused slots, and decode runs in jitted bursts.
"""

import jax
import jax.numpy as jnp
import numpy as np

from automl_tpu.models import lm as lm_lib
from automl_tpu.models.lm import greedy_generate
from automl_tpu.inference.lm_server import GenRequest, LMServer


def _tiny_model():
  cfg = lm_lib.lm_defaults()
  cfg.update(dict(model_dim=64, n_layers=2, n_heads=4, n_kv_heads=4,
                  head_dim=16, vocab_size=97, seq_len=256,
                  use_flash_attention=False))
  model = lm_lib.TransformerLM(cfg, lm_lib.ShardingConfig.data_parallel())
  params = jax.jit(model.init)(jax.random.key(0))
  return cfg, model, params


def _reference_tokens(model, params, prompt, max_new, eos_id=None):
  out = greedy_generate(model, params, jnp.asarray(prompt, jnp.int32)[None],
                        max_new, eos_id=eos_id)
  gen = [int(t) for t in np.asarray(out)[0, len(prompt):]]
  if eos_id is not None and eos_id in gen:
    gen = gen[:gen.index(eos_id) + 1]
  return gen


def test_server_token_exact_with_slot_reuse():
  """5 requests with mixed prompt lengths/budgets through 2 slots: every
  completion is token-exact vs its own greedy_generate run, including
  requests that queue behind a full pool and reuse freed slots."""
  cfg, model, params = _tiny_model()
  rng = np.random.RandomState(0)
  prompts = [rng.randint(1, cfg.vocab_size, size=n).tolist()
             for n in (3, 17, 9, 30, 5)]
  budgets = [13, 6, 21, 1, 9]

  server = LMServer(model, params, max_batch=2, max_seq_len=128, burst=4)
  results = server.serve([GenRequest(p, m) for p, m in zip(prompts, budgets)])

  for i, (p, m) in enumerate(zip(prompts, budgets)):
    want = _reference_tokens(model, params, p, m)
    assert results[i].tokens == want, f"request {i} diverged"
    assert results[i].prompt_len == len(p)
  # the pool actually multiplexed: 5 requests never fit 2 slots at once
  assert server.busy_slot_steps > 0


class _EosAtPosition:
  """Wraps a TransformerLM to force token `eos` at query position `at_pos`.

  A tiny random model greedy-decodes straight into a fixed point, so a
  natural mid-run EOS never occurs; this bias makes the EOS step
  deterministic and position-dependent (different per prompt length),
  applied identically to the server and the greedy_generate reference."""

  def __init__(self, inner, eos, at_pos):
    self.inner, self.eos, self.at_pos = inner, eos, at_pos

  def init_cache(self, *a, **kw):
    return self.inner.init_cache(*a, **kw)

  def __call__(self, params, tokens, positions=None, **kw):
    b, t = tokens.shape
    if positions is None:
      positions = jnp.broadcast_to(jnp.arange(t)[None], (b, t))
    logits, cache = self.inner(params, tokens, positions=positions, **kw)
    bump = jnp.where(positions == self.at_pos, 1e4, 0.0)
    return logits.at[..., self.eos].add(bump), cache


def test_server_eos_early_stop():
  """eos_id frees the slot at the emitted EOS token: output matches the
  eos-truncated greedy_generate output, finished_by_eos is set, and the
  freed slot serves a queued request."""
  cfg, model, params = _tiny_model()
  eos = 3
  model = _EosAtPosition(model, eos, at_pos=10)
  rng = np.random.RandomState(1)
  # lp=7 -> EOS at generated index 4 (mid-burst with burst=3); lp=12 ->
  # the biased position is inside the prompt, never hit -> full budget;
  # lp=4 -> EOS at generated index 7.
  prompts = [rng.randint(4, cfg.vocab_size, size=n).tolist()
             for n in (7, 12, 4)]

  server = LMServer(model, params, max_batch=1, max_seq_len=128, burst=3,
                    eos_id=eos)
  results = server.serve([GenRequest(p, 12) for p in prompts])

  for i, p in enumerate(prompts):
    want = _reference_tokens(model, params, p, 12, eos_id=eos)
    assert results[i].tokens == want, f"request {i} diverged"
    assert results[i].finished_by_eos == (want[-1] == eos)
  assert results[0].finished_by_eos and len(results[0].tokens) == 5
  assert not results[1].finished_by_eos and len(results[1].tokens) == 12
  assert results[2].finished_by_eos and len(results[2].tokens) == 8


def test_vector_cache_index_matches_scalar():
  """The per-row scatter cache write (vector cache_index) is numerically
  identical to the scalar dynamic_update_slice path when all rows share
  one offset, and out-of-range rows are dropped."""
  cfg, model, params = _tiny_model()
  b, t0, S = 2, 6, 32
  toks = jax.random.randint(jax.random.key(3), (b, t0), 1, cfg.vocab_size)
  kv_pos = jnp.broadcast_to(jnp.arange(S)[None], (b, S))
  cache = model.init_cache(b, S)
  logits_s, cache_s = model(params, toks, cache=cache, cache_index=0,
                            kv_positions=kv_pos)
  logits_v, cache_v = model(
      params, toks, cache=cache, cache_index=jnp.zeros((b,), jnp.int32),
      kv_positions=kv_pos)
  np.testing.assert_allclose(np.asarray(logits_s), np.asarray(logits_v),
                             rtol=0, atol=0)
  for cs, cv in zip(cache_s, cache_v):
    np.testing.assert_array_equal(np.asarray(cs["k"]), np.asarray(cv["k"]))
  # a row parked at index S must leave the cache untouched
  step = jax.random.randint(jax.random.key(4), (b, 1), 1, cfg.vocab_size)
  _, cache_p = model(params, step,
                     positions=jnp.full((b, 1), t0, jnp.int32),
                     cache=cache_s, cache_index=jnp.asarray([t0, S]),
                     kv_positions=kv_pos)
  # the cache is rank-3: k [B*n_kv, hd, S]; batch row b owns rows
  # b*n_kv..(b+1)*n_kv (4 kv heads in the tiny model)
  assert np.asarray(cache_p[0]["k"][:4, :, t0]).any()      # row 0 wrote
  assert not np.asarray(cache_p[0]["k"][4:8, :, t0]).any()  # row 1 dropped


def test_cast_for_serving_is_token_exact_and_selective():
  """cast_lm_params_for_serving: matmul weights -> bf16, embed / norm
  scales / int8 dicts untouched, and generation is bit-identical (the
  same single f32->bf16 rounding happens in-graph when weights stay
  f32)."""
  cfg, model, params = _tiny_model()
  # Nonzero norm scales: zero-init scales are exact in bf16 and would
  # mask an (incorrect) cast of the f32 norm scales.
  params = jax.tree_util.tree_map_with_path(
      lambda p, l: l + 0.37 if jax.tree_util.keystr(p).endswith("'scale']")
      else l, params)
  cast = lm_lib.cast_lm_params_for_serving(params, cfg)
  # embed untouched (also used at f32 by the logits matmul)
  assert cast["embed"].dtype == params["embed"].dtype == jnp.float32
  # 1-D norm scales untouched; block matmul weights cast to bf16
  assert cast["final_norm"]["scale"].dtype == jnp.float32
  flat = jax.tree_util.tree_leaves_with_path(cast["blocks"])
  cast_dtypes = {jax.tree_util.keystr(p): l.dtype for p, l in flat}
  assert any(d == jnp.bfloat16 for d in cast_dtypes.values())
  for name, d in cast_dtypes.items():
    if "scale" in name:
      assert d == jnp.float32, name
  prompt = jnp.asarray([[5, 9, 23, 2]], jnp.int32)
  a = greedy_generate(model, params, prompt, 16)
  b = greedy_generate(model, cast, prompt, 16)
  np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
  # int8 dicts pass through unchanged
  q = lm_lib.quantize_lm_params(params)
  q2 = lm_lib.cast_lm_params_for_serving(q, cfg)
  qleaves = jax.tree_util.tree_leaves(q2)
  assert any(l.dtype == jnp.int8 for l in qleaves)


def test_server_composes_with_serve_sp_mesh():
  """Continuous batching over a SEQUENCE-SHARDED cache (serve_sp): the
  slot server's per-slot scatter writes land on the S-sharded dim via
  GSPMD and decode runs the partial-merge kernel — output must be
  token-exact vs the plain single-device server."""
  from automl_tpu.parallel import create_mesh

  cfg, model, params = _tiny_model()
  reqs = [GenRequest([5, 9, 23], 6), GenRequest([7, 2], 4),
          GenRequest([11, 3, 1, 4], 5)]
  plain = LMServer(model, params, max_batch=2, max_seq_len=64, burst=4)
  want = [r.tokens for r in plain.serve(reqs)]

  sp_cfg = lm_lib.lm_defaults()
  sp_cfg.update(dict(model_dim=64, n_layers=2, n_heads=4, n_kv_heads=4,
                     head_dim=16, vocab_size=97, seq_len=256,
                     use_flash_attention=False, serve_sp=True))
  sp_model = lm_lib.TransformerLM(sp_cfg,
                                  lm_lib.ShardingConfig.data_parallel())
  with jax.set_mesh(create_mesh((1, 2, 4))):
    srv = LMServer(sp_model, params, max_batch=2, max_seq_len=64, burst=4)
    got = [r.tokens for r in srv.serve(reqs)]
  assert got == want, (got, want)


def test_generation_logprobs_match_teacher_forcing():
  """return_logprobs: each generated token's logprob equals the
  log-softmax of a separate teacher-forced full forward at that
  position; the server reports the same values per request."""
  # f32 activations: the cached-decode and teacher-forced forwards agree
  # to float tolerance (bf16 puts ~3e-3 of noise between them)
  cfg = lm_lib.lm_defaults()
  cfg.update(dict(model_dim=64, n_layers=2, n_heads=4, n_kv_heads=4,
                  head_dim=16, vocab_size=97, seq_len=256,
                  use_flash_attention=False, activation_dtype="float32"))
  model = lm_lib.TransformerLM(cfg, lm_lib.ShardingConfig.data_parallel())
  params = jax.jit(model.init)(jax.random.key(0))
  prompt = [5, 9, 23, 2]
  toks, lps = greedy_generate(model, params,
                              jnp.asarray(prompt, jnp.int32)[None], 6,
                              return_logprobs=True)
  toks, lps = np.asarray(toks), np.asarray(lps)
  # teacher-forced oracle: one full forward over the whole sequence
  full_logits, _ = model(params, jnp.asarray(toks))
  lsm = jax.nn.log_softmax(np.asarray(full_logits, np.float32), axis=-1)
  t0 = len(prompt)
  for j in range(6):
    want = lsm[0, t0 - 1 + j, toks[0, t0 + j]]
    np.testing.assert_allclose(lps[0, j], want, atol=2e-4)

  srv = LMServer(model, params, max_batch=2, max_seq_len=64, burst=4,
                 want_logprobs=True)
  res = srv.serve([GenRequest(prompt, 6)])[0]
  assert res.tokens == [int(t) for t in toks[0, t0:]]
  np.testing.assert_allclose(res.logprobs, lps[0, :6], atol=2e-4)
  # default (want_logprobs=False): no logprobs collected, tokens equal
  srv2 = LMServer(model, params, max_batch=2, max_seq_len=64, burst=4)
  res2 = srv2.serve([GenRequest(prompt, 6)])[0]
  assert res2.tokens == res.tokens and res2.logprobs == []


def test_stop_sequences_greedy_and_server():
  """Multi-token stop sequences end generation exactly at the matched
  suffix in both greedy_generate and the slot server (including a match
  spanning a burst boundary), with pad after and finished_by_stop set."""
  cfg, model, params = _tiny_model()
  prompt = [5, 9, 23, 2]
  base = np.asarray(greedy_generate(
      model, params, jnp.asarray(prompt, jnp.int32)[None], 12))
  t0 = len(prompt)
  gen = [int(t) for t in base[0, t0:]]
  stop = gen[2:4]

  # earliest suffix match over prompt+gen (a stop may span the prompt
  # boundary — e.g. this tiny model decodes into a constant fixed point)
  seq = prompt + gen
  j = next(jj for jj in range(len(gen))
           if seq[:t0 + jj + 1][-len(stop):] == stop)
  want = gen[:j + 1]

  out = np.asarray(greedy_generate(
      model, params, jnp.asarray(prompt, jnp.int32)[None], 12,
      stop_sequences=[stop]))
  assert [int(t) for t in out[0, t0:t0 + j + 1]] == want
  assert not out[0, t0 + j + 1:].any()      # pad after the stop

  srv = LMServer(model, params, max_batch=2, max_seq_len=64, burst=3,
                 stop_sequences=[stop])
  res = srv.serve([GenRequest(prompt, 12)])
  assert res[0].tokens == want
  assert res[0].finished_by_stop

  # genuine MID-BURST multi-token match: force tokens 40, 41 at query
  # positions 9, 10 -> the pair lands at generated indices 6, 7 (burst=3:
  # inside the third burst); the model otherwise never emits 40/41
  forced = _EosAtPosition(_EosAtPosition(model, 40, at_pos=9), 41,
                          at_pos=10)
  want_f = _reference_tokens(forced, params, prompt, 12)
  srv2 = LMServer(forced, params, max_batch=1, max_seq_len=64, burst=3,
                  stop_sequences=[[40, 41]])
  res2 = srv2.serve([GenRequest(prompt, 12)])
  assert want_f[6:8] == [40, 41]
  assert res2[0].tokens == want_f[:8]
  assert res2[0].finished_by_stop and not res2[0].finished_by_eos

  # a stop that never occurs changes nothing
  out2 = np.asarray(greedy_generate(
      model, params, jnp.asarray(prompt, jnp.int32)[None], 12,
      stop_sequences=[[96, 96, 96]]))
  np.testing.assert_array_equal(out2, base)


def test_short_stop_fires_before_longest_stop_window():
  """A 1-token stop must fire on the FIRST generated token even when a
  longer stop raises the window size K (review finding: the old global
  i_next >= K gate suppressed short-stop matches near the start)."""
  cfg, model, params = _tiny_model()
  prompt = [5]
  base = np.asarray(greedy_generate(
      model, params, jnp.asarray(prompt, jnp.int32)[None], 8))
  first = int(base[0, 1])
  out = np.asarray(greedy_generate(
      model, params, jnp.asarray(prompt, jnp.int32)[None], 8,
      stop_sequences=[[first], [90, 91, 92]]))
  assert int(out[0, 1]) == first
  assert not out[0, 2:].any()   # stopped immediately, pad after


def test_server_composes_with_serve_tp_mesh():
  """Continuous batching over a HEAD-SHARDED cache (serve_tp): per-slot
  scatter writes on the head-leading layout + the shard_map'd kernel —
  token-exact vs the plain single-device server."""
  from automl_tpu.parallel import create_mesh

  cfg, model, params = _tiny_model()
  reqs = [GenRequest([5, 9, 23], 6), GenRequest([7, 2], 4),
          GenRequest([11, 3, 1, 4], 5)]
  plain = LMServer(model, params, max_batch=2, max_seq_len=64, burst=4)
  want = [r.tokens for r in plain.serve(reqs)]

  tp_cfg = lm_lib.lm_defaults()
  tp_cfg.update(dict(model_dim=64, n_layers=2, n_heads=4, n_kv_heads=4,
                     head_dim=16, vocab_size=97, seq_len=256,
                     use_flash_attention=False, serve_tp=True))
  tp_model = lm_lib.TransformerLM(tp_cfg)  # hero tp pspecs
  with jax.set_mesh(create_mesh((1, 2, 4))):
    srv = LMServer(tp_model, params, max_batch=2, max_seq_len=64, burst=4)
    got = [r.tokens for r in srv.serve(reqs)]
  assert got == want, (got, want)


def test_chunked_prefill_token_exact():
  """Long prompts prefilled in chunks (interleaved with decode bursts)
  produce byte-identical greedy output to whole-prompt prefill AND to
  per-request greedy_generate."""
  cfg, model, params = _tiny_model()
  rng = np.random.RandomState(1)
  prompts = [rng.randint(1, cfg.vocab_size, size=n).tolist()
             for n in (45, 7, 70, 23)]
  budgets = [9, 14, 6, 11]

  plain = LMServer(model, params, max_batch=2, max_seq_len=128, burst=4)
  chunked = LMServer(model, params, max_batch=2, max_seq_len=128, burst=4,
                     prefill_chunk=16)
  r_plain = plain.serve([GenRequest(p, m)
                         for p, m in zip(prompts, budgets)])
  r_chunk = chunked.serve([GenRequest(p, m)
                           for p, m in zip(prompts, budgets)])
  for i, (p, m) in enumerate(zip(prompts, budgets)):
    want = _reference_tokens(model, params, p, m)
    assert r_plain[i].tokens == want, f"plain req {i}"
    assert r_chunk[i].tokens == want, f"chunked req {i}"
  # the chunked server really did chunk: 45->3, 70->5, 23->2 chunk calls
  kinds = [e["kind"] for e in chunked.timeline]
  assert kinds.count("chunk") == 3 + 5 + 2, kinds


def test_batched_prefill_group_token_exact():
  """Several same-bucket prompts admitted together run ONE grouped
  prefill call and stay token-exact."""
  cfg, model, params = _tiny_model()
  rng = np.random.RandomState(2)
  prompts = [rng.randint(1, cfg.vocab_size, size=n).tolist()
             for n in (12, 9, 11, 14)]  # all bucket 16
  server = LMServer(model, params, max_batch=4, max_seq_len=128, burst=4)
  results = server.serve([GenRequest(p, 8) for p in prompts])
  for i, p in enumerate(prompts):
    assert results[i].tokens == _reference_tokens(model, params, p, 8), i
  # cold start: one grouped prefill for all four (group bucket = 4)
  prefills = [e for e in server.timeline if e["kind"] == "prefill"]
  assert prefills and prefills[0]["group"] == 4, server.timeline


def test_timeline_and_request_events():
  """serve() records a device-call timeline + per-request first/done
  indices (the latency-accounting contract the serve bench prices)."""
  cfg, model, params = _tiny_model()
  rng = np.random.RandomState(3)
  prompts = [rng.randint(1, cfg.vocab_size, size=8).tolist()
             for _ in range(3)]
  server = LMServer(model, params, max_batch=2, max_seq_len=64, burst=2)
  results = server.serve([GenRequest(p, 5) for p in prompts])
  assert all(r is not None for r in results)
  assert all(e["kind"] in ("prefill", "chunk", "burst")
             for e in server.timeline)
  for i in range(3):
    ev = server.request_events[i]
    assert 0 < ev["first"] <= ev["done"] <= len(server.timeline), ev
  # request 2 queued behind a full pool: its first token comes later
  assert server.request_events[2]["first"] > \
      server.request_events[0]["first"]


def test_prefix_caching_token_exact():
  """serve(requests, shared_prefix=p) computes the prefix KV ONCE and
  must be token-exact vs serving the full concatenations (and vs
  greedy_generate on prefix+prompt)."""
  cfg, model, params = _tiny_model()
  rng = np.random.RandomState(4)
  prefix = rng.randint(1, cfg.vocab_size, size=19).tolist()
  prompts = [rng.randint(1, cfg.vocab_size, size=n).tolist()
             for n in (5, 12, 3, 9, 7)]
  budgets = [8, 5, 11, 6, 9]

  cached = LMServer(model, params, max_batch=2, max_seq_len=128, burst=4)
  r_cached = cached.serve([GenRequest(p, m)
                           for p, m in zip(prompts, budgets)],
                          shared_prefix=prefix)
  plain = LMServer(model, params, max_batch=2, max_seq_len=128, burst=4)
  r_plain = plain.serve([GenRequest(prefix + p, m)
                         for p, m in zip(prompts, budgets)])
  for i, (p, m) in enumerate(zip(prompts, budgets)):
    want = _reference_tokens(model, params, prefix + p, m)
    assert r_cached[i].tokens == want, f"cached req {i}"
    assert r_plain[i].tokens == want, f"plain req {i}"
  # the template really was built once, and suffix buckets are SMALL
  # (bucket for the longest suffix is 16, not 64 for prefix+prompt)
  kinds = [e["kind"] for e in cached.timeline]
  assert kinds.count("prefix") == 1
  assert all(e.get("bucket", 0) <= 16 for e in cached.timeline
             if e["kind"] == "prefill"), cached.timeline
  # plain serving pays 32-token buckets for every admission
  assert any(e.get("bucket", 0) >= 32 for e in plain.timeline
             if e["kind"] == "prefill"), plain.timeline


def test_prefix_caching_validations():
  import pytest as _pytest
  cfg, model, params = _tiny_model()
  server = LMServer(model, params, max_batch=2, max_seq_len=64, burst=2)
  with _pytest.raises(ValueError, match="at least one"):
    server.serve([GenRequest([], 4)], shared_prefix=[1, 2, 3])
  with _pytest.raises(ValueError, match="exceeds"):
    server.serve([GenRequest([5], 60)], shared_prefix=[1, 2, 3, 4])


def test_server_decode_kernel_opt_in_token_exact():
  """The server defaults to the rank-3 dots decode path (the composed
  burst measurement beat the kernel end-to-end — PERF_NOTES round 5);
  use_decode_kernel=True re-enables the Pallas kernel. Both must be
  token-exact vs greedy_generate."""
  cfg, model, params = _tiny_model()
  cfg.update(dict(decode_kernel_min_s=16))  # let the kernel engage at S=64
  rng = np.random.RandomState(1)
  prompts = [rng.randint(1, cfg.vocab_size, size=n).tolist() for n in (5, 11)]
  budgets = [7, 5]
  reqs = lambda: [GenRequest(p, m) for p, m in zip(prompts, budgets)]

  default = LMServer(model, params, max_batch=2, max_seq_len=64, burst=4)
  # the default server rebuilt its model with the kernel disabled
  assert not default.model.cfg.get("use_decode_kernel", True)
  kernel = LMServer(model, params, max_batch=2, max_seq_len=64, burst=4,
                    use_decode_kernel=True)
  assert kernel.model.cfg.get("use_decode_kernel", True)
  r_def, r_ker = default.serve(reqs()), kernel.serve(reqs())
  for i, (p, m) in enumerate(zip(prompts, budgets)):
    want = _reference_tokens(model, params, p, m)
    assert r_def[i].tokens == want, f"dots request {i} diverged"
    assert r_ker[i].tokens == want, f"kernel request {i} diverged"
