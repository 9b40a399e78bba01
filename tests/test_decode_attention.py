"""Pallas decode-attention kernel vs a dense softmax oracle.

The kernel (ops/decode_attention.py) runs on the rank-3 decode cache
layout with online softmax over S blocks, GQA resolved in the index map,
and an arbitrary [B, T, S] boolean mask. CPU runs interpret mode; the
same code is compile-checked and benchmarked on the chip (PERF_NOTES
round 3: 80 -> 54.5 us vs a ~41 us HBM roofline at b8 S=1024).
"""

import jax
import jax.numpy as jnp
import numpy as np

from automl_tpu.ops.decode_attention import decode_attention


def _oracle(q, k_cache, v_cache, mask, n_kv, logit_cap=0.0):
  b, t, n, h = q.shape
  s = k_cache.shape[-1]
  k = k_cache.reshape(b, n_kv, h, s)
  v = v_cache.reshape(b, n_kv, s, h)
  rep = n // n_kv
  k = np.repeat(np.asarray(k, np.float32), rep, axis=1)
  v = np.repeat(np.asarray(v, np.float32), rep, axis=1)
  qf = np.asarray(q, np.float32).transpose(0, 2, 1, 3)      # [b,n,t,h]
  logits = np.einsum("bnth,bnhs->bnts", qf, k)
  if logit_cap:
    logits = logit_cap * np.tanh(logits / logit_cap)
  logits = np.where(np.asarray(mask)[:, None], logits, -1e30)
  m = logits.max(-1, keepdims=True)
  p = np.exp(logits - m)
  out = np.einsum("bnts,bnsh->bnth", p / p.sum(-1, keepdims=True), v)
  return out.transpose(0, 2, 1, 3)


def _case(b, t, n, n_kv, h, s, cap=0.0, seed=0, block_s=2048):
  ks = jax.random.split(jax.random.key(seed), 4)
  q = jax.random.normal(ks[0], (b, t, n, h), jnp.float32)
  kc = jax.random.normal(ks[1], (b * n_kv, h, s), jnp.float32)
  vc = jax.random.normal(ks[2], (b * n_kv, s, h), jnp.float32)
  # random mask, but guarantee at least one live key per query row
  mask = jax.random.bernoulli(ks[3], 0.6, (b, t, s))
  mask = mask.at[:, :, 0].set(True)
  got = decode_attention(q, kc, vc, mask, n_kv_heads=n_kv, logit_cap=cap,
                         block_s=block_s)
  want = _oracle(q, kc, vc, mask, n_kv, cap)
  np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=2e-5)


def test_decode_attention_matches_oracle_t1():
  _case(b=2, t=1, n=4, n_kv=4, h=16, s=64)


def test_decode_attention_gqa_and_cap():
  _case(b=2, t=1, n=8, n_kv=2, h=16, s=48, cap=50.0)


def test_decode_attention_chunk_verify_shape():
  """T > 1 (speculative chunk verification) with S not a block multiple:
  exercises online-softmax across blocks + trailing-block padding."""
  _case(b=2, t=5, n=4, n_kv=4, h=16, s=80, block_s=32, seed=3)


def test_decode_attention_prefill_t_tiling():
  """Prefill-with-cache calls the kernel with T = prompt length; T is
  tiled (block_t) so [T, block_s] score temps fit scoped VMEM (a measured
  29 MB scoped-vmem OOM at T=1536 S=1664 on v5e before tiling). t=37
  exercises a padded partial t-block (t_pad=40); t=130 exercises
  num_t=2 (block_t=128, t_pad=256) together with S blocking."""
  _case(b=1, t=37, n=2, n_kv=2, h=16, s=96, block_s=32, seed=7)
  _case(b=2, t=130, n=2, n_kv=1, h=16, s=64, block_s=64, seed=8)


def test_decode_attention_fully_masked_row_is_finite():
  """A fully-masked query row (inactive server slot) must produce finite
  output (zeros), not NaN."""
  b, t, n, h, s = 1, 1, 2, 16, 32
  q = jnp.ones((b, t, n, h))
  kc = jnp.ones((b * n, h, s))
  vc = jnp.ones((b * n, s, h))
  out = decode_attention(q, kc, vc, jnp.zeros((b, t, s), bool), n_kv_heads=n)
  assert np.isfinite(np.asarray(out)).all()


def test_decode_kernel_under_tp_mesh_token_exact():
  """Generation with the decode kernel under a (1,2,4) mesh must match the
  unmeshed result token-for-token: GSPMD treats the pallas_call as an
  opaque custom call and replicates its operands, which is functionally
  correct (multi-chip tp serving would want a shard_map wrapping for
  performance — documented in docs/lm.md, not yet needed single-chip)."""
  from automl_tpu import nn
  from automl_tpu.models.lm import lm_defaults, TransformerLM, greedy_generate
  from automl_tpu.parallel import create_mesh

  nn.set_policy("float32")
  cfg = lm_defaults()
  cfg.override("model_dim=64,n_layers=2,n_heads=8,n_kv_heads=4,head_dim=16,"
               "vocab_size=97,seq_len=64,activation_dtype=float32,"
               "decode_kernel_min_s=0")  # force the kernel at tiny S
  model = TransformerLM(cfg)
  params = model.init(jax.random.key(0))
  prompt = jax.random.randint(jax.random.key(1), (2, 8), 0, 97)
  ref = greedy_generate(model, params, prompt, 8)
  with jax.set_mesh(create_mesh((1, 2, 4))):
    out = greedy_generate(model, params, prompt, 8)
  np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_decode_attention_head_major_matches_batch_major():
  """The head-major layout (tp serving: cache row = h*B + b) must agree
  with the batch-major layout on permuted-identical inputs, incl. GQA."""
  b, t, n, n_kv, h, s = 2, 3, 8, 4, 16, 48
  ks = jax.random.split(jax.random.key(7), 4)
  q = jax.random.normal(ks[0], (b, t, n, h), jnp.float32)
  kc = jax.random.normal(ks[1], (b * n_kv, h, s), jnp.float32)   # b-major
  vc = jax.random.normal(ks[2], (b * n_kv, s, h), jnp.float32)
  mask = jax.random.bernoulli(ks[3], 0.7, (b, t, s)).at[:, :, 0].set(True)
  want = decode_attention(q, kc, vc, mask, n_kv_heads=n_kv)
  # re-order rows b*n_kv + h -> h*B + b
  kh = kc.reshape(b, n_kv, h, s).transpose(1, 0, 2, 3).reshape(n_kv * b, h, s)
  vh = vc.reshape(b, n_kv, s, h).transpose(1, 0, 2, 3).reshape(n_kv * b, s, h)
  got = decode_attention(q, kh, vh, mask, n_kv_heads=n_kv,
                         layout="head_major")
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             atol=1e-6, rtol=1e-6)


def test_decode_attention_tp_matches_single_device():
  """shard_map'd tp decode attention over the 8-dev CPU mesh ('model'=4)
  equals the unsharded head-major call."""
  from automl_tpu.ops.decode_attention import decode_attention_tp
  from automl_tpu.parallel import create_mesh

  b, t, n, n_kv, h, s = 2, 1, 8, 4, 16, 64
  ks = jax.random.split(jax.random.key(11), 4)
  q = jax.random.normal(ks[0], (b, t, n, h), jnp.float32)
  k4 = jax.random.normal(ks[1], (n_kv, b, h, s), jnp.float32)
  v4 = jax.random.normal(ks[2], (n_kv, b, s, h), jnp.float32)
  mask = jax.random.bernoulli(ks[3], 0.6, (b, t, s)).at[:, :, 0].set(True)
  want = decode_attention(q, k4.reshape(n_kv * b, h, s),
                          v4.reshape(n_kv * b, s, h), mask,
                          n_kv_heads=n_kv, layout="head_major")
  mesh = create_mesh((1, 2, 4))
  with jax.set_mesh(mesh):
    got = jax.jit(lambda *a: decode_attention_tp(
        *a, mesh, n_kv_heads=n_kv))(q, k4, v4, mask)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             atol=1e-6, rtol=1e-6)


def test_serve_tp_generation_token_exact():
  """serve_tp=True (head-leading sharded cache + shard_map'd kernel) under
  a (1,2,4) mesh with the hero tp PartitionSpecs generates the same
  tokens as the plain single-device path; also exact with no mesh (local
  == global)."""
  from automl_tpu import nn
  from automl_tpu.models.lm import lm_defaults, TransformerLM, greedy_generate
  from automl_tpu.parallel import create_mesh

  nn.set_policy("float32")
  ov = ("model_dim=64,n_layers=2,n_heads=8,n_kv_heads=4,head_dim=16,"
        "vocab_size=97,seq_len=64,activation_dtype=float32")
  cfg = lm_defaults(); cfg.override(ov)
  base = TransformerLM(cfg)
  params = base.init(jax.random.key(0))
  prompt = jax.random.randint(jax.random.key(1), (2, 8), 0, 97)
  ref = greedy_generate(base, params, prompt, 10)

  tp_cfg = lm_defaults(); tp_cfg.override(ov + ",serve_tp=True")
  tp_model = TransformerLM(tp_cfg)  # default hero tp ShardingConfig
  out_nomesh = greedy_generate(tp_model, params, prompt, 10)
  np.testing.assert_array_equal(np.asarray(out_nomesh), np.asarray(ref))
  with jax.set_mesh(create_mesh((1, 2, 4))):
    out_tp = greedy_generate(tp_model, params, prompt, 10)
  np.testing.assert_array_equal(np.asarray(out_tp), np.asarray(ref))


def test_decode_kernel_s_gate():
  """Below decode_kernel_min_s the decode step must trace to the rank-3
  XLA dots (no pallas_call): the kernel's fixed per-call dispatch loses
  to the dots at short cache lengths (PERF_NOTES round-3 crossover)."""
  from automl_tpu.models.lm import lm_defaults, TransformerLM

  ov = ("model_dim=64,n_layers=1,n_heads=4,n_kv_heads=4,head_dim=16,"
        "vocab_size=97,seq_len=64,activation_dtype=float32")

  def decode_jaxpr(extra=""):
    cfg = lm_defaults(); cfg.override(ov + extra)
    model = TransformerLM(cfg)
    params = model.init(jax.random.key(0))
    cache = model.init_cache(1, 64)
    kv_pos = jnp.arange(64)[None]
    return str(jax.make_jaxpr(
        lambda p, c, t: model(p, t, positions=jnp.zeros((1, 1), jnp.int32),
                              cache=c, cache_index=3, kv_positions=kv_pos)
    )(params, cache, jnp.ones((1, 1), jnp.int32)))

  assert "pallas_call" not in decode_jaxpr()            # 64 < default 768
  assert "pallas_call" in decode_jaxpr(",decode_kernel_min_s=0")


def test_serve_tp_error_paths():
  """serve_tp must fail loudly (not silently misbehave) when heads don't
  divide the mesh axis or when the dots fallback / vector cache_index is
  requested."""
  import pytest
  from automl_tpu.models.lm import lm_defaults, TransformerLM
  from automl_tpu.ops.decode_attention import decode_attention_tp
  from automl_tpu.parallel import create_mesh

  # n_kv=3 not divisible by model-axis 4
  q = jnp.ones((2, 1, 6, 16))
  k4 = jnp.ones((3, 2, 16, 32))
  v4 = jnp.ones((3, 2, 32, 16))
  mask = jnp.ones((2, 1, 32), bool)
  mesh = create_mesh((1, 2, 4))
  with pytest.raises(ValueError, match="divisible"):
    decode_attention_tp(q, k4, v4, mask, mesh, n_kv_heads=3)

  # serve_tp without the kernel is an explicit error
  cfg = lm_defaults()
  cfg.override("model_dim=64,n_layers=1,n_heads=4,n_kv_heads=4,head_dim=16,"
               "vocab_size=97,seq_len=32,serve_tp=True,"
               "use_decode_kernel=False,activation_dtype=float32")
  model = TransformerLM(cfg)
  params = model.init(jax.random.key(0))
  cache = model.init_cache(1, 32)
  with pytest.raises(ValueError, match="use_decode_kernel"):
    model(params, jnp.ones((1, 1), jnp.int32),
          positions=jnp.zeros((1, 1), jnp.int32), cache=cache,
          cache_index=0, kv_positions=jnp.arange(32)[None])

  # serve_sp + serve_tp is rejected at construction
  cfg2 = lm_defaults()
  cfg2.override("model_dim=64,n_layers=1,n_heads=4,n_kv_heads=4,head_dim=16,"
                "vocab_size=97,seq_len=32,serve_tp=True,serve_sp=True,"
                "activation_dtype=float32")
  with pytest.raises(ValueError, match="mutually exclusive"):
    TransformerLM(cfg2)


def test_decode_attention_stats_merge_equals_full():
  """Online-softmax partials from two S-halves merged with the
  m*/l-weight formula must equal the full-S result (the decode-side
  ring-merge identity)."""
  b, t, n, n_kv, h, s = 2, 1, 4, 4, 16, 64
  ks = jax.random.split(jax.random.key(5), 4)
  q = jax.random.normal(ks[0], (b, t, n, h), jnp.float32)
  kc = jax.random.normal(ks[1], (b * n_kv, h, s), jnp.float32)
  vc = jax.random.normal(ks[2], (b * n_kv, s, h), jnp.float32)
  mask = jax.random.bernoulli(ks[3], 0.6, (b, t, s)).at[:, :, 0].set(True)
  want = decode_attention(q, kc, vc, mask, n_kv_heads=n_kv)
  half = s // 2
  parts = []
  for sl in (slice(0, half), slice(half, s)):
    o, m, l = decode_attention(q, kc[:, :, sl], vc[:, sl], mask[:, :, sl],
                               n_kv_heads=n_kv, return_stats=True)
    parts.append((np.asarray(o, np.float64), np.asarray(m, np.float64),
                  np.asarray(l, np.float64)))
  m_star = np.maximum(parts[0][1], parts[1][1])
  num = sum(l * np.exp(m - m_star) * o.transpose(3, 0, 1, 2)
            for o, m, l in parts).transpose(1, 2, 3, 0)
  den = sum(l * np.exp(m - m_star) for _, m, l in parts)
  merged = num / np.maximum(den[..., None], 1e-30)
  np.testing.assert_allclose(merged, np.asarray(want), atol=2e-5, rtol=2e-5)


def test_decode_attention_sp_matches_unsharded():
  """Sequence-parallel decode attention (cache sharded over S on the
  8-dev mesh 'model'=4) equals the unsharded kernel, including a batch
  row whose live keys all sit in ONE shard (other shards fully masked)."""
  from automl_tpu.ops.decode_attention import decode_attention_sp
  from automl_tpu.parallel import create_mesh

  b, t, n, n_kv, h, s = 2, 1, 4, 2, 16, 64
  ks = jax.random.split(jax.random.key(13), 4)
  q = jax.random.normal(ks[0], (b, t, n, h), jnp.float32)
  kc = jax.random.normal(ks[1], (b * n_kv, h, s), jnp.float32)
  vc = jax.random.normal(ks[2], (b * n_kv, s, h), jnp.float32)
  mask = jax.random.bernoulli(ks[3], 0.5, (b, t, s))
  mask = mask.at[0].set(False).at[0, :, 3:9].set(True)  # one-shard row
  mask = mask.at[1, :, 0].set(True)
  want = decode_attention(q, kc, vc, mask, n_kv_heads=n_kv)
  mesh = create_mesh((1, 2, 4))
  with jax.set_mesh(mesh):
    got = jax.jit(lambda *a: decode_attention_sp(
        *a, mesh, n_kv_heads=n_kv))(q, kc, vc, mask)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             atol=2e-5, rtol=2e-5)


def test_serve_sp_generation_token_exact():
  """serve_sp=True (S-sharded cache + partial-merge kernel) generates the
  same tokens as the plain path — including for a ring-attention-trained
  config, closing the r2-verdict SP-decode gap for real (the previous
  answer was an explicit error)."""
  from automl_tpu import nn
  from automl_tpu.models.lm import lm_defaults, TransformerLM, greedy_generate
  from automl_tpu.parallel import create_mesh

  nn.set_policy("float32")
  ov = ("model_dim=64,n_layers=2,n_heads=4,n_kv_heads=2,head_dim=16,"
        "vocab_size=97,seq_len=64,activation_dtype=float32")
  cfg = lm_defaults(); cfg.override(ov)
  base = TransformerLM(cfg)
  params = base.init(jax.random.key(0))
  prompt = jax.random.randint(jax.random.key(1), (2, 8), 0, 97)
  ref = greedy_generate(base, params, prompt, 10)

  # ring-trained config + serve_sp: decodes instead of raising
  sp_cfg = lm_defaults()
  sp_cfg.override(ov + ",use_ring_attention=True,serve_sp=True")
  sp_model = TransformerLM(sp_cfg)
  out_nomesh = greedy_generate(sp_model, params, prompt, 10)
  np.testing.assert_array_equal(np.asarray(out_nomesh), np.asarray(ref))
  with jax.set_mesh(create_mesh((1, 2, 4))):
    out_sp = greedy_generate(sp_model, params, prompt, 10)
  np.testing.assert_array_equal(np.asarray(out_sp), np.asarray(ref))


def test_serve_sp_divides_per_device_cache_memory():
  """The point of serve_sp: compiled per-device memory of a decode step
  drops by ~the 'model'-axis size because the KV cache is S-sharded
  (cf. the EP memory-payoff table in PERF_NOTES). Measured via XLA's
  compiled memory_analysis on the 8-dev CPU mesh (model=4)."""
  from automl_tpu import nn
  from automl_tpu.models.lm import lm_defaults, TransformerLM
  from automl_tpu.parallel import create_mesh

  nn.set_policy("float32")
  ov = ("model_dim=128,n_layers=2,n_heads=8,n_kv_heads=8,head_dim=32,"
        "vocab_size=256,seq_len=2048,activation_dtype=float32")
  B, S = 4, 2048
  stats = {}
  for mode in ("plain", "serve_sp"):
    cfg = lm_defaults()
    cfg.override(ov + (",serve_sp=True" if mode == "serve_sp" else ""))
    model = TransformerLM(cfg)
    with jax.set_mesh(create_mesh((1, 2, 4))):
      params = model.init(jax.random.key(0))
      cache = model.init_cache(B, S)
      kv_pos = jnp.broadcast_to(jnp.arange(S)[None], (B, S))

      def step(params, cache, tok):
        logits, cache = model(params, tok,
                              positions=jnp.full((B, 1), 7, jnp.int32),
                              cache=cache, cache_index=7,
                              kv_positions=kv_pos)
        return jnp.argmax(logits[:, 0], -1), cache

      compiled = jax.jit(step).lower(
          params, cache, jnp.ones((B, 1), jnp.int32)).compile()
      stats[mode] = compiled.memory_analysis()
  cache_bytes = 2 * 2 * B * 8 * 32 * S * 4  # k+v, 2 layers, f32
  plain, sp = stats["plain"], stats["serve_sp"]
  # plain decode replicates the whole cache per device
  assert plain.argument_size_in_bytes > cache_bytes
  # serve_sp shards it 4 ways: per-device args shrink by ~the cache cut
  assert sp.argument_size_in_bytes < plain.argument_size_in_bytes - \
      0.6 * cache_bytes, (sp.argument_size_in_bytes,
                          plain.argument_size_in_bytes)
  assert sp.output_size_in_bytes < 0.6 * plain.output_size_in_bytes
