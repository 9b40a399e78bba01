"""Speculative decoding: exactness vs greedy decode, acceptance accounting,
EOS semantics, and the sampling-mode rejection scheme.

The load-bearing property (Leviathan et al. 2023): with temperature=0 the
output must be TOKEN-EXACT vs plain greedy decoding on the target model no
matter how bad the draft model is — speculation may only change speed.
"""
import jax
import jax.numpy as jnp
import numpy as np

from automl_tpu.config import Config
from automl_tpu.models import lm as lm_lib
from automl_tpu.models.speculative import speculative_generate


def _tiny_lm(n_layers, seed, **over):
  cfg = lm_lib.lm_defaults()
  cfg.override(dict(vocab_size=61, model_dim=32, n_layers=n_layers,
                    n_heads=4, n_kv_heads=4, head_dim=8, expand_factor=2,
                    seq_len=64, use_scan=False, use_flash_attention=False,
                    activation_dtype="float32", **over), allow_new_keys=True)
  model = lm_lib.TransformerLM(cfg, lm_lib.ShardingConfig.data_parallel())
  params = model.init(jax.random.key(seed))
  return model, params


def test_speculative_greedy_exact_with_mismatched_draft():
  """A *different* (random, smaller) draft model: low acceptance, but the
  greedy output must equal greedy_generate token-for-token."""
  target, tparams = _tiny_lm(3, seed=0)
  draft, dparams = _tiny_lm(1, seed=7)
  prompt = jnp.asarray(np.random.RandomState(0).randint(1, 61, (2, 6)),
                       jnp.int32)
  want = greedy = lm_lib.greedy_generate(target, tparams, prompt,
                                         max_new_tokens=15)
  got, stats = speculative_generate(target, tparams, draft, dparams, prompt,
                                    max_new_tokens=15, n_draft=3,
                                    return_stats=True)
  np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
  assert int(stats["emitted"]) >= 15
  # mismatched random draft: some drafts must get rejected
  assert float(stats["accept_rate"]) < 1.0


def test_speculative_greedy_all_accept_when_draft_is_target():
  """Draft == target: every draft verifies, so each iteration advances
  n_draft+1 tokens and the loop runs ceil(new/(k+1)) times."""
  target, tparams = _tiny_lm(2, seed=1)
  prompt = jnp.asarray([[5, 9, 2, 17, 30]], jnp.int32)
  new, k = 12, 3
  want = lm_lib.greedy_generate(target, tparams, prompt, max_new_tokens=new)
  got, stats = speculative_generate(target, tparams, target, tparams, prompt,
                                    max_new_tokens=new, n_draft=k,
                                    return_stats=True)
  np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
  assert int(stats["iterations"]) == -(-new // (k + 1))  # ceil
  assert float(stats["accept_rate"]) == 1.0


def test_speculative_greedy_eos_matches_greedy():
  """Pick an eos_id the model actually emits mid-stream; both decoders must
  stop/pad identically."""
  target, tparams = _tiny_lm(2, seed=3)
  draft, dparams = _tiny_lm(1, seed=4)
  prompt = jnp.asarray([[3, 1, 4, 1, 5]], jnp.int32)
  base = np.asarray(lm_lib.greedy_generate(target, tparams, prompt,
                                           max_new_tokens=12))
  eos = int(base[0, prompt.shape[1] + 4])  # 5th generated token
  want = lm_lib.greedy_generate(target, tparams, prompt, max_new_tokens=12,
                                eos_id=eos)
  got = speculative_generate(target, tparams, draft, dparams, prompt,
                             max_new_tokens=12, n_draft=4, eos_id=eos)
  np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_speculative_sampling_mode_valid_and_all_accept_self_draft():
  """temperature > 0: rejection sampling. With draft == target the accept
  ratio p/q is 1, so every draft is accepted; tokens stay in-vocab."""
  target, tparams = _tiny_lm(2, seed=5)
  prompt = jnp.asarray(np.random.RandomState(1).randint(1, 61, (2, 5)),
                       jnp.int32)
  got, stats = speculative_generate(
      target, tparams, target, tparams, prompt, max_new_tokens=10,
      n_draft=3, temperature=0.8, top_k=20, rng=jax.random.key(2),
      return_stats=True)
  arr = np.asarray(got)
  assert arr.shape == (2, 15)
  assert (arr >= 0).all() and (arr < 61).all()
  assert float(stats["accept_rate"]) == 1.0
  # and with a mismatched draft the scheme still emits the full length
  draft, dparams = _tiny_lm(1, seed=6)
  got2 = speculative_generate(target, tparams, draft, dparams, prompt,
                              max_new_tokens=10, n_draft=3, temperature=0.8,
                              rng=jax.random.key(3))
  arr2 = np.asarray(got2)
  assert arr2.shape == (2, 15)
  assert (arr2 >= 0).all() and (arr2 < 61).all()
  np.testing.assert_array_equal(arr2[:, :5], np.asarray(prompt))


def test_speculative_under_sharded_serving_modes():
  """Speculative decoding composes with serve_tp and serve_sp: the
  target model verifies T>1 chunks through the sharded decode kernels,
  token-exact vs the unsharded speculative run (greedy)."""
  import numpy as np
  from automl_tpu import nn
  from automl_tpu.models import lm as lm_lib
  from automl_tpu.models.speculative import speculative_generate
  from automl_tpu.parallel import create_mesh

  nn.set_policy("float32")
  ov = dict(model_dim=64, n_layers=2, n_heads=8, n_kv_heads=4, head_dim=16,
            vocab_size=97, seq_len=64, activation_dtype="float32",
            use_flash_attention=False)
  tcfg = lm_lib.lm_defaults(); tcfg.update(ov)
  dcfg = lm_lib.lm_defaults()
  dcfg.update(dict(ov, model_dim=32, n_layers=1, n_heads=4, n_kv_heads=4,
                   head_dim=8))
  target = lm_lib.TransformerLM(tcfg)
  draft = lm_lib.TransformerLM(dcfg, lm_lib.ShardingConfig.data_parallel())
  tp_params = jax.jit(target.init)(jax.random.key(0))
  dp_params = jax.jit(draft.init)(jax.random.key(1))
  prompt = jnp.asarray([[5, 9, 23, 2]], jnp.int32)

  ref = speculative_generate(target, tp_params, draft, dp_params, prompt,
                             10, n_draft=3)
  for mode in ("serve_tp", "serve_sp"):
    cfg = lm_lib.lm_defaults()
    cfg.update(dict(ov, **{mode: True}))
    sharded = lm_lib.TransformerLM(cfg)
    with jax.set_mesh(create_mesh((1, 2, 4))):
      out = speculative_generate(sharded, tp_params, draft, dp_params,
                                 prompt, 10, n_draft=3)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref),
                                  err_msg=mode)
