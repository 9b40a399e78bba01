"""Beam search vs a naive no-cache re-scoring oracle.

The oracle recomputes a FULL teacher-forced forward for every live beam
at every step (no KV cache, no reorder) and applies the same expansion /
freezing / top-k / length-normalization rules; the fast implementation
(models/beam.py: incremental cache + per-step row gather) must pick the
same tokens and scores.
"""

import jax
import jax.numpy as jnp
import numpy as np

from automl_tpu.models import lm as lm_lib
from automl_tpu.models.beam import beam_search_generate
from automl_tpu.models.lm import greedy_generate


def _f32_model():
  cfg = lm_lib.lm_defaults()
  cfg.update(dict(model_dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
                  head_dim=16, vocab_size=61, seq_len=64,
                  use_flash_attention=False, activation_dtype="float32"))
  model = lm_lib.TransformerLM(cfg, lm_lib.ShardingConfig.data_parallel())
  return cfg, model, jax.jit(model.init)(jax.random.key(0))


def _oracle_beam(model, params, prompt, max_new, k, length_penalty,
                 eos_id=None):
  """Naive beam search: full forward per beam per step."""
  def last_lp(seq):
    logits, _ = model(params, jnp.asarray([seq], jnp.int32))
    return np.asarray(
        jax.nn.log_softmax(logits[0, -1].astype(jnp.float32)))

  lp0 = last_lp(prompt)
  order = np.argsort(-lp0, kind="stable")[:k]
  beams = [{"seq": prompt + [int(t)], "score": float(lp0[t]),
            "done": eos_id is not None and int(t) == eos_id, "len": 1}
           for t in order]
  v = lp0.shape[0]
  for _ in range(max_new - 1):
    cand_scores = np.full((k, v), -1e30)
    for j, bm in enumerate(beams):
      if bm["done"]:
        cand_scores[j, 0] = bm["score"]        # single pad continuation
      else:
        cand_scores[j] = bm["score"] + last_lp(bm["seq"])
    flat = np.argsort(-cand_scores.reshape(-1), kind="stable")[:k]
    new = []
    for f in flat:
      j, t = int(f) // v, int(f) % v
      src = beams[j]
      done = src["done"]
      tok = 0 if done else t
      new.append({"seq": src["seq"] + [tok],
                  "score": float(cand_scores[j, t]),
                  "done": done or (eos_id is not None and tok == eos_id),
                  "len": src["len"] + (0 if done else 1)})
    beams = new
  norm = [bm["score"] / max(bm["len"], 1) ** length_penalty for bm in beams]
  best = int(np.argmax(norm))
  return beams[best]["seq"], norm[best]


def test_beam1_equals_greedy():
  cfg, model, params = _f32_model()
  prompt = jnp.asarray([[5, 9, 23]], jnp.int32)
  want = greedy_generate(model, params, prompt, 6)
  got, score = beam_search_generate(model, params, prompt, 6, num_beams=1)
  np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
  assert np.isfinite(float(score[0]))


def test_beam_matches_oracle():
  cfg, model, params = _f32_model()
  prompt = [5, 9, 23, 2]
  for k, lpen in ((3, 0.6), (4, 0.0)):
    got, score = beam_search_generate(
        model, params, jnp.asarray([prompt], jnp.int32), 5, num_beams=k,
        length_penalty=lpen)
    want_seq, want_score = _oracle_beam(model, params, prompt, 5, k, lpen)
    assert [int(t) for t in np.asarray(got)[0]] == want_seq, (k, lpen)
    np.testing.assert_allclose(float(score[0]), want_score, atol=1e-4)


def test_beam_eos_freezing_matches_oracle():
  """A beam that hits EOS freezes (pad continuation, fixed score) and the
  length-normalized pick matches the oracle."""
  cfg, model, params = _f32_model()
  base = greedy_generate(model, params, jnp.asarray([[5, 9, 23, 2]]), 8)
  eos = int(np.asarray(base)[0, 6])  # a token the model actually emits
  prompt = [5, 9, 23, 2]
  got, score = beam_search_generate(
      model, params, jnp.asarray([prompt], jnp.int32), 6, num_beams=3,
      length_penalty=0.6, eos_id=eos)
  want_seq, want_score = _oracle_beam(model, params, prompt, 6, 3, 0.6,
                                      eos_id=eos)
  assert [int(t) for t in np.asarray(got)[0]] == want_seq
  np.testing.assert_allclose(float(score[0]), want_score, atol=1e-4)


def test_beam_batched_two_rows():
  """Batched beam search equals per-row runs (cache reorder rows stay
  inside their batch block)."""
  cfg, model, params = _f32_model()
  p1, p2 = [5, 9, 23, 2], [7, 3, 1, 40]
  both, s_both = beam_search_generate(
      model, params, jnp.asarray([p1, p2], jnp.int32), 5, num_beams=3)
  for row, p in enumerate((p1, p2)):
    one, s_one = beam_search_generate(
        model, params, jnp.asarray([p], jnp.int32), 5, num_beams=3)
    np.testing.assert_array_equal(np.asarray(both)[row], np.asarray(one)[0])
    np.testing.assert_allclose(float(s_both[row]), float(s_one[0]),
                               atol=1e-5)


def test_beam_under_sharded_serving_modes():
  """Beam search composes with serve_tp (head-leading cache, beam gather
  on the batch dim) and serve_sp (S-sharded cache): same tokens and
  scores as the unsharded run."""
  from automl_tpu.parallel import create_mesh

  cfg, model, params = _f32_model()
  prompt = jnp.asarray([[5, 9, 23, 2]], jnp.int32)
  ref, ref_s = beam_search_generate(model, params, prompt, 5, num_beams=3)
  # serve_tp needs n_kv (2) divisible by the model axis -> model=2
  for mode, mesh_shape in (("serve_tp", (1, 4, 2)), ("serve_sp", (1, 2, 4))):
    c = lm_lib.lm_defaults()
    c.update(dict(model_dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
                  head_dim=16, vocab_size=61, seq_len=64,
                  use_flash_attention=False, activation_dtype="float32",
                  **{mode: True}))
    sharded = lm_lib.TransformerLM(c)
    with jax.set_mesh(create_mesh(mesh_shape)):
      got, got_s = beam_search_generate(sharded, params, prompt, 5,
                                        num_beams=3)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref),
                                  err_msg=mode)
    np.testing.assert_allclose(float(got_s[0]), float(ref_s[0]), atol=1e-5)
