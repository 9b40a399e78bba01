"""Program-search tests: parse/execute/mutate/hash, Lion-as-program
equivalence, abstract execution, end-to-end evolution on a regression task
(mirrors the reference's core_test.py end-to-end flow)."""

import random

import jax
import jax.numpy as jnp
import numpy as np

from automl_tpu.search import evolution
from automl_tpu.search.program import (
    LION_PROGRAM, MOMENTUM_PROGRAM, Program, program_to_optimizer)
from automl_tpu.train.optimizers import lion


def _lion_prog():
  return Program(LION_PROGRAM, inputs=("g", "m", "w"))


def test_program_execute():
  p = Program("s = add(a, b)\nreturn mul(s, 2.0)", inputs=("a", "b"))
  out = p.execute(a=jnp.asarray(3.0), b=jnp.asarray(4.0))
  assert float(out) == 14.0


def test_program_pytree_execution():
  p = _lion_prog()
  g = {"w": jnp.array([0.5, -0.1])}
  m = {"w": jnp.zeros(2)}
  update, m_new = p.execute(g=g, m=m, w=None)
  np.testing.assert_allclose(np.asarray(update["w"]), [1.0, -1.0])
  np.testing.assert_allclose(np.asarray(m_new["w"]), 0.01 * np.asarray(g["w"]),
                             rtol=1e-6)


def test_lion_program_matches_lion_optimizer():
  """The program-space Lion reproduces train/optimizers.lion step-for-step."""
  params = {"w": jnp.array([1.0, -2.0, 0.3])}
  tx_prog = program_to_optimizer(_lion_prog(), learning_rate=0.1)
  tx_ref = lion(learning_rate=0.1)
  sp, sr = tx_prog.init(params), tx_ref.init(params)
  for i in range(4):
    g = {"w": jnp.array([0.5, -0.1, 0.0]) * (i + 1)}
    up, sp = tx_prog.update(g, sp, params)
    ur, sr = tx_ref.update(g, sr, params)
    np.testing.assert_allclose(np.asarray(up["w"]), np.asarray(ur["w"]),
                               atol=1e-6)


def test_program_hash_and_mutation():
  p = _lion_prog()
  rng = random.Random(0)
  hashes = {p.hash()}
  changed = executable = 0
  for _ in range(12):
    m = p.mutate(rng)
    if m.hash() not in hashes:
      changed += 1
    hashes.add(m.hash())
    try:
      # some mutants are semantically invalid (evolution filters them)
      m.execute(g={"w": jnp.ones(2)}, m={"w": jnp.zeros(2)}, w=None)
      executable += 1
    except Exception:
      pass
  assert changed >= 6   # mutations usually produce new programs
  assert executable >= 6  # and most remain executable


def test_abstract_execution_validates_without_flops():
  p = _lion_prog()
  g = jax.ShapeDtypeStruct((128,), jnp.float32)
  out = p.abstract_execute(g=g, m=g, w=g)
  assert out[0].shape == (128,)


def test_rejects_unsafe_source():
  import pytest
  with pytest.raises(NameError):
    Program("x = __import__('os')\nreturn x", inputs=()).execute()
  with pytest.raises(ValueError):
    Program("return [i for i in range(3)]", inputs=()).execute()


def test_evolution_improves_regression():
  """Evolve an optimizer program to fit a linear regression faster —
  the reference's end-to-end search smoke (core_test.py:838+)."""
  key = jax.random.key(0)
  X = jax.random.normal(key, (64, 4))
  true_w = jnp.array([1.0, -2.0, 0.5, 3.0])
  y = X @ true_w

  def evaluate(prog):
    tx = program_to_optimizer(prog, learning_rate=0.05)
    w = jnp.zeros(4)
    state = tx.init(w)

    @jax.jit
    def step(w, state):
      loss, g = jax.value_and_grad(
          lambda w: jnp.mean((X @ w - y) ** 2))(w)
      up, state = tx.update(g, state, w)
      return w + up, state, loss

    loss = jnp.inf
    for _ in range(30):
      w, state, loss = step(w, state)
    return float(loss)

  seed = Program(MOMENTUM_PROGRAM, inputs=("g", "m", "w"))
  base_fit = evaluate(seed)
  best, best_fit, history = evolution.regularized_evolution(
      seed, evaluate, cycles=15, population_size=8, seed=1)
  assert best_fit <= base_fit
  assert np.isfinite(best_fit)
