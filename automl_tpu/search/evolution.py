"""Regularized evolution over optimizer programs.

Capability parity with the reference's search driver pattern (hero/core.py
mutate/hparam_tune + the end-to-end 'learn a regression with a mutated
optimizer program' flow exercised in hero/core_test.py:838+).

Classic regularized evolution (Real et al.): keep a sliding population; each
cycle, sample a tournament, mutate the best member, evaluate, push, pop the
oldest. Deduplicates by program hash (functional-equivalence cache, cf.
hero/core.py Program.hash).
"""

from __future__ import annotations

import collections
import random
from typing import Callable

from automl_tpu.search.program import Program


def regularized_evolution(
    seed_program: Program,
    evaluate: Callable[[Program], float],
    cycles: int = 50,
    population_size: int = 20,
    tournament_size: int = 5,
    seed: int = 0,
    minimize: bool = True,
):
  """Returns (best_program, best_fitness, history)."""
  rng = random.Random(seed)
  sign = 1.0 if minimize else -1.0
  population = collections.deque()
  cache: dict[str, float] = {}

  def run(prog: Program) -> float:
    h = prog.hash()
    if h not in cache:
      try:
        cache[h] = float(evaluate(prog))
      except Exception:
        cache[h] = float("inf")
    return cache[h]

  best = seed_program
  best_fit = run(seed_program)
  population.append((seed_program, best_fit))
  history = [best_fit]

  for _ in range(cycles):
    sample = rng.sample(list(population),
                        min(tournament_size, len(population)))
    parent = min(sample, key=lambda pf: sign * pf[1])[0]
    child = parent.mutate(rng)
    fit = run(child)
    population.append((child, fit))
    if len(population) > population_size:
      population.popleft()
    if sign * fit < sign * best_fit:
      best, best_fit = child, fit
    history.append(best_fit)
  return best, best_fit, history
