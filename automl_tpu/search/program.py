"""Symbolic-program search space for optimizer discovery.

Capability parity with the reference's `hero` search space (hero/core.py:
Program parse/execute/mutate/hash + abstract execution; hero/fn_lib.py:
whitelisted math ops) — the machinery that discovered the Lion optimizer.
Designed fresh on Python's `ast` module instead of a hand-rolled parser:

  * A Program is a straight-line sequence of assignments over a namespace,
    ending in a `return <expr>`; inputs are named formals (w, g, m, lr, ...).
  * Execution walks the AST with a whitelisted function registry — every op is
    a jnp/pytree function, so a program traces into XLA like any JAX code.
  * Abstract execution (jax.eval_shape) validates a mutant without FLOPs.
  * Mutations: perturb a constant, swap a function, swap an argument,
    insert/delete a statement. Hashing is over the canonical AST dump.
  * program_to_optimizer() wraps (g, m, w, lr) -> (update, new_m) programs as
    an optax GradientTransformation; LION_PROGRAM below reproduces Lion.
"""

from __future__ import annotations

import ast
import copy
import hashlib
import random
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax


# ---------------------------------------------------------------------------
# Function registry (fn_lib equivalent). All ops act leaf-wise on pytrees.
# ---------------------------------------------------------------------------


def _tree_unary(fn):
  return lambda x: jax.tree_util.tree_map(fn, x)


def _tree_binary(fn):
  def apply(a, b):
    if jax.tree_util.tree_structure(a) == jax.tree_util.tree_structure(b):
      return jax.tree_util.tree_map(fn, a, b)
    # scalar broadcast
    return jax.tree_util.tree_map(lambda x: fn(x, b), a)
  return apply


def _interpolate(a, b, t):
  """(1 - t) * a + t * b (hero/fn_lib.py interpolate)."""
  return jax.tree_util.tree_map(lambda x, y: (1.0 - t) * x + t * y, a, b)


def _global_norm(x):
  return optax.global_norm(x)


def _dot(a, b):
  leaves = jax.tree_util.tree_map(lambda x, y: jnp.sum(x * y), a, b)
  return sum(jax.tree_util.tree_leaves(leaves))


def _cosine_sim(a, b):
  return _dot(a, b) / (jnp.maximum(_global_norm(a) * _global_norm(b), 1e-12))


def _clip_by_global_norm(x, max_norm):
  norm = _global_norm(x)
  scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
  return jax.tree_util.tree_map(lambda v: v * scale, x)


class FunctionRegistry(dict):
  """name -> callable; arity recorded for mutation proposals."""

  def register(self, name: str, fn: Callable, arity: int):
    self[name] = (fn, arity)
    return fn


def _nonneg(fn):
  """Domain guard: apply to |x| (ref: fn_lib.py nonneg)."""
  return lambda x: fn(jnp.abs(x))


def default_registry() -> FunctionRegistry:
  """The whitelisted math table — full coverage of hero/fn_lib.py:54-138
  (trig/hyperbolic families, exp/log families, powers, tree reductions),
  with domain guards so mutants can't produce NaN out of range."""
  r = FunctionRegistry()
  unary = {
      "sign": jnp.sign,
      "abs": jnp.abs,
      "neg": lambda x: -x,
      "negative": lambda x: -x,
      "square": jnp.square,
      "sqrt": _nonneg(jnp.sqrt),
      "cube": lambda x: x * x * x,
      "cbrt": jnp.cbrt,
      "reciprocal": lambda x: 1.0 / (x + jnp.sign(x) * 1e-12 + (x == 0) * 1e-12),
      "cos": jnp.cos, "sin": jnp.sin, "tan": jnp.tan,
      "arcsin": lambda x: jnp.arcsin(jnp.clip(x, -1.0, 1.0)),
      "arccos": lambda x: jnp.arccos(jnp.clip(x, -1.0, 1.0)),
      "arctan": jnp.arctan,
      "sinh": lambda x: jnp.sinh(jnp.clip(x, -30, 30)),
      "cosh": lambda x: jnp.cosh(jnp.clip(x, -30, 30)),
      "tanh": jnp.tanh,
      "arcsinh": jnp.arcsinh,
      "arccosh": lambda x: jnp.arccosh(jnp.abs(x) + 1.0),
      "arctanh": lambda x: jnp.arctanh(jnp.clip(x, -1 + 1e-7, 1 - 1e-7)),
      "exp": lambda x: jnp.exp(jnp.clip(x, -30, 30)),
      "exp2": lambda x: jnp.exp2(jnp.clip(x, -30, 30)),
      "exp10": lambda x: jnp.power(10.0, jnp.clip(x, -15, 15)),
      "expm1": lambda x: jnp.expm1(jnp.clip(x, -30, 30)),
      "log": _nonneg(lambda x: jnp.log(x + 1e-12)),
      "log2": _nonneg(lambda x: jnp.log2(x + 1e-12)),
      "log10": _nonneg(lambda x: jnp.log10(x + 1e-12)),
      "log1p": lambda x: jnp.log(jnp.abs(1.0 + x) + 1e-12),
  }
  for name, fn in unary.items():
    r.register(name, _tree_unary(fn), 1)
  for name, fn in [
      ("add", jnp.add), ("sub", jnp.subtract), ("mul", jnp.multiply),
      ("div", lambda a, b: a / (b + jnp.sign(b) * 1e-12 + (b == 0) * 1e-12)),
      ("max", jnp.maximum), ("min", jnp.minimum),
      ("power", lambda a, b: jnp.power(jnp.abs(a) + 1e-12, jnp.clip(b, -8, 8))),
  ]:
    r.register(name, _tree_binary(fn), 2)
  # no-arg constants (ref: fn_lib.py noarg_fn_dict)
  r.register("get_pi", lambda: jnp.pi, 0)
  r.register("get_e", lambda: jnp.e, 0)
  r.register("get_eps", lambda: 1e-8, 0)
  r.register("interpolate", _interpolate, 3)
  r.register("global_norm", _global_norm, 1)
  r.register("dot", _dot, 2)
  r.register("cosine_sim", _cosine_sim, 2)
  r.register("clip_by_global_norm", _clip_by_global_norm, 2)
  return r


# ---------------------------------------------------------------------------
# Program.
# ---------------------------------------------------------------------------


class Program:
  """Straight-line program: assignments then `return expr [, expr ...]`.

  Example (Lion):
    u = interpolate(m, g, 0.1)
    update = sign(u)
    m_new = interpolate(m, g, 0.01)
    return update, m_new
  """

  def __init__(self, source: str, inputs: tuple[str, ...],
               registry: FunctionRegistry | None = None):
    self.source = source.strip()
    self.inputs = tuple(inputs)
    self.registry = registry or default_registry()
    self.body = self._parse(self.source)

  # -- parse / validate ----------------------------------------------------
  def _parse(self, source: str) -> list[ast.stmt]:
    tree = ast.parse(source)
    body = tree.body
    if not body or not isinstance(body[-1], ast.Return):
      raise ValueError("program must end with `return ...`")
    for stmt in body[:-1]:
      if not (isinstance(stmt, ast.Assign) and len(stmt.targets) == 1
              and isinstance(stmt.targets[0], ast.Name)):
        raise ValueError(f"only single-target assignments allowed: "
                         f"{ast.dump(stmt)}")
    return body

  # -- execution -------------------------------------------------------------
  def _eval_expr(self, node: ast.expr, env: dict) -> Any:
    if isinstance(node, ast.Name):
      if node.id not in env:
        raise NameError(f"undefined variable {node.id!r}")
      return env[node.id]
    if isinstance(node, ast.Constant):
      return node.value
    if isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.USub):
      return -self._eval_expr(node.operand, env)
    if isinstance(node, ast.Call):
      if not isinstance(node.func, ast.Name) or node.func.id not in self.registry:
        raise NameError(f"function not in registry: {ast.dump(node.func)}")
      fn, arity = self.registry[node.func.id]
      args = [self._eval_expr(a, env) for a in node.args]
      if len(args) != arity:
        raise TypeError(f"{node.func.id} expects {arity} args, got {len(args)}")
      return fn(*args)
    if isinstance(node, ast.Tuple):
      return tuple(self._eval_expr(e, env) for e in node.elts)
    raise ValueError(f"unsupported expression: {ast.dump(node)}")

  def execute(self, **kwargs) -> Any:
    env = dict(kwargs)
    missing = set(self.inputs) - set(env)
    if missing:
      raise TypeError(f"missing inputs: {sorted(missing)}")
    for stmt in self.body[:-1]:
      env[stmt.targets[0].id] = self._eval_expr(stmt.value, env)
    return self._eval_expr(self.body[-1].value, env)

  def abstract_execute(self, **kwargs):
    """Validate shapes/dtypes without compute (hero's abstract execution)."""
    names = sorted(kwargs)
    return jax.eval_shape(
        lambda *vals: self.execute(**dict(zip(names, vals))),
        *[kwargs[n] for n in names])

  # -- identity ----------------------------------------------------------------
  def canonical(self) -> str:
    return ast.dump(ast.Module(body=self.body, type_ignores=[]))

  def hash(self) -> str:
    return hashlib.sha256(self.canonical().encode()).hexdigest()[:16]

  def functional_hash(self) -> str:
    """Hash over ABSTRACT VALUES, not syntax (ref: hero/core.py:360
    compute_hash executing against a HashTracker namespace): the program is
    executed symbolically — each input is a fixed token, every call produces
    hash(fn_name, arg_tokens) — and the hash is taken over the RETURN
    value's tokens only. Renamed variables, reordered independent
    statements, and dead assignments therefore hash identically; any change
    that affects the computed function (including constants) does not."""
    def sym(node: ast.expr, env: dict) -> str:
      if isinstance(node, ast.Name):
        if node.id not in env:
          raise NameError(node.id)
        return env[node.id]
      if isinstance(node, ast.Constant):
        return f"const:{node.value!r}"
      if isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.USub):
        # hash exactly as a call to `neg` so `-x` and `neg(x)` dedup
        return hashlib.sha256(
            f"neg({sym(node.operand, env)})".encode()).hexdigest()[:24]
      if isinstance(node, ast.Call):
        args = ",".join(sym(a, env) for a in node.args)
        return hashlib.sha256(
            f"{node.func.id}({args})".encode()).hexdigest()[:24]
      if isinstance(node, ast.Tuple):
        return "(" + ",".join(sym(e, env) for e in node.elts) + ")"
      raise ValueError(ast.dump(node))

    env = {name: f"input:{name}" for name in self.inputs}
    for stmt in self.body[:-1]:
      env[stmt.targets[0].id] = sym(stmt.value, env)
    out = sym(self.body[-1].value, env)
    return hashlib.sha256(out.encode()).hexdigest()[:16]

  def collect_hparams(self) -> list[ast.Constant]:
    """The hard-coded numeric scalars (ref: hero/core.py collect_scalars)."""
    return [n for n in ast.walk(ast.Module(body=self.body, type_ignores=[]))
            if isinstance(n, ast.Constant)
            and isinstance(n.value, (int, float))
            and not isinstance(n.value, bool)]

  def hparam_tune(self, rng: random.Random) -> "Program":
    """Mutate ONE scalar constant, leaving the structure alone
    (hyperparameter-tuning mode, ref: hero/core.py:178-190)."""
    body = copy.deepcopy(self.body)
    consts = [n for n in ast.walk(ast.Module(body=body, type_ignores=[]))
              if isinstance(n, ast.Constant)
              and isinstance(n.value, (int, float))
              and not isinstance(n.value, bool)]
    if not consts:
      return Program(self.source, self.inputs, self.registry)
    node = rng.choice(consts)
    factor = rng.choice([0.1, 0.3, 0.5, 2.0, 3.0, 10.0, -1.0])
    node.value = float(node.value) * factor
    module = ast.Module(body=body, type_ignores=[])
    ast.fix_missing_locations(module)
    return Program(ast.unparse(module), self.inputs, self.registry)

  def __str__(self):
    return ast.unparse(ast.Module(body=self.body, type_ignores=[]))

  # -- mutation -----------------------------------------------------------------
  def _variables_before(self, idx: int) -> list[str]:
    names = list(self.inputs)
    for stmt in self.body[:idx]:
      if isinstance(stmt, ast.Assign):
        names.append(stmt.targets[0].id)
    return names

  def mutate(self, rng: random.Random) -> "Program":
    """Return a mutated copy (constant perturb / fn swap / arg swap /
    insert / delete)."""
    for _ in range(20):  # retry until a structurally valid mutant parses
      try:
        body = copy.deepcopy(self.body)
        op = rng.choice(["constant", "swap_fn", "swap_arg", "insert",
                         "delete"])
        if op == "constant":
          consts = [n for n in ast.walk(ast.Module(body=body, type_ignores=[]))
                    if isinstance(n, ast.Constant)
                    and isinstance(n.value, (int, float))]
          if not consts:
            continue
          node = rng.choice(consts)
          factor = rng.choice([0.1, 0.5, 2.0, 10.0, -1.0])
          node.value = float(node.value) * factor + rng.gauss(0, 1e-3)
        elif op == "swap_fn":
          calls = [n for stmt in body for n in ast.walk(stmt)
                   if isinstance(n, ast.Call)]
          if not calls:
            continue
          node = rng.choice(calls)
          arity = len(node.args)
          candidates = [name for name, (_, a) in self.registry.items()
                        if a == arity and name != node.func.id]
          if not candidates:
            continue
          node.func = ast.Name(id=rng.choice(candidates), ctx=ast.Load())
        elif op == "swap_arg":
          idx = rng.randrange(len(body))
          stmt = body[idx]
          names = [n for n in ast.walk(stmt) if isinstance(n, ast.Name)
                   and isinstance(n.ctx, ast.Load)
                   and n.id not in self.registry]
          if not names:
            continue
          node = rng.choice(names)
          node.id = rng.choice(self._variables_before(idx))
        elif op == "insert":
          idx = rng.randrange(len(body))  # before stmt idx
          vars_avail = self._variables_before(idx)
          fn_name = rng.choice(list(self.registry))
          _, arity = self.registry[fn_name]
          args = []
          for _ in range(arity):
            if rng.random() < 0.25:
              args.append(ast.Constant(value=round(rng.uniform(0, 1), 3)))
            else:
              args.append(ast.Name(id=rng.choice(vars_avail), ctx=ast.Load()))
          new_name = f"v{rng.randrange(10_000)}"
          body.insert(idx, ast.Assign(
              targets=[ast.Name(id=new_name, ctx=ast.Store())],
              value=ast.Call(func=ast.Name(id=fn_name, ctx=ast.Load()),
                             args=args, keywords=[])))
        elif op == "delete":
          if len(body) <= 2:
            continue
          idx = rng.randrange(len(body) - 1)
          deleted = body[idx].targets[0].id
          body.pop(idx)
          # references to the deleted var must rebind
          for later in body[idx:]:
            for n in ast.walk(later):
              if isinstance(n, ast.Name) and n.id == deleted \
                 and isinstance(n.ctx, ast.Load):
                n.id = rng.choice(self._variables_before(idx))
        module = ast.Module(body=body, type_ignores=[])
        ast.fix_missing_locations(module)
        return Program(ast.unparse(module), self.inputs, self.registry)
      except (ValueError, IndexError, SyntaxError):
        continue
    return Program(self.source, self.inputs, self.registry)


# ---------------------------------------------------------------------------
# Programs as optimizers.
# ---------------------------------------------------------------------------

# The Lion update expressed in the search space (the program the reference's
# search discovered; lion/README.md, lion_optax.py semantics).
LION_PROGRAM = """
u = interpolate(m, g, 0.1)
update = sign(u)
m_new = interpolate(m, g, 0.01)
return update, m_new
"""

# AdamW-style signless baseline (a typical search seed).
MOMENTUM_PROGRAM = """
m_new = interpolate(m, g, 0.1)
update = m_new
return update, m_new
"""


class ProgramOptState(NamedTuple):
  m: Any


def program_to_optimizer(program: Program,
                         learning_rate: float) -> optax.GradientTransformation:
  """Wrap a (g, m, w) -> (update, m_new) program as an optax transform."""

  def init_fn(params):
    return ProgramOptState(
        m=jax.tree_util.tree_map(jnp.zeros_like, params))

  def update_fn(grads, state, params=None):
    update, m_new = program.execute(g=grads, m=state.m, w=params)
    scaled = jax.tree_util.tree_map(lambda u: -learning_rate * u, update)
    return scaled, ProgramOptState(m=m_new)

  return optax.GradientTransformation(init_fn, update_fn)
