"""Minimal functional module system.

Modules are plain Python objects built eagerly in constructors:
  * `init(key) -> params` returns a nested dict pytree,
  * `apply(params, *args) / __call__(params, *args)` is a pure function of params.

Mutable collections (BatchNorm running statistics) never hide inside objects:
in training mode a layer computes its new statistics and *records* them into a
trace-time collector keyed by the layer's name-scope path; the caller drains
the collector with `run_and_collect_state` and merges updates back into the
params tree with `apply_state_updates`. Everything stays a pure pytree, which
is what makes GSPMD sharding, optax masking, EMA, and orbax checkpointing
trivial. (Design precedent: hero's SimplyModule init/apply pattern,
ref: hero/model_lib.py:169-195; state handling is our own.)
"""

from __future__ import annotations

import contextlib
import zlib
from typing import Any, Callable

import jax

# Leaf names that hold non-trainable batch statistics.
_BATCH_STAT_NAMES = ("moving_mean", "moving_variance")

# ---------------------------------------------------------------------------
# Trace-time name scoping. Python-level only: scopes resolve during tracing,
# so they are free at runtime and jit-safe.
# ---------------------------------------------------------------------------
_SCOPE_STACK: list[str] = []


@contextlib.contextmanager
def scope(name: str):
  _SCOPE_STACK.append(name)
  try:
    yield
  finally:
    _SCOPE_STACK.pop()


def current_path() -> tuple[str, ...]:
  return tuple(_SCOPE_STACK)


# ---------------------------------------------------------------------------
# State update collector.
# ---------------------------------------------------------------------------
_COLLECTOR: list[dict] = []  # stack of {path_tuple: value}


def record_state(leaf_name: str, value) -> None:
  """Record a new value for `current_path() + (leaf_name,)` if collecting."""
  if _COLLECTOR:
    _COLLECTOR[-1][current_path() + (leaf_name,)] = value


def record_state_abs(path: tuple, value) -> None:
  """Record a new value at an absolute path (re-emitting updates that were
  captured inside a jax.checkpoint region and returned as outputs, so the
  collector never sees remat-internal tracers)."""
  if _COLLECTOR:
    _COLLECTOR[-1][path] = value


def run_and_collect_state(fn: Callable, *args, **kwargs):
  """Run `fn`, returning (output, {path: new_value}) for all recorded state."""
  _COLLECTOR.append({})
  try:
    out = fn(*args, **kwargs)
    return out, _COLLECTOR[-1]
  finally:
    _COLLECTOR.pop()


def apply_state_updates(params: dict, updates: dict) -> dict:
  """Return a copy of `params` with `{path_tuple: value}` updates applied."""
  if not updates:
    return params

  def _set(tree: dict, path: tuple, value):
    tree = dict(tree)
    head = path[0]
    if len(path) == 1:
      tree[head] = value
    else:
      tree[head] = _set(tree[head], path[1:], value)
    return tree

  for path, value in updates.items():
    params = _set(params, path, value)
  return params


# ---------------------------------------------------------------------------
# Trace-time RNG provider: stochastic layers (dropout, drop-connect, device
# augmentation) draw keys derived from the active base key folded with a hash
# of their name-scope path — deterministic, jit-safe, no rng threading.
# ---------------------------------------------------------------------------
_RNG_STACK: list = []


@contextlib.contextmanager
def rng_scope(key):
  _RNG_STACK.append(key)
  try:
    yield
  finally:
    _RNG_STACK.pop()


def has_rng() -> bool:
  return bool(_RNG_STACK)


def make_rng(salt: str = ""):
  if not _RNG_STACK:
    raise RuntimeError(
        "No rng_scope active; wrap training apply in `with nn.rng_scope(key):`")
  tag = "/".join(_SCOPE_STACK) + "#" + salt
  return jax.random.fold_in(_RNG_STACK[-1], zlib.crc32(tag.encode()))


# ---------------------------------------------------------------------------
# Trainability helpers.
# ---------------------------------------------------------------------------
def is_batch_stat(path: tuple, _leaf=None) -> bool:
  return bool(path) and str(path[-1]) in _BATCH_STAT_NAMES


def trainable_mask(params) -> Any:
  """Pytree of bools: True where the leaf is a trainable parameter."""
  flat = jax.tree_util.tree_flatten_with_path(params)[0]
  treedef = jax.tree_util.tree_structure(params)
  mask = [
      not is_batch_stat(tuple(_key_str(k) for k in path))
      for path, _ in flat
  ]
  return jax.tree_util.tree_unflatten(treedef, mask)


def _key_str(k) -> str:
  # DictKey(key='x') -> 'x'; SequenceKey(idx=i) -> str(i)
  return str(getattr(k, "key", getattr(k, "idx", k)))


def split_key(key, n: int):
  return jax.random.split(key, n)


# ---------------------------------------------------------------------------
# Module base class.
# ---------------------------------------------------------------------------
class Module:
  """Base: subclasses define `init(key)` and `apply(params, *args, **kw)`.

  `__call__` wraps `apply` in `scope(self.name)` so nested state recording
  resolves to the right path. By convention a parent stores a child's params
  under `params[child.name]` and invokes `child(params[child.name], ...)`.
  """

  def __init__(self, name: str):
    self.name = name

  def init(self, key) -> dict:
    raise NotImplementedError

  def apply(self, params, *args, **kwargs):
    raise NotImplementedError

  def __call__(self, params, *args, **kwargs):
    with scope(self.name):
      return self.apply(params, *args, **kwargs)

  def init_child(self, key, children: list["Module"]) -> dict:
    """Init a list of children with independent keys, keyed by child name."""
    keys = jax.random.split(key, max(len(children), 1))
    return {c.name: c.init(k) for c, k in zip(children, keys)}
