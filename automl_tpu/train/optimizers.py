"""Optimizers: SGD / momentum / RMSProp / Adam / Lion, built on optax, with
trainability masking (BN moving stats frozen) and EMA of parameters.

Parity refs:
  build_optimizer table      efficientnetv2/utils.py:146-170 (rmsprop: rho 0.9,
                             momentum 0.9, eps 1e-3), efficientdet/det_model_fn.py:380-388
  Lion update rule           lion/lion_optax.py:33-112 (sign((1-b1)*g + b1*m);
                             m <- (1-b2)*g + b2*m; decoupled weight decay) —
                             reimplemented here against the published algorithm
  EMA semantics              tf.train.ExponentialMovingAverage with num_updates:
                             decay_t = min(decay, (1+t)/(10+t))
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from automl_tpu import nn


# ---------------------------------------------------------------------------
# Lion.
# ---------------------------------------------------------------------------


class ScaleByLionState(NamedTuple):
  momentum: Any


def scale_by_lion(b1: float = 0.9, b2: float = 0.99,
                  mu_dtype=None) -> optax.GradientTransformation:
  """Lion: interpolate grad & momentum, take the sign; EMA the momentum."""

  def init_fn(params):
    mu = jax.tree_util.tree_map(
        lambda p: jnp.zeros_like(p, dtype=mu_dtype or p.dtype), params)
    return ScaleByLionState(momentum=mu)

  def update_fn(updates, state, params=None):
    del params
    mu = state.momentum
    out = jax.tree_util.tree_map(
        lambda g, m: jnp.sign((1.0 - b1) * g + b1 * m), updates, mu)
    new_mu = jax.tree_util.tree_map(
        lambda g, m: ((1.0 - b2) * g + b2 * m).astype(mu_dtype or m.dtype),
        updates, mu)
    return out, ScaleByLionState(momentum=new_mu)

  return optax.GradientTransformation(init_fn, update_fn)


def lion(learning_rate, b1: float = 0.9, b2: float = 0.99,
         mu_dtype=None, weight_decay: float = 0.0,
         mask=None) -> optax.GradientTransformation:
  return optax.chain(
      scale_by_lion(b1, b2, mu_dtype),
      optax.add_decayed_weights(weight_decay, mask),
      optax.scale_by_learning_rate(learning_rate),
  )


# ---------------------------------------------------------------------------
# Builder.
# ---------------------------------------------------------------------------


def build_optimizer(name: str, learning_rate, *, momentum: float = 0.9,
                    rmsprop_rho: float = 0.9, rmsprop_eps: float = 1e-3,
                    beta1: float = 0.9, beta2: float = 0.999,
                    weight_decay: float = 0.0,
                    weight_decay_mask=None) -> optax.GradientTransformation:
  """Name -> optax transformation (learning_rate may be a schedule fn)."""
  name = (name or "sgd").lower()
  if name == "sgd":
    tx = optax.sgd(learning_rate)
  elif name == "momentum":
    tx = optax.sgd(learning_rate, momentum=momentum)
  elif name == "rmsprop":
    tx = optax.rmsprop(learning_rate, decay=rmsprop_rho, eps=rmsprop_eps,
                       momentum=momentum)
  elif name == "adam":
    tx = optax.adam(learning_rate, b1=beta1, b2=beta2)
  elif name == "adamw":
    tx = optax.adamw(learning_rate, b1=beta1, b2=beta2,
                     weight_decay=weight_decay, mask=weight_decay_mask)
  elif name == "lion":
    tx = lion(learning_rate, weight_decay=weight_decay,
              mask=weight_decay_mask)
  else:
    raise ValueError(f"Unknown optimizer {name!r}")
  return tx


def masked_for_params(tx: optax.GradientTransformation,
                      params) -> optax.GradientTransformation:
  """Freeze non-trainable leaves (BN moving statistics)."""
  mask = nn.trainable_mask(params)
  return optax.masked(tx, mask)


# ---------------------------------------------------------------------------
# Gradient clipping (per-variable + global, detection-style).
# ---------------------------------------------------------------------------


def clip_gradients(grads, clip_norm: float | None,
                   per_var: bool = True):
  """Per-variable clip-by-norm then global clip (ref: det_model_fn.py:396-414)."""
  if not clip_norm:
    return grads
  if per_var:
    def _clip(g):
      norm = jnp.sqrt(jnp.sum(jnp.square(g.astype(jnp.float32))))
      scale = jnp.minimum(1.0, clip_norm / jnp.maximum(norm, 1e-12))
      return (g * scale).astype(g.dtype)
    grads = jax.tree_util.tree_map(_clip, grads)
  gnorm = optax.global_norm(grads)
  scale = jnp.minimum(1.0, clip_norm / jnp.maximum(gnorm, 1e-12))
  return jax.tree_util.tree_map(lambda g: (g * scale).astype(g.dtype), grads)


# ---------------------------------------------------------------------------
# EMA of parameters.
# ---------------------------------------------------------------------------


def ema_init(params):
  return jax.tree_util.tree_map(lambda p: p, params)


def ema_update(ema_params, params, decay: float, step=None):
  """TF ExponentialMovingAverage: decay_t = min(decay, (1+t)/(10+t))."""
  if step is not None:
    t = jnp.asarray(step, jnp.float32)
    decay = jnp.minimum(decay, (1.0 + t) / (10.0 + t))
  return jax.tree_util.tree_map(
      lambda e, p: e - (1.0 - decay) * (e - p.astype(e.dtype)), ema_params,
      params)
