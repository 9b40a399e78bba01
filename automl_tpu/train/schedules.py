"""Learning-rate schedules as pure step -> lr functions (jit-traceable).

Parity refs:
  classification: exponential(staircase)/cosine/linear/constant + warmup +
    minimal lr  (efficientnetv2/utils.py:78-143)
  detection: stepwise / cosine / polynomial with linear warmup from
    lr_warmup_init (efficientdet/det_model_fn.py:57-130)
"""

from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp


def warmup_lr(name: str, base_lr: float, *, steps_per_epoch: int | None = None,
              total_steps: int | None = None, warmup_epochs: float = 5,
              decay_epochs: float = 2.4, decay_factor: float = 0.97,
              minimal_lr: float = 0.0) -> Callable:
  """Classification schedule family (exponential/cosine/linear/constant)."""

  def fn(step):
    step = jnp.asarray(step, jnp.float32)
    if name == "exponential":
      assert steps_per_epoch is not None
      decay_steps = steps_per_epoch * decay_epochs
      lr = base_lr * decay_factor ** jnp.floor(step / decay_steps)
    elif name == "cosine":
      assert total_steps is not None
      lr = 0.5 * base_lr * (1 + jnp.cos(math.pi * step / total_steps))
    elif name == "linear":
      assert total_steps is not None
      lr = base_lr * jnp.maximum(1.0 - step / total_steps, 0.0)
    elif name == "constant":
      lr = jnp.asarray(base_lr, jnp.float32)
    else:
      raise ValueError(f"Unknown lr schedule {name!r}")
    if minimal_lr:
      lr = jnp.maximum(lr, minimal_lr)
    if warmup_epochs and steps_per_epoch:
      warmup_steps = warmup_epochs * steps_per_epoch
      warmup = base_lr * step / warmup_steps
      lr = jnp.where(step < warmup_steps, warmup, lr)
    return lr

  return fn


def lm_lr(name: str, base_lr: float, *, num_train_steps: int,
          warmup_steps: int = 1, end_decay: float = 0.1,
          decay_start: float | int | None = None,
          decay_steps: int | None = None,
          steps_after_decay: int | None = None) -> Callable:
  """LM schedule family: cosine_decay / constant with linear warmup.

  Semantics of hero/model_lib.py:1227-1283: steps are 1-based inside the
  schedule; cosine decays from `decay_start` (default = end of warmup;
  a float in (0, 1) means a fraction of num_train_steps) over `decay_steps`
  down to `end_decay * lr`; `steps_after_decay` instead pins the decay to
  finish that many steps before the end.
  """
  if decay_steps is not None and steps_after_decay is not None:
    raise ValueError("Cannot specify both decay_steps and steps_after_decay.")
  if isinstance(decay_start, float) and 0.0 < decay_start < 1.0:
    decay_start = int(num_train_steps * decay_start)
  if steps_after_decay is not None:
    decay_steps = num_train_steps - steps_after_decay
    decay_steps -= decay_start if decay_start is not None else warmup_steps
  if decay_start is None:
    decay_start = warmup_steps
  if decay_steps is None:
    decay_steps = max(num_train_steps - decay_start, 1)

  def fn(step):
    s = jnp.asarray(step, jnp.float32) + 1.0
    warmup_factor = jnp.minimum(s, warmup_steps) / warmup_steps
    if name == "constant":
      return base_lr * warmup_factor
    if name == "cosine_decay":
      progress = jnp.maximum(0.0, s - decay_start) / decay_steps
      decay = (1 + jnp.cos(jnp.minimum(progress, 1.0) * jnp.pi)) / 2
      return base_lr * warmup_factor * ((1 - end_decay) * decay + end_decay)
    raise ValueError(f"Unknown lm lr schedule {name!r}")

  return fn


def detection_lr(config, steps_per_epoch: int) -> Callable:
  """Detection schedule: warmup from lr_warmup_init then decay.

  (ref: det_model_fn.py:57-130; config keys learning_rate, lr_warmup_init,
   lr_warmup_epoch, num_epochs, lr_decay_method, first/second_lr_drop_epoch,
   poly_lr_power)
  """
  base_lr = config.learning_rate
  warmup_init = config.lr_warmup_init
  warmup_steps = int(config.lr_warmup_epoch * steps_per_epoch)
  total_steps = int(config.num_epochs * steps_per_epoch)
  method = config.lr_decay_method

  def fn(step):
    step = jnp.asarray(step, jnp.float32)
    if method == "cosine":
      decay_steps = max(total_steps - warmup_steps, 1)
      lr = 0.5 * base_lr * (
          1 + jnp.cos(math.pi * (step - warmup_steps) / decay_steps))
    elif method == "polynomial":
      decay_steps = max(total_steps - warmup_steps, 1)
      frac = jnp.clip((step - warmup_steps) / decay_steps, 0.0, 1.0)
      lr = base_lr * (1 - frac) ** config.poly_lr_power
    elif method == "stepwise":
      first = config.first_lr_drop_epoch * steps_per_epoch
      second = config.second_lr_drop_epoch * steps_per_epoch
      lr = jnp.where(step < first, base_lr,
                     jnp.where(step < second, base_lr * 0.1, base_lr * 0.01))
    elif method == "constant":
      lr = jnp.asarray(base_lr, jnp.float32)
    else:
      raise ValueError(f"Unknown lr_decay_method {method!r}")
    if warmup_steps:
      warmup = warmup_init + (base_lr - warmup_init) * step / warmup_steps
      lr = jnp.where(step < warmup_steps, warmup, lr)
    return lr

  return fn
