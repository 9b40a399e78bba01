"""Mixed-precision policy: f32 params, bf16 compute on the MXU.

Matches the reference's `mixed_bfloat16` semantics (ref: efficientdet/utils.py:552-642):
activations/matmuls in bfloat16, parameters and normalization statistics in float32.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
  param_dtype: jnp.dtype = jnp.float32
  compute_dtype: jnp.dtype = jnp.bfloat16
  output_dtype: jnp.dtype = jnp.float32

  def cast_to_compute(self, x):
    return jnp.asarray(x, self.compute_dtype)

  def cast_to_output(self, x):
    return jnp.asarray(x, self.output_dtype)


DEFAULT_POLICY = Policy()
_F32 = Policy(jnp.float32, jnp.float32, jnp.float32)

_current = [DEFAULT_POLICY]


def get_policy() -> Policy:
  return _current[-1]


def set_policy(policy_or_name) -> Policy:
  """Set the global policy; accepts Policy or 'mixed_bfloat16'/'float32'."""
  if isinstance(policy_or_name, str):
    policy = {
        "mixed_bfloat16": DEFAULT_POLICY,
        "bfloat16": Policy(jnp.bfloat16, jnp.bfloat16, jnp.bfloat16),
        "float32": _F32,
    }[policy_or_name]
  else:
    policy = policy_or_name
  _current[-1] = policy
  return policy
