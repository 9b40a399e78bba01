"""Quantization-aware training: fake-quant with straight-through gradients.

Capability parity with the reference's tfmot hook (efficientdet/tf2/tfmot.py:23
annotates Keras layers so train-time forward passes simulate int8). The
TPU-native formulation is a process-global QAT mode consulted by Conv2D /
DepthwiseConv2D / Dense at apply time: weights are fake-quantized per output
channel and layer outputs per tensor, all inside the jitted step — no graph
rewriting. Gradients pass straight through (identity STE), so the same train
step function trains float or QAT depending on the mode.

Scales are dynamic (abs-max of the current values), matching the calibration
semantics of the PTQ path in inference/driver.py:148-197; exporting a
QAT-trained checkpoint through that INT8 path closes the loop.

CAVEAT — trace-time state: the QAT mode is consulted while a function is
being *traced*, and it is NOT part of any jit cache key. Set the mode (via
enable_qat/disable_qat or qat_scope) BEFORE the first call of any jitted
function whose behavior should depend on it; toggling afterwards silently
keeps the already-compiled behavior. The training runners set the mode both
ways (enable or disable) at entry so state never leaks between runs in one
process; prefer `qat_scope` for ad-hoc traces.
"""

from __future__ import annotations

import contextlib
from typing import Optional

import jax
import jax.numpy as jnp

_QAT = {"enabled": False, "bits": 8}


def enable_qat(bits: int = 8) -> None:
  _QAT["enabled"] = True
  _QAT["bits"] = bits


def disable_qat() -> None:
  _QAT["enabled"] = False


def qat_enabled() -> bool:
  return _QAT["enabled"]


def qat_bits() -> int:
  return _QAT["bits"]


@contextlib.contextmanager
def qat_scope(bits: int = 8):
  """Enable QAT for the enclosed trace (use around jit-traced model calls)."""
  prev = dict(_QAT)
  enable_qat(bits)
  try:
    yield
  finally:
    _QAT.update(prev)


def fake_quant(x, bits: int = 8, axis: Optional[int] = None):
  """Symmetric fake quantization with a straight-through gradient.

  axis=None -> per-tensor scale; axis=i -> per-slice scales along dim i
  (use the output-channel dim for conv/dense kernels). Zero-range inputs
  pass through unchanged.
  """
  dtype = x.dtype
  xf = x.astype(jnp.float32)
  qmax = float(2 ** (bits - 1) - 1)  # e.g. 127 for int8
  if axis is None:
    amax = jnp.max(jnp.abs(xf))
  else:
    axis = axis % xf.ndim
    reduce_dims = tuple(d for d in range(xf.ndim) if d != axis)
    amax = jnp.max(jnp.abs(xf), axis=reduce_dims, keepdims=True)
  scale = jnp.where(amax > 0, amax / qmax, 1.0)
  q = jnp.round(xf / scale)
  q = jnp.clip(q, -qmax, qmax) * scale
  q = jnp.where(amax > 0, q, xf)
  # straight-through estimator: forward = q, backward = identity
  out = xf + jax.lax.stop_gradient(q - xf)
  return out.astype(dtype)


def maybe_quant_kernel(kernel):
  """Fake-quant a conv/dense kernel per output channel when QAT is on."""
  if not qat_enabled():
    return kernel
  return fake_quant(kernel, qat_bits(), axis=-1)


def maybe_quant_activation(x):
  """Fake-quant a layer output per tensor when QAT is on."""
  if not qat_enabled():
    return x
  return fake_quant(x, qat_bits(), axis=None)
