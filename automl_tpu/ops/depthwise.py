"""Pallas depthwise-conv backward (filter gradient) for TPU — opt-in.

Motivation: XLA computes the filter gradient of a depthwise conv as one
multiply-reduce fusion PER TAP — k*k separate passes over both the
activation and the incoming gradient. Profiled on-chip (round 3), the
EfficientDet-D0 train step spends ~9.5% of device time in exactly these
`multiply_reduce_fusion -> f32[k,k,1,C]` ops. This kernel reads each
X / dY image ONCE and accumulates all k*k taps from VMEM — a ~k^2
reduction in HBM traffic in isolation.

OUTCOME: measured whole-step it was a net LOSS (see the honest-negative
note at _ENABLED below and PERF_NOTES.md round 3), so it is disabled by
default; the kernel and its numerics tests remain for future retuning.

The forward pass and the input gradient stay on XLA (the forward conv is
MXU-friendly and dx is a regular transposed depthwise conv); only the
filter gradient is replaced, via jax.custom_vjp in `depthwise_conv`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _same_pads(size: int, k: int, stride: int) -> tuple[int, int]:
  """lax SAME padding (lo, hi) for one spatial dim."""
  out = -(-size // stride)  # ceil
  total = max((out - 1) * stride + k - size, 0)
  lo = total // 2
  return lo, total - lo


def _filter_grad_kernel(xp_ref, dy_ref, out_ref, *, k: int, stride: int,
                        h_out: int, w_out: int, h_chunk: int):
  b = pl.program_id(0)

  @pl.when(b == 0)
  def _init():
    out_ref[...] = jnp.zeros_like(out_ref)

  del stride  # stride-1 only (strided slices lower to unsupported gathers)

  # Taps are statically unrolled (static W offsets: Mosaic handles
  # constant unaligned sublane slices; DYNAMIC sublane offsets must be
  # 8-aligned and kw in [0,k) is not). VMEM control comes from chunking H
  # with a fori_loop — H is the untiled dim, so dynamic row offsets are
  # free, and the per-tap [h_chunk, Wo, C] product temps are reused across
  # chunks instead of coexisting (25 whole-image taps of a k5 block blew
  # the 16MB scoped-VMEM limit).
  def row_chunk(r, carry):
    row0 = r * h_chunk
    dy_c = dy_ref[0, pl.ds(row0, h_chunk), :, :].astype(jnp.float32)
    for kh in range(k):
      for kw in range(k):
        xs = xp_ref[0, pl.ds(row0 + kh, h_chunk), kw: kw + w_out, :]
        out_ref[kh, kw, :] += jnp.sum(xs.astype(jnp.float32) * dy_c,
                                      axis=(0, 1))
    return carry

  jax.lax.fori_loop(0, h_out // h_chunk, row_chunk, 0)


def depthwise_filter_grad(x, dy, k: int, stride: int,
                          interpret: bool = False):
  """d(loss)/d(kernel) for a SAME-padded depthwise conv.

  x: [B, H, W, C] conv input; dy: [B, Ho, Wo, C] output cotangent.
  Returns [k, k, 1, C] float32 (HWIO with I=1). stride must be 1 (the
  kernel's window slices are contiguous; see _use_pallas).
  """
  if stride != 1:
    raise NotImplementedError("Pallas depthwise filter grad: stride-1 only")
  b, h, w, c = x.shape
  _, h_out, w_out, _ = dy.shape
  (ph_lo, ph_hi) = _same_pads(h, k, stride)
  (pw_lo, pw_hi) = _same_pads(w, k, stride)
  xp = jnp.pad(x, ((0, 0), (ph_lo, ph_hi), (pw_lo, pw_hi), (0, 0)))
  hp, wp = xp.shape[1], xp.shape[2]
  # largest h_out divisor whose k^2 unrolled f32 tap temps stay ~<=6MB
  budget = 6 * 1024 * 1024 // max(k * k * w_out * c * 4, 1)
  h_chunk = max([d for d in range(1, h_out + 1)
                 if h_out % d == 0 and d <= max(budget, 1)] or [1])
  out = pl.pallas_call(
      functools.partial(_filter_grad_kernel, k=k, stride=stride,
                        h_out=h_out, w_out=w_out, h_chunk=h_chunk),
      grid=(b,),
      in_specs=[
          pl.BlockSpec((1, hp, wp, c), lambda i: (i, 0, 0, 0)),
          pl.BlockSpec((1, h_out, w_out, c), lambda i: (i, 0, 0, 0)),
      ],
      out_specs=pl.BlockSpec((k, k, c), lambda i: (0, 0, 0)),
      out_shape=jax.ShapeDtypeStruct((k, k, c), jnp.float32),
      interpret=interpret,
  )(xp, dy)
  return out.reshape(k, k, 1, c)


# ---------------------------------------------------------------------------
# Shift-and-add depthwise forward (pure jnp — no conv op anywhere).
# ---------------------------------------------------------------------------
#
# Motivation (round 4): the D0/D4 op budgets put LAYOUT COPIES at ~30% of
# the train step, and the largest ones are {3,1,2,0}<->{0,3,2,1} relayouts
# XLA inserts around the GROUPED-conv backward's 5-D reshapes (see
# PERF_NOTES round 4 D4 budget). A depthwise conv is k*k shifted
# elementwise multiply-adds; writing it that way (strided lax.slice of the
# padded input * a [C] tap vector, accumulated in f32) removes the conv op
# entirely: forward, dx (pads of dy) and dw (per-tap multiply-reduces) are
# all plain fusible HLO with NO grouped-conv reshapes and NO custom_vjp
# boundary. Depthwise convs are memory-bound (their FLOPs are negligible),
# so losing the MXU costs nothing if the taps fuse into one pass.


def depthwise_shift_and_add(x, kernel, strides=(1, 1), padding="SAME"):
  """Depthwise conv as k*k shifted multiply-adds. NHWC, [kh,kw,1,C] kernel.

  Matches jax.lax.conv_general_dilated(feature_group_count=C) for
  SAME/VALID string padding, any stride, dilation 1, channel multiplier 1.
  Accumulates taps in float32 and casts back to x.dtype (the conv path's
  MXU accumulation is f32 too).
  """
  kh, kw, mult, c = kernel.shape
  if mult != 1 or c != x.shape[-1]:
    raise ValueError(f"shift-and-add needs [kh,kw,1,C] kernel, got {kernel.shape}")
  sh, sw = strides
  n, h, w, _ = x.shape
  if padding == "SAME":
    (ph_lo, ph_hi) = _same_pads(h, kh, sh)
    (pw_lo, pw_hi) = _same_pads(w, kw, sw)
    xp = jnp.pad(x, ((0, 0), (ph_lo, ph_hi), (pw_lo, pw_hi), (0, 0)))
  elif padding == "VALID":
    xp = x
  else:
    raise ValueError(f"shift-and-add supports SAME/VALID, got {padding!r}")
  hp, wp = xp.shape[1], xp.shape[2]
  out_h = (hp - kh) // sh + 1
  out_w = (wp - kw) // sw + 1
  acc_dtype = jnp.float32 if _SHIFT_F32_ACCUM else x.dtype
  acc = None
  for i in range(kh):
    for j in range(kw):
      xs = jax.lax.slice(
          xp, (0, i, j, 0),
          (n, i + (out_h - 1) * sh + 1, j + (out_w - 1) * sw + 1, c),
          (1, sh, sw, 1))
      term = xs.astype(acc_dtype) * kernel[i, j, 0, :].astype(acc_dtype)
      acc = term if acc is None else acc + term
  return acc.astype(x.dtype)


# f32 tap accumulation matches the conv path's MXU accumulation; setting
# this False accumulates at the compute dtype (bf16 under the mixed policy)
# — cheaper temps, ~1e-2-relative tap-sum noise.
_SHIFT_F32_ACCUM = True


# HONEST NEGATIVE (round 4, measured whole-step): D0 b16 train with
# impl="shift" runs 135.8 ms vs 44.6 ms on the conv path (3.0x WORSE); a
# bf16-accumulation variant is 146.8 ms. XLA materializes the per-tap
# strided slices instead of fusing them into one stencil pass, so the k*k
# taps cost k*k activation passes in BOTH directions — far more HBM
# traffic than the grouped-conv custom call plus its relayout copies. The
# ~30% copies bucket is cheaper than any user-space rewrite tried so far
# (this, the Pallas filter-grad kernel, 1x1-as-einsum). Kept opt-in for
# numerics work; do not enable for speed.
#
# Trace-time impl selector for DepthwiseConv2D's forward (same caveat as
# enable_pallas_filter_grad: not part of any jit cache key — set before the
# first trace). "conv" = XLA grouped conv (default); "shift" = the
# shift-and-add form above.
_FORWARD_IMPL = "conv"


def set_forward_impl(impl: str) -> None:
  global _FORWARD_IMPL
  if impl not in ("conv", "shift"):
    raise ValueError(f"depthwise forward impl must be conv|shift, got {impl!r}")
  if impl == "shift" and _ENABLED:
    import warnings
    warnings.warn(
        "depthwise forward impl 'shift' takes precedence over the enabled "
        "Pallas filter-grad path (enable_pallas_filter_grad) — the Pallas "
        "kernel will not run while impl == 'shift'", stacklevel=2)
  _FORWARD_IMPL = impl


def forward_impl() -> str:
  return _FORWARD_IMPL


# VMEM budget: the whole padded image + dy must fit (~16 MB/core). Above
# this the XLA per-tap path is used instead (rare: only very large
# single-image spatial dims).
_VMEM_LIMIT_BYTES = 12 * 1024 * 1024

# HONEST NEGATIVE (round 3, measured whole-step per PERF_NOTES): with this
# kernel the D0 b16 train step REGRESSED 45.8 -> 54.7 ms despite exact
# numerics (max err ~1e-4 on grads of scale ~400). The single-pass HBM-
# traffic win is real in isolation, but (a) jnp.pad adds a full extra
# activation pass per depthwise conv, (b) the custom_vjp boundary breaks
# XLA's fusion of the per-tap reduces with neighboring elementwise grads,
# and (c) C<=96 channels use <=75% of the 128 VPU lanes serially per tap.
# Default OFF; enable_pallas_filter_grad(True) to experiment.
_ENABLED = False


def enable_pallas_filter_grad(on: bool = True) -> None:
  """CAVEAT — trace-time state (same as nn/quant.py QAT): the flag is read
  while a function is traced and is not part of any jit cache key. Set it
  BEFORE the first call of any jitted step whose behavior should depend on
  it; toggling afterwards silently keeps the compiled behavior."""
  global _ENABLED
  _ENABLED = bool(on)


def pallas_filter_grad_enabled() -> bool:
  return _ENABLED


def _use_pallas(x, dy, stride: int) -> bool:
  if not _ENABLED:
    return False
  if stride != 1:
    # Mosaic lowers strided window slices as >2D gathers (unsupported);
    # stride-2 depthwise convs (stage transitions) stay on XLA
    return False
  if jax.default_backend() != "tpu":
    return False
  per_image = (x[0].size * x.dtype.itemsize
               + 2 * dy[0].size * 4)  # x + dy-as-f32 + slack
  return per_image <= _VMEM_LIMIT_BYTES


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def depthwise_conv(x, kernel, strides, padding):
  """SAME/VALID depthwise conv (NHWC, HWIO kernel with I=1) whose filter
  gradient uses the Pallas single-pass kernel on TPU (XLA elsewhere)."""
  return _dw_forward(x, kernel, strides, padding)


def _dw_forward(x, kernel, strides, padding):
  c = x.shape[-1]
  return jax.lax.conv_general_dilated(
      x, kernel, window_strides=strides, padding=padding,
      feature_group_count=c, dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _dw_fwd(x, kernel, strides, padding):
  return _dw_forward(x, kernel, strides, padding), (x, kernel)


def _dw_bwd(strides, padding, res, dy):
  x, kernel = res
  k = kernel.shape[0]
  # dx: transposed depthwise conv — XLA's native path is fine
  _, dx_vjp = jax.vjp(lambda xx: _dw_forward(xx, kernel, strides, padding), x)
  (dx,) = dx_vjp(dy)
  square = kernel.shape[0] == kernel.shape[1]
  uniform_stride = strides[0] == strides[1]
  if (padding == "SAME" and square and uniform_stride
      and _use_pallas(x, dy, strides[0])):
    dw = depthwise_filter_grad(x, dy, k, strides[0]).astype(kernel.dtype)
  else:
    _, dw_vjp = jax.vjp(
        lambda kk: _dw_forward(x, kk, strides, padding), kernel)
    (dw,) = dw_vjp(dy)
  return dx, dw


depthwise_conv.defvjp(_dw_fwd, _dw_bwd)
