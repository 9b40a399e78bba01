"""Core layers: conv / depthwise / dense / batch norm / SE / stochastic depth.

All layers follow the Module init/apply contract, store params as nested dict
pytrees, run in NHWC (feature-minor — the TPU-native layout XLA tiles onto the
MXU), and obey the active mixed-precision Policy (bf16 compute, f32 params &
normalization statistics).

Behavioral parity references:
  conv/dense initializers      ref: efficientdet/backbone/efficientnet_model.py:52-125
  TpuBatchNormalization        ref: efficientdet/utils.py:166-266 (grouped cross-replica moments)
  drop_connect                 ref: efficientdet/utils.py:329-344
  SE block                     ref: efficientdet/backbone/efficientnet_model.py:153-196
  activation_fn table          ref: efficientdet/utils.py:27-53
"""

from __future__ import annotations

import math
from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from automl_tpu.nn import module as nn
from automl_tpu.nn import quant
from automl_tpu.nn.precision import get_policy

# ---------------------------------------------------------------------------
# Activations.
# ---------------------------------------------------------------------------


def srelu(x):
  """Smooth ReLU: log(1 + e^x) capped; x * sigmoid-free smooth variant."""
  with jax.numpy_dtype_promotion("standard"):
    return jnp.log1p(jnp.exp(x))


ACTIVATIONS: dict[str, Callable] = {
    "swish": jax.nn.silu,
    "silu": jax.nn.silu,
    "relu": jax.nn.relu,
    "relu6": jax.nn.relu6,
    "hswish": jax.nn.hard_silu,
    "mish": lambda x: x * jnp.tanh(jax.nn.softplus(x)),
    "srelu": srelu,
    "gelu": jax.nn.gelu,
    "identity": lambda x: x,
    None: lambda x: x,
}


def activation_fn(name) -> Callable:
  if callable(name):
    return name
  if name not in ACTIVATIONS:
    raise ValueError(f"Unknown activation {name!r}")
  return ACTIVATIONS[name]


# ---------------------------------------------------------------------------
# Initializers.
# ---------------------------------------------------------------------------


def conv_kernel_init(key, shape, dtype=jnp.float32):
  """Fan-out normal: N(0, sqrt(2 / (kh*kw*out_ch))). HWIO layout."""
  kh, kw, _, out_ch = shape
  stddev = math.sqrt(2.0 / (kh * kw * out_ch))
  return stddev * jax.random.normal(key, shape, dtype)


def depthwise_kernel_init(key, shape, dtype=jnp.float32):
  """Depthwise fan-out treats channel multiplier as out: N(0, sqrt(2/(kh*kw)))."""
  kh, kw, _, _ = shape
  stddev = math.sqrt(2.0 / (kh * kw))
  return stddev * jax.random.normal(key, shape, dtype)


def dense_kernel_init(key, shape, dtype=jnp.float32):
  """Uniform(+-1/3 * sqrt(3/fan_in)) — the reference's scaled-uniform head init."""
  fan_in = shape[0]
  init_range = 1.0 / math.sqrt(fan_in)
  return jax.random.uniform(key, shape, dtype, -init_range, init_range)


# ---------------------------------------------------------------------------
# Conv / Dense.
# ---------------------------------------------------------------------------


class Conv2D(nn.Module):
  """NHWC conv, HWIO kernel, SAME padding by default."""

  def __init__(self, in_ch: int, out_ch: int, kernel_size=3, strides=1,
               padding="SAME", use_bias=False, groups: int = 1,
               kernel_init=conv_kernel_init, bias_init_value: float = 0.0,
               name="conv2d"):
    super().__init__(name)
    self.in_ch, self.out_ch = in_ch, out_ch
    self.kernel_size = (kernel_size, kernel_size) if isinstance(
        kernel_size, int) else tuple(kernel_size)
    self.strides = (strides, strides) if isinstance(strides, int) else tuple(strides)
    self.padding = padding
    self.use_bias = use_bias
    self.groups = groups
    self.kernel_init = kernel_init
    self.bias_init_value = bias_init_value

  def init(self, key):
    kh, kw = self.kernel_size
    p = {"kernel": self.kernel_init(
        key, (kh, kw, self.in_ch // self.groups, self.out_ch),
        get_policy().param_dtype)}
    if self.use_bias:
      p["bias"] = jnp.full((self.out_ch,), self.bias_init_value,
                           get_policy().param_dtype)
    return p

  def apply(self, params, x):
    policy = get_policy()
    kernel = policy.cast_to_compute(quant.maybe_quant_kernel(params["kernel"]))
    x = policy.cast_to_compute(x)
    y = jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=self.strides,
        padding=self.padding,
        feature_group_count=self.groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if self.use_bias:
      y = y + policy.cast_to_compute(params["bias"])
    y = quant.maybe_quant_activation(y)
    return y


class DepthwiseConv2D(Conv2D):
  """Depthwise conv: groups == channels, HWIO kernel with I=1.

  An opt-in Pallas single-pass filter-gradient kernel exists
  (ops/depthwise.py enable_pallas_filter_grad) — measured whole-step it
  REGRESSED D0 training (45.8 -> 54.7 ms; see the honest-negative note
  there), so the default stays on XLA's per-tap fusions."""

  def __init__(self, channels: int, kernel_size=3, strides=1, padding="SAME",
               use_bias=False, name="depthwise_conv2d"):
    super().__init__(channels, channels, kernel_size, strides, padding,
                     use_bias, groups=channels,
                     kernel_init=depthwise_kernel_init, name=name)

  def apply(self, params, x):
    from automl_tpu.ops import depthwise
    if (depthwise.forward_impl() == "shift"
        and self.padding in ("SAME", "VALID")):
      # shift-and-add form: no conv op, no grouped-conv backward reshapes
      # (ops/depthwise.py depthwise_shift_and_add)
      policy = get_policy()
      kernel = policy.cast_to_compute(
          quant.maybe_quant_kernel(params["kernel"]))
      y = depthwise.depthwise_shift_and_add(
          policy.cast_to_compute(x), kernel, self.strides, self.padding)
      if self.use_bias:
        y = y + policy.cast_to_compute(params["bias"])
      return quant.maybe_quant_activation(y)
    if not depthwise.pallas_filter_grad_enabled():
      # default: plain XLA conv WITHOUT the custom_vjp wrapper — even a
      # pass-through custom_vjp boundary blocks XLA from fusing the
      # backward reduces with neighboring grads (measured regression,
      # ops/depthwise.py honest-negative note)
      return super().apply(params, x)
    policy = get_policy()
    kernel = policy.cast_to_compute(quant.maybe_quant_kernel(params["kernel"]))
    x = policy.cast_to_compute(x)
    y = depthwise.depthwise_conv(x, kernel, self.strides, self.padding)
    if self.use_bias:
      y = y + policy.cast_to_compute(params["bias"])
    return quant.maybe_quant_activation(y)


class SeparableConv2D(nn.Module):
  """Depthwise + pointwise. Pointwise holds the bias (matches ref sep-convs)."""

  def __init__(self, in_ch: int, out_ch: int, kernel_size=3, strides=1,
               use_bias=True, bias_init_value: float = 0.0, name="separable_conv2d"):
    super().__init__(name)
    self.depthwise = DepthwiseConv2D(in_ch, kernel_size, strides, name="depthwise")
    self.pointwise = Conv2D(in_ch, out_ch, 1, 1, use_bias=use_bias,
                            bias_init_value=bias_init_value, name="pointwise")

  def init(self, key):
    return self.init_child(key, [self.depthwise, self.pointwise])

  def apply(self, params, x):
    return self.pointwise(params["pointwise"],
                          self.depthwise(params["depthwise"], x))


class Dense(nn.Module):

  def __init__(self, in_dim: int, out_dim: int, use_bias=True,
               kernel_init=dense_kernel_init, name="dense"):
    super().__init__(name)
    self.in_dim, self.out_dim = in_dim, out_dim
    self.use_bias = use_bias
    self.kernel_init = kernel_init

  def init(self, key):
    p = {"kernel": self.kernel_init(key, (self.in_dim, self.out_dim),
                                    get_policy().param_dtype)}
    if self.use_bias:
      p["bias"] = jnp.zeros((self.out_dim,), get_policy().param_dtype)
    return p

  def apply(self, params, x):
    policy = get_policy()
    y = jnp.dot(policy.cast_to_compute(x),
                policy.cast_to_compute(
                    quant.maybe_quant_kernel(params["kernel"])),
                preferred_element_type=policy.compute_dtype)
    if self.use_bias:
      y = y + policy.cast_to_compute(params["bias"])
    return quant.maybe_quant_activation(y)


class ConvTranspose2D(nn.Module):
  """NHWC transposed conv (upsampling head in segmentation)."""

  def __init__(self, in_ch: int, out_ch: int, kernel_size=3, strides=2,
               use_bias=True, name="conv_transpose2d"):
    super().__init__(name)
    self.in_ch, self.out_ch = in_ch, out_ch
    self.kernel_size = (kernel_size, kernel_size) if isinstance(
        kernel_size, int) else tuple(kernel_size)
    self.strides = (strides, strides) if isinstance(strides, int) else tuple(strides)
    self.use_bias = use_bias

  def init(self, key):
    kh, kw = self.kernel_size
    p = {"kernel": conv_kernel_init(key, (kh, kw, self.in_ch, self.out_ch),
                                    get_policy().param_dtype)}
    if self.use_bias:
      p["bias"] = jnp.zeros((self.out_ch,), get_policy().param_dtype)
    return p

  def apply(self, params, x):
    policy = get_policy()
    kernel = policy.cast_to_compute(params["kernel"])
    x = policy.cast_to_compute(x)
    y = jax.lax.conv_transpose(
        x, kernel, strides=self.strides, padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if self.use_bias:
      y = y + policy.cast_to_compute(params["bias"])
    return y


# ---------------------------------------------------------------------------
# Batch normalization.
# ---------------------------------------------------------------------------


class BatchNorm(nn.Module):
  """BN over (N,H,W) with f32 statistics and bf16 in/out.

  Under GSPMD a mean over the (data-sharded) batch axis is already a global
  cross-replica mean — XLA inserts the all-reduce — so the default covers the
  reference's SyncBatchNormalization. For grouped cross-replica moments
  (TpuBatchNormalization's <=32-core groups, ref: efficientdet/utils.py:56-75,
  166-202) pass `axis_name` + `group_size` when running under shard_map.
  """

  def __init__(self, channels: int, momentum=0.99, epsilon=1e-3,
               axis_name: str | None = None, group_size: int | None = None,
               gamma_init_value: float = 1.0, name="bn"):
    super().__init__(name)
    self.channels = channels
    self.momentum = momentum
    self.epsilon = epsilon
    self.axis_name = axis_name
    self.group_size = group_size
    self.gamma_init_value = gamma_init_value

  def init(self, key):
    del key
    c = (self.channels,)
    return {
        "gamma": jnp.full(c, self.gamma_init_value, jnp.float32),
        "beta": jnp.zeros(c, jnp.float32),
        "moving_mean": jnp.zeros(c, jnp.float32),
        "moving_variance": jnp.ones(c, jnp.float32),
    }

  def _cross_replica_moments(self, x):
    # The f32 cast feeds ONLY the two reduces, so XLA fuses convert+square
    # into one f32-accumulating pass that reads the bf16 activation
    # directly. (Round-4 D4 profile: when the f32 cast was shared with the
    # normalize, XLA materialized full f32 activation copies — 2x the
    # bytes of every BN-touching pass, e.g. a 100 MB f32[256,4,256,192]
    # copy per stem BN per step.)
    xf = jnp.asarray(x, jnp.float32)
    axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(xf, axes)
    mean_sq = jnp.mean(jnp.square(xf), axes)
    if self.axis_name is not None:
      if self.group_size is not None:
        # Grouped moments via all-gather + per-group slice (axis_index_groups
        # is not supported under shard_map in current JAX); gathered tensor is
        # [n_devices, C] — trivial ICI traffic.
        idx = jax.lax.axis_index(self.axis_name)
        group_start = (idx // self.group_size) * self.group_size

        def group_mean(v):
          gathered = jax.lax.all_gather(v, self.axis_name)
          sliced = jax.lax.dynamic_slice_in_dim(
              gathered, group_start, self.group_size, 0)
          return jnp.mean(sliced, axis=0)

        mean = group_mean(mean)
        mean_sq = group_mean(mean_sq)
      else:
        mean = jax.lax.pmean(mean, self.axis_name)
        mean_sq = jax.lax.pmean(mean_sq, self.axis_name)
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    return mean, var

  def apply(self, params, x, train: bool = False):
    policy = get_policy()
    if train:
      mean, var = self._cross_replica_moments(x)
      m = self.momentum
      nn.record_state("moving_mean", m * params["moving_mean"] + (1 - m) * mean)
      nn.record_state("moving_variance",
                      m * params["moving_variance"] + (1 - m) * var)
    else:
      mean, var = params["moving_mean"], params["moving_variance"]
    # Folded normalize in the COMPUTE dtype: y = x*inv + (beta - mean*inv)
    # with the [C]-sized scale/offset precomputed in f32. Keeping the big
    # elementwise pass at the activation width (bf16 under mixed policy)
    # removes the materialized f32 activation copies the round-4 D4
    # profile exposed; statistics stay f32 (one fused pass above). Under a
    # float32 policy this is bit-for-bit the same math up to one
    # re-association.
    inv = jax.lax.rsqrt(var + self.epsilon) * params["gamma"]
    offset = params["beta"] - mean * inv
    y = x * inv.astype(x.dtype) + offset.astype(x.dtype)
    return policy.cast_to_compute(y)


class GroupNorm(nn.Module):
  """GroupNorm option (ref: efficientnetv2/utils.py:218-233 'gn')."""

  def __init__(self, channels: int, groups: int = 8, epsilon=1e-3, name="gn"):
    super().__init__(name)
    self.channels, self.groups, self.epsilon = channels, groups, epsilon

  def init(self, key):
    del key
    return {"gamma": jnp.ones((self.channels,), jnp.float32),
            "beta": jnp.zeros((self.channels,), jnp.float32)}

  def apply(self, params, x, train: bool = False):
    del train
    policy = get_policy()
    xf = jnp.asarray(x, jnp.float32)
    shape = xf.shape
    g = self.groups
    xg = xf.reshape(shape[:-1] + (g, shape[-1] // g))
    axes = tuple(range(1, xg.ndim - 2)) + (xg.ndim - 1,)
    mean = jnp.mean(xg, axes, keepdims=True)
    var = jnp.var(xg, axes, keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + self.epsilon)
    y = xg.reshape(shape) * params["gamma"] + params["beta"]
    return policy.cast_to_compute(y)


def build_norm(channels: int, norm_type: str = "bn", momentum=0.99,
               epsilon=1e-3, axis_name=None, group_size=None,
               gamma_init_value: float = 1.0, name="bn") -> nn.Module:
  """Norm selector (ref: efficientnetv2/utils.py:218-233, efficientdet/utils.py:245-266)."""
  if norm_type in ("bn", "syncbn", "tpu_bn"):
    return BatchNorm(channels, momentum, epsilon,
                     axis_name if norm_type != "bn" else axis_name,
                     group_size, gamma_init_value, name=name)
  if norm_type == "gn":
    return GroupNorm(channels, epsilon=epsilon, name=name)
  raise ValueError(f"Unknown norm type {norm_type!r}")


# ---------------------------------------------------------------------------
# Stochastic regularizers.
# ---------------------------------------------------------------------------


def drop_connect(x, train: bool, survival_prob: float):
  """Stochastic depth on the residual branch (ref: efficientdet/utils.py:329-344)."""
  if not train or survival_prob is None or survival_prob >= 1.0:
    return x
  return drop_connect_with_key(x, nn.make_rng("drop_connect"), survival_prob)


def drop_connect_with_key(x, key, survival_prob: float):
  """drop_connect with an explicit key — for lax.scan bodies, where make_rng
  would hand every iteration the same trace-time key."""
  shape = (x.shape[0],) + (1,) * (x.ndim - 1)
  mask = jax.random.bernoulli(key, survival_prob, shape)
  return jnp.where(mask, x / survival_prob, jnp.zeros_like(x))


def dropout(x, train: bool, rate: float):
  if not train or rate <= 0.0:
    return x
  key = nn.make_rng("dropout")
  keep = 1.0 - rate
  mask = jax.random.bernoulli(key, keep, x.shape)
  return jnp.where(mask, x / keep, jnp.zeros_like(x))


# ---------------------------------------------------------------------------
# Squeeze-and-excitation.
# ---------------------------------------------------------------------------


class SqueezeExcite(nn.Module):
  """Global-pool -> reduce 1x1 -> act -> expand 1x1 -> sigmoid gate."""

  def __init__(self, channels: int, reduced_ch: int, act="swish", name="se"):
    super().__init__(name)
    self.reduce = Conv2D(channels, reduced_ch, 1, use_bias=True, name="reduce")
    self.expand = Conv2D(reduced_ch, channels, 1, use_bias=True, name="expand")
    self.act = activation_fn(act)

  def init(self, key):
    return self.init_child(key, [self.reduce, self.expand])

  def apply(self, params, x):
    pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
    gate = self.act(self.reduce(params["reduce"], pooled))
    gate = jax.nn.sigmoid(self.expand(params["expand"], gate))
    return x * gate


# ---------------------------------------------------------------------------
# Pooling / resize.
# ---------------------------------------------------------------------------


def max_pool(x, window: int, strides: int, padding="SAME"):
  return jax.lax.reduce_window(
      x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
      jax.lax.max,
      (1, window, window, 1), (1, strides, strides, 1), padding)


def avg_pool(x, window: int, strides: int, padding="SAME"):
  ones = jnp.ones((), x.dtype)
  summed = jax.lax.reduce_window(
      x, jnp.zeros((), x.dtype), jax.lax.add,
      (1, window, window, 1), (1, strides, strides, 1), padding)
  counts = jax.lax.reduce_window(
      jnp.broadcast_to(ones, x.shape), jnp.zeros((), x.dtype), jax.lax.add,
      (1, window, window, 1), (1, strides, strides, 1), padding)
  return summed / counts


def resize_nearest(x, target_hw: Sequence[int]):
  """Nearest-neighbor upsample (BiFPN top-down path)."""
  n, h, w, c = x.shape
  th, tw = target_hw
  if (th, tw) == (h, w):
    return x
  if th % h == 0 and tw % w == 0:
    x = jnp.repeat(jnp.repeat(x, th // h, axis=1), tw // w, axis=2)
    return x
  return jax.image.resize(x, (n, th, tw, c), method="nearest")
