"""TF-checkpoint compatibility: load published reference checkpoints into our
pytrees (north-star requirement, SURVEY.md section 5.4).

Variable-name convention reproduced (observed by instantiating the reference
model, and per name scopes in effnetv2_model.py / efficientnet_model.py):

  {model}/stem/conv2d/kernel
  {model}/blocks_{i}/conv2d[_k]/kernel                (expand/project convs,
                                                       creation order)
  {model}/blocks_{i}/depthwise_conv2d/depthwise_kernel
  {model}/blocks_{i}/tpu_batch_normalization[_k]/{gamma,beta,moving_mean,
                                                  moving_variance}
  {model}/blocks_{i}/se/conv2d/{kernel,bias}          (reduce)
  {model}/blocks_{i}/se/conv2d_1/{kernel,bias}        (expand)
  {model}/head/conv2d/kernel, head/tpu_batch_normalization/*, head/dense/*

EMA checkpoints store shadow values under '{name}/ExponentialMovingAverage'.

Transforms: TF depthwise kernels are [kh, kw, C, 1]; ours are [kh, kw, 1, C].
Everything else maps 1:1 (NHWC/HWIO both sides).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import numpy as np

from automl_tpu.models.efficientnet import (
    EfficientNet, FusedMBConvBlock, MBConvBlock)


def _dw_transpose(w):
  return np.transpose(w, (0, 1, 3, 2))


def effnet_var_map(model: EfficientNet,
                   scope: str | None = None) -> dict[str, tuple]:
  """-> {tf_var_name: (pytree_path_tuple, transform_fn)} for an EfficientNet."""
  scope = scope or model.cfg.model_name
  out: dict[str, tuple] = {}
  ident = lambda x: x

  def bn(tf_prefix, path):
    for leaf in ("gamma", "beta", "moving_mean", "moving_variance"):
      out[f"{tf_prefix}/{leaf}"] = (path + (leaf,), ident)

  # stem
  out[f"{scope}/stem/conv2d/kernel"] = (("stem", "conv2d", "kernel"), ident)
  bn(f"{scope}/stem/tpu_batch_normalization", ("stem", "norm"))

  # blocks
  for block in model.blocks:
    p = f"{scope}/{block.name}"
    conv_i = [0]
    norm_i = [0]

    def conv_name():
      n = "conv2d" if conv_i[0] == 0 else f"conv2d_{conv_i[0]}"
      conv_i[0] += 1
      return n

    def norm_name():
      n = ("tpu_batch_normalization" if norm_i[0] == 0
           else f"tpu_batch_normalization_{norm_i[0]}")
      norm_i[0] += 1
      return n

    base = (block.name,)
    if isinstance(block, MBConvBlock):
      if block.expand_conv is not None:
        out[f"{p}/{conv_name()}/kernel"] = (base + ("expand_conv", "kernel"),
                                            ident)
        bn(f"{p}/{norm_name()}", base + ("norm0",))
      out[f"{p}/depthwise_conv2d/depthwise_kernel"] = (
          base + ("depthwise_conv2d", "kernel"), _dw_transpose)
      bn(f"{p}/{norm_name()}", base + ("norm1",))
      if block.se is not None:
        out[f"{p}/se/conv2d/kernel"] = (base + ("se", "reduce", "kernel"), ident)
        out[f"{p}/se/conv2d/bias"] = (base + ("se", "reduce", "bias"), ident)
        out[f"{p}/se/conv2d_1/kernel"] = (base + ("se", "expand", "kernel"), ident)
        out[f"{p}/se/conv2d_1/bias"] = (base + ("se", "expand", "bias"), ident)
      out[f"{p}/{conv_name()}/kernel"] = (base + ("project_conv", "kernel"),
                                          ident)
      bn(f"{p}/{norm_name()}", base + ("norm2",))
    elif isinstance(block, FusedMBConvBlock):
      if block.expand_conv is not None:
        out[f"{p}/{conv_name()}/kernel"] = (base + ("expand_conv", "kernel"),
                                            ident)
        bn(f"{p}/{norm_name()}", base + ("norm0",))
      if block.se is not None:
        out[f"{p}/se/conv2d/kernel"] = (base + ("se", "reduce", "kernel"), ident)
        out[f"{p}/se/conv2d/bias"] = (base + ("se", "reduce", "bias"), ident)
        out[f"{p}/se/conv2d_1/kernel"] = (base + ("se", "expand", "kernel"), ident)
        out[f"{p}/se/conv2d_1/bias"] = (base + ("se", "expand", "bias"), ident)
      out[f"{p}/{conv_name()}/kernel"] = (base + ("project_conv", "kernel"),
                                          ident)
      bn(f"{p}/{norm_name()}", base + ("norm1",))
    else:
      raise TypeError(type(block))

  # head
  if model.head is not None:
    out[f"{scope}/head/conv2d/kernel"] = (("head", "conv2d", "kernel"), ident)
    bn(f"{scope}/head/tpu_batch_normalization", ("head", "norm"))
    if model.head.fc is not None:
      out[f"{scope}/head/dense/kernel"] = (("head", "fc", "kernel"), ident)
      out[f"{scope}/head/dense/bias"] = (("head", "fc", "bias"), ident)
  return out


def load_tf_checkpoint(path: str) -> dict[str, np.ndarray]:
  """Read every tensor from a TF checkpoint into {name: ndarray}."""
  import tensorflow as tf
  reader = tf.train.load_checkpoint(path)
  shapes = reader.get_variable_to_shape_map()
  return {name: reader.get_tensor(name) for name in shapes
          if not name.startswith("_") and "optimizer" not in name.lower()}


def convert_effnet_checkpoint(ckpt, model: EfficientNet, params=None,
                              use_ema: bool = False,
                              scope: str | None = None,
                              strict: bool = True):
  """TF checkpoint (path or {name: array}) -> our params pytree.

  use_ema: prefer '{name}/ExponentialMovingAverage' shadow values
  (ref: utils.get_ckpt_var_map init_ema, efficientnetv2/utils.py:457-519).
  params: optional template pytree to fill (defaults to model.init shapes).
  """
  if isinstance(ckpt, str):
    ckpt = load_tf_checkpoint(ckpt)
  if params is None:
    import jax
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype),
        jax.eval_shape(model.init, __import__("jax").random.key(0)))
  var_map = effnet_var_map(model, scope)

  def set_path(tree, path, value):
    node = tree
    for k in path[:-1]:
      node = node[k]
    want = node[path[-1]]
    if tuple(want.shape) != tuple(value.shape):
      raise ValueError(f"shape mismatch at {path}: ckpt {value.shape} "
                       f"vs model {tuple(want.shape)}")
    node[path[-1]] = jnp.asarray(value, want.dtype)

  missing = []
  for tf_name, (path, transform) in var_map.items():
    name = tf_name
    if use_ema and f"{tf_name}/ExponentialMovingAverage" in ckpt:
      name = f"{tf_name}/ExponentialMovingAverage"
    if name not in ckpt:
      missing.append(tf_name)
      continue
    set_path(params, path, transform(ckpt[name]))
  if missing and strict:
    raise KeyError(f"{len(missing)} variables missing from checkpoint, e.g. "
                   f"{missing[:5]}")
  return params


def reference_model_shim():
  """Make the reference's TF code importable: route tf.keras to legacy Keras 2
  (tf_keras) and stub tensorflow_addons. Host/test tooling only."""
  import sys
  import types
  import tensorflow as tf
  import tf_keras
  tf.config.set_visible_devices([], "GPU")
  tf.keras = tf_keras
  sys.modules["tensorflow.keras"] = tf_keras
  if "tensorflow_addons" not in sys.modules:
    tfa = types.ModuleType("tensorflow_addons")
    tfa_layers = types.ModuleType("tensorflow_addons.layers")
    tfa_layers.GroupNormalization = tf_keras.layers.GroupNormalization
    tfa.layers = tfa_layers
    sys.modules["tensorflow_addons"] = tfa
    sys.modules["tensorflow_addons.layers"] = tfa_layers
  if not hasattr(tf_keras.callbacks, "experimental"):
    tf_keras.callbacks.experimental = types.SimpleNamespace(
        BackupAndRestore=tf_keras.callbacks.BackupAndRestore)
  return tf
