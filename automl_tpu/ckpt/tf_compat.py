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


def _assign(transform=None):
  """Setter: full-leaf overwrite (optionally transforming the TF value)."""
  def setter(cur, val):
    v = transform(val) if transform else val
    if tuple(cur.shape) != tuple(v.shape):
      raise ValueError(f"shape mismatch: ckpt {v.shape} vs model {cur.shape}")
    return v
  return setter


def _assign_row(row, transform=None):
  """Setter: write into row `row` of a [R, ...]-stacked leaf (scan stacks)."""
  def setter(cur, val):
    v = transform(val) if transform else val
    if tuple(cur.shape[1:]) != tuple(v.shape):
      raise ValueError(
          f"shape mismatch: ckpt {v.shape} vs stacked model {cur.shape}")
    cur = np.array(cur)
    cur[row] = v
    return cur
  return setter


def _assign_wsm(j, row=None):
  """Setter: TF per-input WSM scalar -> element j of our 'wsm' vector
  (optionally inside row `row` of a cell stack)."""
  def setter(cur, val):
    cur = np.array(cur)
    if row is None:
      cur[j] = val
    else:
      cur[row, j] = val
    return cur
  return setter


def effdet_var_map(model) -> dict[str, tuple]:
  """{tf_var_name: (pytree_path, setter)} for a full EfficientDet.

  setter(current_leaf_np, ckpt_value_np) -> new_leaf_np; stacked layouts
  (scan over BiFPN cells 1..N-1 and head conv repeats) write single TF
  variables into rows of the stacked leaves.

  Naming observed from the reference EfficientDetNet (tf2/efficientdet_keras.py
  name scopes, verified by instantiation):
    {backbone_name}/...                          (effnet map, no head)
    resample_p6/{conv2d/{kernel,bias}, bn/*}
    fpn_cells/cell_{r}/fnode{i}/WSM[_k]          (fusion weights, scalars)
    fpn_cells/cell_{r}/fnode{i}/resample_{j}_{off}_{num_levels+i}/...
    fpn_cells/cell_{r}/fnode{i}/op_after_combine{num_levels+i}/
        conv/{depthwise_kernel,pointwise_kernel,bias}, bn/*
    {class,box}_net/{class,box}-{i}/{depthwise_kernel,pointwise_kernel,bias}
    {class,box}_net/{class,box}-{i}-bn-{LEVEL}/*  (LEVEL = 3..max_level)
    {class,box}_net/{class,box}-predict/...
  Our layout: cell_0 params under fpn_cells/cell_0; cells r >= 1 stacked at
  row r-1 under fpn_cells/cells_rep; head conv repeat i at row i of
  {net}/conv_stack and {net}/{prefix}-bn-{LEVEL} (BN stacked [R, C]).
  """
  config = model.config
  out: dict[str, tuple] = {}

  def bn(tf_prefix, path, row=None):
    mk = (lambda: _assign()) if row is None else (lambda: _assign_row(row))
    for leaf in ("gamma", "beta", "moving_mean", "moving_variance"):
      out[f"{tf_prefix}/{leaf}"] = (path + (leaf,), mk())

  def sep_conv(tf_prefix, path, row=None):
    mk = (lambda tr=None: _assign(tr)) if row is None else (
        lambda tr=None: _assign_row(row, tr))
    out[f"{tf_prefix}/depthwise_kernel"] = (
        path + ("depthwise", "kernel"), mk(_dw_transpose))
    out[f"{tf_prefix}/pointwise_kernel"] = (
        path + ("pointwise", "kernel"), mk())
    out[f"{tf_prefix}/bias"] = (path + ("pointwise", "bias"), mk())

  def full_conv(tf_prefix, path, bias=True, row=None):
    mk = (lambda: _assign()) if row is None else (lambda: _assign_row(row))
    out[f"{tf_prefix}/kernel"] = (path + ("kernel",), mk())
    if bias:
      out[f"{tf_prefix}/bias"] = (path + ("bias",), mk())

  # backbone
  for tf_name, (path, tr) in effnet_var_map(
      model.backbone, scope=config.backbone_name).items():
    out[tf_name] = (("backbone",) + path, _assign(tr))

  # P6.. resample layers
  for layer in model.resample_layers:
    if layer.needs_1x1:
      full_conv(f"{layer.name}/conv2d", (layer.name, "conv2d"))
      bn(f"{layer.name}/bn", (layer.name, "bn"))

  # BiFPN cells: TF cell_0 -> our cell_0; TF cell_r (r>=1) -> cells_rep[r-1]
  num_levels = config.max_level - config.min_level + 1
  fpn_cells = model.fpn_cells
  for rep in range(config.fpn_cell_repeats):
    if rep == 0:
      cell, tree_cell, row = fpn_cells.cell0, "cell_0", None
    else:
      cell, tree_cell, row = fpn_cells.rep_cell, "cells_rep", rep - 1
    for ni, fnode in enumerate(cell.fnodes):
      scope = f"fpn_cells/cell_{rep}/fnode{ni}"
      base = ("fpn_cells", tree_cell, fnode.name)
      if fnode.weight_method in ("attn", "fastattn", "channel_attn",
                                 "channel_fastattn"):
        for j in range(len(fnode.inputs_offsets)):
          wsm = "WSM" if j == 0 else f"WSM_{j}"
          out[f"{scope}/{wsm}"] = (base + ("wsm",), _assign_wsm(j, row))
      for j, offset in enumerate(fnode.inputs_offsets):
        rl = fnode.resample_layers[j]
        if rl.needs_1x1:
          rscope = f"{scope}/resample_{j}_{offset}_{num_levels + ni}"
          full_conv(f"{rscope}/conv2d", base + (rl.name, "conv2d"), row=row)
          bn(f"{rscope}/bn", base + (rl.name, "bn"), row=row)
      oc = fnode.op_after_combine
      oscope = f"{scope}/op_after_combine{num_levels + ni}"
      opath = base + (oc.name,)
      if config.separable_conv:
        sep_conv(f"{oscope}/conv", opath + ("conv",), row=row)
      else:
        full_conv(f"{oscope}/conv", opath + ("conv",), row=row)
      bn(f"{oscope}/bn", opath + ("bn",), row=row)

  # heads: conv repeat i -> row i of conv_stack; BN (i, level) -> row i of
  # the per-level [R, C] stack
  for net, prefix, root in ((model.class_net, "class", "class_net"),
                            (model.box_net, "box", "box_net")):
    for i in range(net.repeats):
      cpath = (root, "conv_stack")
      if config.separable_conv:
        sep_conv(f"{root}/{prefix}-{i}", cpath, row=i)
      else:
        full_conv(f"{root}/{prefix}-{i}", cpath, row=i)
      for lvl_id in range(net.num_levels):
        level = config.min_level + lvl_id
        bn(f"{root}/{prefix}-{i}-bn-{level}",
           (root, f"{prefix}-bn-{level}"), row=i)
    ppath = (root, net.predict.name)
    if config.separable_conv:
      sep_conv(f"{root}/{prefix}-predict", ppath)
    else:
      full_conv(f"{root}/{prefix}-predict", ppath)
  return out


def convert_effdet_checkpoint(ckpt, model, params=None, use_ema: bool = False,
                              strict: bool = True):
  """TF EfficientDet checkpoint (path or {name: array}) -> our params pytree."""
  import jax
  if isinstance(ckpt, str):
    ckpt = load_tf_checkpoint(ckpt)
  if params is None:
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype),
        jax.eval_shape(model.init, jax.random.key(0)))
  var_map = effdet_var_map(model)

  def get_node(tree, path):
    node = tree
    for k in path[:-1]:
      node = node[k]
    return node

  missing = []
  for tf_name, (path, setter) in var_map.items():
    name = tf_name
    if use_ema and f"{tf_name}/ExponentialMovingAverage" in ckpt:
      name = f"{tf_name}/ExponentialMovingAverage"
    if name not in ckpt:
      missing.append(tf_name)
      continue
    value = np.asarray(ckpt[name])
    node = get_node(params, path)
    leaf = path[-1]
    want = node[leaf]
    try:
      new = np.asarray(setter(np.asarray(want), value))
      if new.shape != want.shape:
        raise ValueError(f"converted {tf_name} {value.shape} -> {new.shape}, "
                         f"param leaf wants {want.shape}")
      node[leaf] = jnp.asarray(new, want.dtype)
    except ValueError as e:
      raise ValueError(f"at {path}: {e}") from e
  if missing and strict:
    raise KeyError(f"{len(missing)} variables missing from checkpoint, e.g. "
                   f"{missing[:5]}")
  return params


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
                              strict: bool = True,
                              exclude_prefixes: tuple = ()):
  """TF checkpoint (path or {name: array}) -> our params pytree.

  use_ema: prefer '{name}/ExponentialMovingAverage' shadow values
  (ref: utils.get_ckpt_var_map init_ema, efficientnetv2/utils.py:457-519).
  params: optional template pytree to fill (defaults to model.init shapes).
  exclude_prefixes: pytree path prefixes to leave at their current values —
  e.g. (("head", "fc"),) for finetuning with a different class count
  (ref: restore_tf2_ckpt exclude_layers, efficientnetv2/main_tf2.py:176-179).
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
    if any(path[:len(pre)] == tuple(pre) for pre in exclude_prefixes):
      continue
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


def import_reference_module(subproject: str, module: str):
  """Import a module from /root/reference/<subproject> with a clean path.

  Both reference subprojects define top-level `utils` (and friends); purge the
  colliding modules and pin the wanted subproject at sys.path[0]."""
  import importlib
  import sys
  base = f"/root/reference/{subproject}"
  for other in ("efficientdet", "efficientnetv2"):
    p = f"/root/reference/{other}"
    while p in sys.path:
      sys.path.remove(p)
  for name in ("utils", "hparams_config", "hparams", "effnetv2_model",
               "effnetv2_configs", "backbone", "backbone.efficientnet_model",
               "backbone.efficientnet_builder", "tf2", "tf2.efficientdet_keras",
               "tf2.fpn_configs", "tf2.util_keras", "tf2.postprocess",
               "tf2.anchors", "nms_np", "dataloader", "iou_utils",
               "aug", "aug.autoaugment", "object_detection"):
    sys.modules.pop(name, None)
  sys.path.insert(0, base)
  return importlib.import_module(module)


def reference_model_shim():
  """Make the reference's TF code importable: route tf.keras to legacy Keras 2
  (tf_keras) and stub tensorflow_addons. Host/test tooling only.

  Must run before tensorflow is first imported for compat.v2.keras to pick up
  legacy keras (TF_USE_LEGACY_KERAS)."""
  import os
  import sys
  import types
  os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
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
  if "tensorflow_addons.image" not in sys.modules:
    # import-time stub only (the reference's autoaugment imports it at
    # module scope; the eval paths we exercise never call these ops)
    tfa_image = types.ModuleType("tensorflow_addons.image")
    def _unavailable(*_a, **_k):
      raise NotImplementedError("tensorflow_addons.image is stubbed")
    for _name in ("transform", "translate", "rotate", "shear_x", "shear_y"):
      setattr(tfa_image, _name, _unavailable)
    sys.modules["tensorflow_addons"].image = tfa_image
    sys.modules["tensorflow_addons.image"] = tfa_image
  if not hasattr(tf_keras.callbacks, "experimental"):
    tf_keras.callbacks.experimental = types.SimpleNamespace(
        BackupAndRestore=tf_keras.callbacks.BackupAndRestore)
  return tf
