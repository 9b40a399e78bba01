"""EfficientDet: EfficientNet backbone + BiFPN + class/box heads, TPU-native.

Structural parity refs (architecture facts, not code):
  ResampleFeatureMap   efficientdet/tf2/efficientdet_keras.py:224-334
  FNode / fuse weights efficientdet/tf2/efficientdet_keras.py:42-173
  OpAfterCombine       efficientdet/tf2/efficientdet_keras.py:175-221
  ClassNet / BoxNet    efficientdet/tf2/efficientdet_keras.py:336-643
    (shared convs across levels, per-level BN, survival-prob residual,
     class-predict bias = -log((1-0.01)/0.01))
  EfficientDetNet      efficientdet/tf2/efficientdet_keras.py:787-915
  FPNCells node select efficientdet/tf2/efficientdet_keras.py:709-786

TPU-native notes:
  * The whole DAG is static Python at trace time; XLA sees one flat graph of
    convs + elementwise fusions per BiFPN cell and fuses resample/fuse chains.
  * grad_checkpoint uses jax.checkpoint around each head conv-bn-act
    (ref semantics: utils.recompute_grad, efficientdet/utils.py:645-652).
  * Head outputs are also exposed flattened/concatenated over levels in anchor
    order ([B, A, C]) to feed the flat on-device loss/NMS path.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from automl_tpu import nn
from automl_tpu.config import Config
from automl_tpu.models import fpn_configs
from automl_tpu.models.efficientnet import EfficientNet
from automl_tpu.nn import layers as L
from automl_tpu.nn.module import Module


def head_conv_kernel_init(key, shape, dtype=jnp.float32):
  """variance_scaling (fan_in, truncated normal) for separable head convs."""
  fan_in = shape[0] * shape[1] * shape[2]
  stddev = math.sqrt(1.0 / fan_in) / 0.87962566103423978
  return stddev * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


def head_dense_kernel_init(key, shape, dtype=jnp.float32):
  return 0.01 * jax.random.normal(key, shape, dtype)


class ResampleFeatureMap(Module):
  """1x1-conv channel match (+BN) and max-pool down / nearest up-sampling."""

  def __init__(self, in_channels: int, target_num_channels: int,
               apply_bn: bool = False, conv_after_downsample: bool = False,
               pooling_type: str = "max", name="resample"):
    super().__init__(name)
    self.in_channels = in_channels
    self.target_num_channels = target_num_channels
    self.conv_after_downsample = conv_after_downsample
    self.pooling_type = pooling_type
    self.needs_1x1 = in_channels != target_num_channels
    if self.needs_1x1:
      self.conv = L.Conv2D(in_channels, target_num_channels, 1, 1,
                           use_bias=True, name="conv2d")
      self.bn = L.BatchNorm(target_num_channels, name="bn") if apply_bn else None
    self.children = ([self.conv] + ([self.bn] if apply_bn else [])
                     if self.needs_1x1 else [])

  def init(self, key):
    return self.init_child(key, self.children)

  def _maybe_1x1(self, params, x, train):
    if self.needs_1x1:
      x = self.conv(params["conv2d"], x)
      if self.bn is not None:
        x = self.bn(params["bn"], x, train)
    return x

  def apply(self, params, x, target_hw, train=False):
    h, w = x.shape[1], x.shape[2]
    th, tw = target_hw
    if h > th and w > tw:
      if not self.conv_after_downsample:
        x = self._maybe_1x1(params, x, train)
      stride_h = (h - 1) // th + 1
      stride_w = (w - 1) // tw + 1
      pool = L.max_pool if self.pooling_type == "max" else L.avg_pool
      x = pool(x, stride_h + 1, stride_h)
      if self.conv_after_downsample:
        x = self._maybe_1x1(params, x, train)
    elif h <= th and w <= tw:
      x = self._maybe_1x1(params, x, train)
      if h < th or w < tw:
        x = L.resize_nearest(x, (th, tw))
    else:
      raise ValueError(f"Incompatible resample {h}x{w} -> {th}x{tw}")
    return x


class OpAfterCombine(Module):
  """(act ->) sep-conv -> BN (-> act) after feature fusion."""

  def __init__(self, fpn_num_filters: int, conv_bn_act_pattern: bool,
               separable_conv: bool, act_type: str, name="op_after_combine"):
    super().__init__(name)
    self.conv_bn_act_pattern = conv_bn_act_pattern
    self.act = L.activation_fn(act_type)
    use_bias = not conv_bn_act_pattern
    if separable_conv:
      self.conv = L.SeparableConv2D(fpn_num_filters, fpn_num_filters, 3, 1,
                                    use_bias=use_bias, name="conv")
    else:
      self.conv = L.Conv2D(fpn_num_filters, fpn_num_filters, 3, 1,
                           use_bias=use_bias, name="conv")
    self.bn = L.BatchNorm(fpn_num_filters, name="bn")

  def init(self, key):
    return self.init_child(key, [self.conv, self.bn])

  def apply(self, params, x, train=False):
    if not self.conv_bn_act_pattern:
      x = self.act(x)
    x = self.conv(params["conv"], x)
    x = self.bn(params["bn"], x, train)
    if self.conv_bn_act_pattern:
      x = self.act(x)
    return x


class FNode(Module):
  """One BiFPN fusion node: resample inputs, weighted-fuse, conv-bn."""

  def __init__(self, feat_level: int, inputs_offsets: list[int],
               input_channels: list[int], config: Config,
               weight_method: str, name="fnode"):
    super().__init__(name)
    self.feat_level = feat_level
    self.inputs_offsets = list(inputs_offsets)
    self.weight_method = weight_method
    self.fpn_num_filters = config.fpn_num_filters
    self.resample_layers = [
        ResampleFeatureMap(
            input_channels[offset], config.fpn_num_filters,
            apply_bn=config.apply_bn_for_resampling,
            conv_after_downsample=config.conv_after_downsample,
            name=f"resample_{i}_{offset}")
        for i, offset in enumerate(self.inputs_offsets)
    ]
    self.op_after_combine = OpAfterCombine(
        config.fpn_num_filters, config.conv_bn_act_pattern,
        config.separable_conv, config.act_type)

  def init(self, key):
    params = self.init_child(key, self.resample_layers + [self.op_after_combine])
    n = len(self.inputs_offsets)
    if self.weight_method in ("attn", "fastattn"):
      params["wsm"] = jnp.ones((n,), jnp.float32)
    elif self.weight_method in ("channel_attn", "channel_fastattn"):
      params["wsm"] = jnp.ones((n, self.fpn_num_filters), jnp.float32)
    return params

  def _fuse(self, params, nodes):
    dtype = nodes[0].dtype
    stacked = jnp.stack(nodes, axis=-1)  # [..., C, n]
    if self.weight_method == "attn":
      w = jax.nn.softmax(params["wsm"].astype(dtype))
      return jnp.sum(stacked * w, axis=-1)
    if self.weight_method == "fastattn":
      w = jax.nn.relu(params["wsm"].astype(dtype))
      w = w / (jnp.sum(w) + 1e-4)
      return jnp.sum(stacked * w, axis=-1)
    if self.weight_method == "channel_attn":
      w = jax.nn.softmax(params["wsm"].astype(dtype), axis=0)  # [n, C]
      return jnp.einsum("...cn,nc->...c", stacked, w)
    if self.weight_method == "channel_fastattn":
      w = jax.nn.relu(params["wsm"].astype(dtype))
      w = w / (jnp.sum(w, axis=0) + 1e-4)  # [n, C]
      return jnp.einsum("...cn,nc->...c", stacked, w)
    if self.weight_method == "sum":
      return jnp.sum(stacked, axis=-1)
    raise ValueError(f"Unknown weight method {self.weight_method!r}")

  def apply(self, params, feats, feat_hw, train=False):
    """feats: list of node tensors; feat_hw: {level: (h, w)}. Appends new node."""
    nodes = []
    for i, offset in enumerate(self.inputs_offsets):
      layer = self.resample_layers[i]
      nodes.append(layer(params[layer.name], feats[offset],
                         feat_hw[self.feat_level], train))
    new_node = self._fuse(params, nodes)
    new_node = self.op_after_combine(
        params[self.op_after_combine.name], new_node, train)
    return feats + [new_node]


class FPNCell(Module):
  """One BiFPN cell: the full node DAG once."""

  def __init__(self, input_channels: list[int], config: Config, name="cell"):
    super().__init__(name)
    self.config = config
    self.fpn_config = config.fpn_config or fpn_configs.get_fpn_config(
        config.fpn_name, config.min_level, config.max_level,
        config.fpn_weight_method)
    channels = list(input_channels)
    self.fnodes = []
    for i, node in enumerate(self.fpn_config.nodes):
      fnode = FNode(
          node["feat_level"], node["inputs_offsets"], channels, config,
          weight_method=node.get("weight_method", self.fpn_config.weight_method),
          name=f"fnode{i}")
      self.fnodes.append(fnode)
      channels.append(config.fpn_num_filters)

  def init(self, key):
    return self.init_child(key, self.fnodes)

  def apply(self, params, feats, feat_hw, train=False):
    for fnode in self.fnodes:
      feats = fnode(params[fnode.name], feats, feat_hw, train)
    # Select, per level, the last node produced at that level.
    min_l, max_l = self.config.min_level, self.config.max_level
    out = []
    for level in range(min_l, max_l + 1):
      for i, node in enumerate(reversed(self.fpn_config.nodes)):
        if node["feat_level"] == level:
          out.append(feats[-1 - i])
          break
    return out


class FPNCells(Module):
  """BiFPN cell stack.

  Cell 0 consumes raw backbone channels (per-input 1x1 resample convs);
  cells 1..N-1 are structurally identical (uniform fpn_num_filters inputs,
  no resample convs) so their params are STACKED over a leading [N-1] axis
  under 'cells_rep' and the cells run under lax.scan — hundreds of small
  per-cell tensors become a handful of large stacked buffers (fix for the
  round-1 VMEM-prefetch stall, PERF_NOTES.md). BN updates thread through
  scan ys and are re-emitted stacked.
  """

  def __init__(self, input_channels: list[int], config: Config, name="fpn_cells"):
    super().__init__(name)
    num_levels = config.max_level - config.min_level + 1
    uniform = [config.fpn_num_filters] * num_levels
    self.cell0 = FPNCell(input_channels, config, name="cell_0")
    self.n_rep = config.fpn_cell_repeats - 1
    self.rep_cell = (FPNCell(uniform, config, name="cells_rep")
                     if self.n_rep > 0 else None)
    # kept for introspection/ckpt tooling
    self.cells = [self.cell0] + ([self.rep_cell] if self.rep_cell else [])

  def init(self, key):
    k0, kr = jax.random.split(key)
    params = {"cell_0": self.cell0.init(k0)}
    if self.rep_cell is not None:
      params["cells_rep"] = jax.vmap(self.rep_cell.init)(
          jax.random.split(kr, self.n_rep))
    return params

  def apply(self, params, feats, feat_hw, train=False):
    feats = self.cell0(params["cell_0"], feats, feat_hw, train)
    if self.rep_cell is None:
      return feats

    def body(carry, cell_params):
      out, state_updates = nn.run_and_collect_state(
          self.rep_cell, cell_params, list(carry), feat_hw, train)
      return tuple(out), state_updates

    carry, stacked_updates = jax.lax.scan(
        body, tuple(feats), params["cells_rep"], unroll=True)
    for path, value in stacked_updates.items():
      nn.record_state_abs(path, value)
    return list(carry)


class _PredictionNet(Module):
  """Shared conv tower across levels with per-level BN + prediction layer.

  TPU layout: the `repeats` identical conv(+BN) layers are STACKED — conv
  params live in one [R, ...] pytree under 'conv_stack' and the per-level BNs
  in [R, C] stacks under '{prefix}-bn-{level}' — and the tower runs under
  lax.scan. Round-1 profiling showed the D0 train step spending 47% of
  device time on VMEM prefetches of hundreds of small per-repeat tensors
  (PERF_NOTES.md); stacking turns those into a few large buffers. BN
  moving-stat updates are threaded through the scan ys (never through the
  Python collector inside the traced body) and re-emitted stacked.
  """

  def __init__(self, num_outputs: int, num_filters: int, repeats: int,
               num_levels: int, config: Config, predict_bias_init: float,
               conv_prefix: str, predict_name: str, name: str):
    super().__init__(name)
    self.repeats = repeats
    self.num_levels = num_levels
    self.min_level = config.min_level
    self.conv_prefix = conv_prefix
    self.act = L.activation_fn(config.act_type)
    self.survival_prob = config.survival_prob
    self.grad_checkpoint = config.get("grad_checkpoint", False)
    sep = config.separable_conv

    def make_conv(in_ch, out_ch, bias_init, nm):
      if sep:
        conv = L.SeparableConv2D(in_ch, out_ch, 3, 1, use_bias=True,
                                 bias_init_value=bias_init, name=nm)
        conv.depthwise.kernel_init = head_conv_kernel_init
        conv.pointwise.kernel_init = head_conv_kernel_init
      else:
        conv = L.Conv2D(in_ch, out_ch, 3, 1, use_bias=True,
                        kernel_init=head_dense_kernel_init,
                        bias_init_value=bias_init, name=nm)
      return conv

    # One prototype conv/BN per role; params are stacked over repeats.
    self.conv_proto = make_conv(num_filters, num_filters, 0.0, "conv_stack")
    self.bn_protos = [
        L.BatchNorm(num_filters, name=f"{conv_prefix}-bn-{config.min_level + lvl}")
        for lvl in range(num_levels)
    ]
    self.predict = make_conv(num_filters, num_outputs, predict_bias_init,
                             predict_name)

  def init(self, key):
    k_conv, k_bn, k_pred = jax.random.split(key, 3)
    params = {
        "conv_stack": jax.vmap(self.conv_proto.init)(
            jax.random.split(k_conv, self.repeats)),
        self.predict.name: self.predict.init(k_pred),
    }
    for lvl, bn in enumerate(self.bn_protos):
      params[bn.name] = jax.vmap(bn.init)(
          jax.random.split(jax.random.fold_in(k_bn, lvl), self.repeats))
    return params

  def apply(self, params, feats, train=False):
    outputs = []
    use_drop = train and self.survival_prob and nn.has_rng()
    base_key = nn.make_rng("head_drop") if use_drop else None
    for level_id in range(self.num_levels):
      x = feats[level_id]
      bn = self.bn_protos[level_id]

      def body(x, xs, bn=bn, level_id=level_id):
        conv_p, bn_p, i = xs

        def block(x):
          orig = x
          x = self.conv_proto(conv_p, x)
          # BN updates are returned as outputs (recording through the global
          # collector inside scan/remat traces would leak tracers).
          x, state_updates = nn.run_and_collect_state(bn, bn_p, x, train)
          x = self.act(x)
          if self.survival_prob:
            # drop_connect + residual apply together and ONLY for repeats
            # i > 0 (the i == 0 output has no bypass to survive through;
            # ref: efficientdet_keras.py:430-436).
            dropped = x
            if use_drop:
              key = jax.random.fold_in(
                  jax.random.fold_in(base_key, level_id), i)
              dropped = L.drop_connect_with_key(x, key, self.survival_prob)
            x = jnp.where(i > 0, dropped + orig, x)
          return x, state_updates

        if self.grad_checkpoint:
          block = jax.checkpoint(block)
        return block(x)

      xs = (params["conv_stack"], params[bn.name],
            jnp.arange(self.repeats, dtype=jnp.int32))
      x, stacked_updates = jax.lax.scan(body, x, xs, unroll=True)
      for path, value in stacked_updates.items():
        nn.record_state_abs(path, value)
      outputs.append(self.predict(params[self.predict.name], x))
    return outputs


class ClassNet(_PredictionNet):

  def __init__(self, config: Config, num_anchors: int, name="class_net"):
    bias = -math.log((1 - 0.01) / 0.01)
    super().__init__(
        num_outputs=config.num_classes * num_anchors,
        num_filters=config.fpn_num_filters,
        repeats=config.box_class_repeats,
        num_levels=config.max_level - config.min_level + 1,
        config=config, predict_bias_init=bias,
        conv_prefix="class", predict_name="class-predict", name=name)


class BoxNet(_PredictionNet):

  def __init__(self, config: Config, num_anchors: int, name="box_net"):
    super().__init__(
        num_outputs=4 * num_anchors,
        num_filters=config.fpn_num_filters,
        repeats=config.box_class_repeats,
        num_levels=config.max_level - config.min_level + 1,
        config=config, predict_bias_init=0.0,
        conv_prefix="box", predict_name="box-predict", name=name)


class SegmentationHead(Module):
  """U-Net-style decoder over BiFPN feats: transpose-conv up + skip concat
  (structure parity: tf2/efficientdet_keras.py:644-708)."""

  def __init__(self, config: Config, name="segmentation_head"):
    super().__init__(name)
    num_filters = config.fpn_num_filters
    self.act = L.activation_fn(config.act_type)
    self.num_up = config.max_level - config.min_level
    self.convs, self.bns = [], []
    in_ch = num_filters
    for level in range(self.num_up):
      self.convs.append(L.ConvTranspose2D(in_ch, num_filters, 3, 2,
                                          use_bias=False,
                                          name=f"con2d_t_{level}"))
      self.bns.append(L.BatchNorm(num_filters, name=f"bn_{level}"))
      in_ch = num_filters * 2  # after skip concat
    self.head = L.ConvTranspose2D(in_ch, config.seg_num_classes, 3, 2,
                                  name="head_transpose")

  def init(self, key):
    return self.init_child(key, [*self.convs, *self.bns, self.head])

  def apply(self, params, feats, train=False):
    x = feats[-1]
    skips = list(reversed(feats[:-1]))
    for conv, bn, skip in zip(self.convs, self.bns, skips):
      x = conv(params[conv.name], x)
      x = bn(params[bn.name], x, train)
      x = self.act(x)
      # tiny inputs can saturate pyramid sizes at 1; crop to the skip's size
      x = x[:, :skip.shape[1], :skip.shape[2]]
      x = jnp.concatenate([x, skip], axis=-1)
    return self.head(params[self.head.name], x)


class EfficientDet(Module):
  """Backbone -> resample P6..Pmax -> BiFPN cells -> class/box heads.

  apply(params, images, train) ->
    (cls_outputs, box_outputs): per-level lists [B,H,W,A*C] / [B,H,W,A*4].
  Use `flatten_predictions` for the flat [B, A_total, C] anchor-ordered form.
  """

  def __init__(self, config: Config, name: str | None = None):
    super().__init__(name or config.name)
    self.config = config
    from automl_tpu.configs import effnet_configs
    bcfg = effnet_configs.get_model_config(config.backbone_name).model
    bcfg.override(dict(
        act_fn=config.act_type,
        survival_prob=config.survival_prob or 0.8,
        num_classes=None,            # features only
        no_head=True,                # stem+blocks only (build_model_base)
        round_down_protect=True,     # efficientdet-family backbone rounding
    ), allow_new_keys=True)
    if config.backbone_config:
      bcfg.override(config.backbone_config, allow_new_keys=True)
    self.backbone = EfficientNet(bcfg, name="backbone")

    # Channels of backbone reductions 3..5 feeding the FPN.
    reduction_channels = {}
    red = 0
    blocks = self.backbone.blocks
    for idx, block in enumerate(blocks):
      if idx == len(blocks) - 1 or blocks[idx + 1].args.strides > 1:
        red += 1
        reduction_channels[red] = block.args.output_filters

    min_l, max_l = config.min_level, config.max_level
    input_channels = [reduction_channels[l] for l in range(min_l, 6)]
    self.resample_layers = []
    in_ch = reduction_channels[5]
    for level in range(6, max_l + 1):
      self.resample_layers.append(ResampleFeatureMap(
          in_ch, config.fpn_num_filters,
          apply_bn=config.apply_bn_for_resampling,
          conv_after_downsample=config.conv_after_downsample,
          name=f"resample_p{level}"))
      input_channels.append(config.fpn_num_filters)
      in_ch = config.fpn_num_filters

    self.fpn_cells = FPNCells(input_channels, config)
    heads = config.get("heads") or ["object_detection"]
    num_anchors = len(config.aspect_ratios) * config.num_scales
    self.class_net = self.box_net = self.seg_head = None
    if "object_detection" in heads:
      self.class_net = ClassNet(config, num_anchors)
      self.box_net = BoxNet(config, num_anchors)
    if "segmentation" in heads:
      self.seg_head = SegmentationHead(config)

  def init(self, key):
    children = [self.backbone, *self.resample_layers, self.fpn_cells]
    children += [c for c in (self.class_net, self.box_net, self.seg_head)
                 if c is not None]
    return self.init_child(key, children)

  def apply(self, params, images, train: bool = False):
    config = self.config
    policy = nn.get_policy()
    images = policy.cast_to_compute(images)
    endpoints = self.backbone(params["backbone"], images, train,
                              features_only=True)
    feats = [endpoints[f"reduction_{l}"]
             for l in range(config.min_level, 6)]
    for layer in self.resample_layers:
      h, w = feats[-1].shape[1], feats[-1].shape[2]
      feats.append(layer(params[layer.name], feats[-1],
                         ((h + 1) // 2, (w + 1) // 2), train))

    feat_hw = {}
    for level, f in zip(range(config.min_level, config.max_level + 1), feats):
      feat_hw[level] = (f.shape[1], f.shape[2])

    feats = self.fpn_cells(params["fpn_cells"], feats, feat_hw, train)
    outputs = []
    # Outputs stay in compute dtype (bf16): casting the dense per-level maps
    # to f32 here materializes ~1.4 GB extra HBM traffic per D0 step; the
    # loss/postprocess upcast per-element inside their fused kernels instead.
    if self.class_net is not None:
      outputs.append(self.class_net(params["class_net"], feats, train))
      outputs.append(self.box_net(params["box_net"], feats, train))
    if self.seg_head is not None:
      outputs.append(self.seg_head(params["segmentation_head"], feats, train))
    return tuple(outputs) if len(outputs) != 1 else outputs[0]


def flatten_predictions(level_outputs, channels_per_anchor: int):
  """Per-level [B,H,W,A*c] -> flat [B, total_anchors, c] in anchor order."""
  batch = level_outputs[0].shape[0]
  flat = [x.reshape(batch, -1, channels_per_anchor) for x in level_outputs]
  return jnp.concatenate(flat, axis=1)


def build_detection_model(model_name_or_config, **overrides) -> EfficientDet:
  from automl_tpu.configs import efficientdet_configs
  if isinstance(model_name_or_config, str):
    cfg = efficientdet_configs.get_efficientdet_config(model_name_or_config)
  else:
    cfg = model_name_or_config
  if overrides:
    cfg.override(overrides, allow_new_keys=True)
  return EfficientDet(cfg)
