"""EfficientNet V1 / V2 / lite — one TPU-native implementation.

Covers the reference's three backbone families with a single block zoo:
  * MBConv (expand 1x1 -> depthwise -> SE -> project 1x1)
  * FusedMBConv (fused 3x3 expand conv -> SE -> project 1x1)
selected per block by the block-string `c` flag.

Behavioral parity references (math and hyperparameter semantics, not code):
  block-string codec   ref: efficientdet/backbone/efficientnet_builder.py:49-128,
                            efficientnetv2/effnetv2_configs.py:22-89
  compound scaling     ref: efficientdet/backbone/efficientnet_model.py:128-150,
                            efficientnetv2/utils.py:84-108
  MBConv / SE          ref: efficientdet/backbone/efficientnet_model.py:153-417,
                            efficientnetv2/effnetv2_model.py:105-307
  FusedMBConv          ref: efficientnetv2/effnetv2_model.py:313-407
  Stem / Head          ref: efficientnetv2/effnetv2_model.py:409-497
  stochastic depth     ref: efficientnetv2/effnetv2_model.py:620-628
  endpoints contract   ref: efficientnetv2/effnetv2_model.py:595-658 (reduction_1..5)
  lite variants        ref: efficientdet/backbone/efficientnet_lite_builder.py:33-102

TPU-first notes: NHWC + HWIO everywhere, bf16 compute / f32 params & BN stats,
static Python loop over blocks (XLA fuses per-block elementwise chains into the
convs), no data-dependent control flow.
"""

from __future__ import annotations

import dataclasses
import math
import re

import jax
import jax.numpy as jnp

from automl_tpu import nn
from automl_tpu.config import Config
from automl_tpu.nn import layers as L
from automl_tpu.nn.module import Module


# ---------------------------------------------------------------------------
# Block args codec.
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class BlockArgs:
  num_repeat: int
  kernel_size: int
  strides: int
  expand_ratio: int
  input_filters: int
  output_filters: int
  se_ratio: float | None = None
  conv_type: int = 0  # 0 = MBConv, 1 = FusedMBConv
  id_skip: bool = True


def decode_block_string(s: str) -> BlockArgs:
  """Decode 'r2_k3_s2_e4_i48_o64_se0.25[_c1][_noskip]'."""
  ops = s.split("_")
  kv = {}
  noskip = False
  for op in ops:
    if op == "noskip":
      noskip = True
      continue
    m = re.match(r"([a-z]+)([\d.]+)", op)
    if not m:
      raise ValueError(f"Cannot parse block-string op {op!r} in {s!r}")
    kv[m.group(1)] = m.group(2)
  strides = kv["s"]
  # v1 writes strides as 's11'/'s22'; v2 as 's1'/'s2'.
  stride = int(strides[0])
  if len(strides) == 2 and strides[0] != strides[1]:
    raise ValueError(f"Unequal strides unsupported: {s!r}")
  return BlockArgs(
      num_repeat=int(kv["r"]),
      kernel_size=int(kv["k"]),
      strides=stride,
      expand_ratio=int(kv["e"]),
      input_filters=int(kv["i"]),
      output_filters=int(kv["o"]),
      se_ratio=float(kv["se"]) if "se" in kv else None,
      conv_type=int(kv.get("c", 0)),
      id_skip=not noskip,
  )


def decode_block_strings(strings: list[str]) -> list[BlockArgs]:
  return [decode_block_string(s) for s in strings]


def round_filters(filters: int, width_coefficient: float | None,
                  depth_divisor: int = 8, min_depth: int | None = 8,
                  skip: bool = False, round_down_protect: bool = False) -> int:
  """Compound-scale channel count, snapped to the divisor (VPU-lane friendly).

  The reference has two subtly different versions: the efficientdet backbone
  adds a never-round-down-more-than-10% correction
  (efficientdet/backbone/efficientnet_model.py:139-142) that
  efficientnetv2/effnetv2_model.py:84-95 lacks. They produce different widths
  at width_coefficient=1.2 (b3). `round_down_protect` selects the variant.
  """
  if skip or not width_coefficient:
    return filters
  filters *= width_coefficient
  min_depth = min_depth or depth_divisor
  new_filters = max(min_depth,
                    int(filters + depth_divisor / 2) // depth_divisor * depth_divisor)
  if round_down_protect and new_filters < 0.9 * filters:
    new_filters += depth_divisor
  return int(new_filters)


def round_repeats(repeats: int, depth_coefficient: float | None,
                  skip: bool = False) -> int:
  if skip or not depth_coefficient:
    return repeats
  return int(math.ceil(depth_coefficient * repeats))


# ---------------------------------------------------------------------------
# Blocks.
# ---------------------------------------------------------------------------


class MBConvBlock(Module):
  """Mobile inverted bottleneck: expand -> depthwise -> SE -> project."""

  def __init__(self, args: BlockArgs, mcfg: Config, name: str):
    super().__init__(name)
    self.args = args
    self.conv_dropout = mcfg.get("conv_dropout")
    norm = lambda ch, g=1.0, nm="bn": L.build_norm(
        ch, mcfg.get("bn_type") or "bn", mcfg.bn_momentum, mcfg.bn_epsilon,
        gamma_init_value=g, name=nm)
    self.act = L.activation_fn(mcfg.act_fn)

    filters = args.input_filters * args.expand_ratio
    self.children = []
    if args.expand_ratio != 1:
      self.expand_conv = L.Conv2D(args.input_filters, filters, 1, name="expand_conv")
      self.norm0 = norm(filters, nm="norm0")
      self.children += [self.expand_conv, self.norm0]
    else:
      self.expand_conv = None
    self.depthwise = L.DepthwiseConv2D(filters, args.kernel_size, args.strides,
                                       name="depthwise_conv2d")
    self.norm1 = norm(filters, nm="norm1")
    self.children += [self.depthwise, self.norm1]
    if mcfg.get("use_se", True) and args.se_ratio and 0 < args.se_ratio <= 1:
      reduced = max(1, int(args.input_filters * args.se_ratio))
      self.se = L.SqueezeExcite(filters, reduced, mcfg.act_fn, name="se")
      self.children.append(self.se)
    else:
      self.se = None
    self.project_conv = L.Conv2D(filters, args.output_filters, 1, name="project_conv")
    self.norm2 = norm(args.output_filters, nm="norm2")
    self.children += [self.project_conv, self.norm2]

  def init(self, key):
    return self.init_child(key, self.children)

  def apply(self, params, x, train=False, survival_prob=None):
    inputs = x
    if self.expand_conv is not None:
      x = self.act(self.norm0(params["norm0"],
                              self.expand_conv(params["expand_conv"], x), train))
    x = self.act(self.norm1(params["norm1"],
                            self.depthwise(params["depthwise_conv2d"], x), train))
    if self.conv_dropout and self.args.expand_ratio > 1:
      x = L.dropout(x, train, self.conv_dropout)
    if self.se is not None:
      x = self.se(params["se"], x)
    x = self.norm2(params["norm2"],
                   self.project_conv(params["project_conv"], x), train)
    if (self.args.id_skip and self.args.strides == 1
        and self.args.input_filters == self.args.output_filters):
      x = L.drop_connect(x, train, survival_prob)
      x = x + inputs
    return x


class FusedMBConvBlock(Module):
  """Fused MBConv: single kxk conv does expand+spatial, then SE + project."""

  def __init__(self, args: BlockArgs, mcfg: Config, name: str):
    super().__init__(name)
    self.args = args
    self.conv_dropout = mcfg.get("conv_dropout")
    norm = lambda ch, nm: L.build_norm(
        ch, mcfg.get("bn_type") or "bn", mcfg.bn_momentum, mcfg.bn_epsilon, name=nm)
    self.act = L.activation_fn(mcfg.act_fn)

    filters = args.input_filters * args.expand_ratio
    self.children = []
    if args.expand_ratio != 1:
      self.expand_conv = L.Conv2D(args.input_filters, filters,
                                  args.kernel_size, args.strides, name="expand_conv")
      self.norm0 = norm(filters, "norm0")
      self.children += [self.expand_conv, self.norm0]
      project_kernel, project_strides = 1, 1
    else:
      self.expand_conv = None
      project_kernel, project_strides = args.kernel_size, args.strides
    if mcfg.get("use_se", True) and args.se_ratio and 0 < args.se_ratio <= 1:
      reduced = max(1, int(args.input_filters * args.se_ratio))
      self.se = L.SqueezeExcite(filters, reduced, mcfg.act_fn, name="se")
      self.children.append(self.se)
    else:
      self.se = None
    self.project_conv = L.Conv2D(filters, args.output_filters, project_kernel,
                                 project_strides, name="project_conv")
    self.norm1 = norm(args.output_filters, "norm1")
    self.children += [self.project_conv, self.norm1]

  def init(self, key):
    return self.init_child(key, self.children)

  def apply(self, params, x, train=False, survival_prob=None):
    inputs = x
    if self.expand_conv is not None:
      x = self.act(self.norm0(params["norm0"],
                              self.expand_conv(params["expand_conv"], x), train))
    if self.conv_dropout and self.args.expand_ratio > 1:
      x = L.dropout(x, train, self.conv_dropout)
    if self.se is not None:
      x = self.se(params["se"], x)
    x = self.norm1(params["norm1"],
                   self.project_conv(params["project_conv"], x), train)
    if self.expand_conv is None:
      x = self.act(x)
    if (self.args.id_skip and self.args.strides == 1
        and self.args.input_filters == self.args.output_filters):
      x = L.drop_connect(x, train, survival_prob)
      x = x + inputs
    return x


BLOCK_TYPES = {0: MBConvBlock, 1: FusedMBConvBlock}


class Stem(Module):

  def __init__(self, in_ch: int, stem_filters: int, mcfg: Config, name="stem"):
    super().__init__(name)
    self.conv = L.Conv2D(in_ch, stem_filters, 3, 2, name="conv2d")
    self.norm = L.build_norm(stem_filters, mcfg.get("bn_type") or "bn",
                             mcfg.bn_momentum, mcfg.bn_epsilon, name="norm")
    self.act = L.activation_fn(mcfg.act_fn)

  def init(self, key):
    return self.init_child(key, [self.conv, self.norm])

  def apply(self, params, x, train=False):
    return self.act(self.norm(params["norm"],
                              self.conv(params["conv2d"], x), train))


class Head(Module):

  def __init__(self, in_ch: int, feature_size: int, num_classes: int,
               mcfg: Config, name="head"):
    super().__init__(name)
    self.conv = L.Conv2D(in_ch, feature_size, 1, 1, name="conv2d")
    self.norm = L.build_norm(feature_size, mcfg.get("bn_type") or "bn",
                             mcfg.bn_momentum, mcfg.bn_epsilon, name="norm")
    self.act = L.activation_fn(mcfg.act_fn)
    self.dropout_rate = mcfg.get("dropout_rate") or 0.0
    self.fc = (L.Dense(feature_size, num_classes, name="fc")
               if num_classes else None)

  def init(self, key):
    children = [self.conv, self.norm] + ([self.fc] if self.fc else [])
    return self.init_child(key, children)

  def apply(self, params, x, train=False):
    x = self.act(self.norm(params["norm"], self.conv(params["conv2d"], x), train))
    x = jnp.mean(x, axis=(1, 2))
    x = L.dropout(x, train, self.dropout_rate)
    if self.fc is not None:
      x = self.fc(params["fc"], x)
    return x


# ---------------------------------------------------------------------------
# Model.
# ---------------------------------------------------------------------------


def model_defaults() -> Config:
  """Model-section defaults (ref: efficientnetv2/hparams.py:221-244)."""
  return Config(dict(
      model_name="efficientnetv2-s",
      blocks_args=None,          # list[str] block strings
      width_coefficient=1.0,
      depth_coefficient=1.0,
      dropout_rate=0.2,
      survival_prob=0.8,
      bn_type=None,              # None/'bn' | 'tpu_bn' | 'gn'
      bn_momentum=0.9,
      bn_epsilon=1e-3,
      gn_groups=8,
      depth_divisor=8,
      min_depth=8,
      act_fn="silu",
      feature_size=1280,
      num_classes=1000,
      conv_dropout=None,
      use_se=True,               # lite models disable SE entirely
      round_down_protect=False,  # True for efficientdet-family backbones
      fix_head_stem=False,       # lite models: don't scale stem/head filters
      in_channels=3,
  ))


class EfficientNet(Module):
  """EfficientNet V1/V2/lite classifier & detection backbone.

  apply(params, images, train) -> logits                       (num_classes set)
  apply(params, images, train, features_only=True) -> endpoints dict with
    'features' and 'reduction_1'..'reduction_5' (stride 2..32 feature maps).
  """

  def __init__(self, mcfg: Config, name: str | None = None):
    super().__init__(name or mcfg.model_name)
    self.cfg = mcfg
    wc, dc = mcfg.width_coefficient, mcfg.depth_coefficient
    div, mind = mcfg.depth_divisor, mcfg.min_depth
    protect = bool(mcfg.get("round_down_protect", False))
    blocks_args = [decode_block_string(s) if isinstance(s, str) else s
                   for s in mcfg.blocks_args]

    stem_filters = round_filters(blocks_args[0].input_filters, wc, div, mind,
                                 skip=mcfg.fix_head_stem,
                                 round_down_protect=protect)
    self.stem = Stem(mcfg.in_channels, stem_filters, mcfg)

    self.blocks: list[Module] = []
    for i, args in enumerate(blocks_args):
      # First block consumes the STEM's actual output. With fix_head_stem
      # (lite) the stem is unscaled while round_filters(input) would scale:
      # the reference's lazily-built TF layers absorb the mismatch by
      # building on actual shapes (efficientnet_model.py:512-513,653-659);
      # with explicit param shapes we must pin block 0 to the stem width
      # (lite3: stem 32 vs scaled 40 — caught by the round-5 ladder bench).
      a = dataclasses.replace(
          args,
          input_filters=stem_filters if i == 0 else
          round_filters(args.input_filters, wc, div, mind,
                        round_down_protect=protect),
          output_filters=round_filters(args.output_filters, wc, div, mind,
                                       round_down_protect=protect),
          num_repeat=round_repeats(
              args.num_repeat, dc,
              skip=mcfg.fix_head_stem and i in (0, len(blocks_args) - 1)),
      )
      block_cls = BLOCK_TYPES[a.conv_type]
      self.blocks.append(block_cls(a, mcfg, name=f"blocks_{len(self.blocks)}"))
      if a.num_repeat > 1:
        rest = dataclasses.replace(a, input_filters=a.output_filters, strides=1)
        for _ in range(a.num_repeat - 1):
          self.blocks.append(
              block_cls(rest, mcfg, name=f"blocks_{len(self.blocks)}"))

    if mcfg.get("no_head"):
      # Detection backbones are stem+blocks only (ref: build_model_base,
      # efficientdet/backbone/efficientnet_builder.py:292-318).
      self.head = None
    else:
      head_in = self.blocks[-1].args.output_filters
      feature_size = round_filters(mcfg.feature_size or 1280, wc, div, mind,
                                   skip=mcfg.fix_head_stem,
                                   round_down_protect=protect)
      self.head = Head(head_in, feature_size, mcfg.num_classes, mcfg)

  def init(self, key):
    children = [self.stem, *self.blocks]
    if self.head is not None:
      children.append(self.head)
    return self.init_child(key, children)

  def apply(self, params, x, train: bool = False, features_only: bool = False):
    policy = nn.get_policy()
    x = policy.cast_to_compute(x)
    endpoints = {}
    x = self.stem(params["stem"], x, train)
    endpoints["stem"] = x
    reduction_idx = 0
    base_sp = self.cfg.survival_prob
    n = len(self.blocks)
    for idx, block in enumerate(self.blocks):
      is_reduction = (idx == n - 1) or (self.blocks[idx + 1].args.strides > 1)
      survival_prob = None
      if base_sp:
        survival_prob = 1.0 - (1.0 - base_sp) * float(idx) / n
      x = block(params[block.name], x, train, survival_prob)
      if is_reduction:
        reduction_idx += 1
        endpoints[f"reduction_{reduction_idx}"] = x
    endpoints["features"] = x
    if features_only:
      return endpoints
    if self.head is None:
      raise ValueError("Backbone built with no_head=True supports only "
                       "features_only=True")
    logits = self.head(params["head"], x, train)
    return policy.cast_to_output(logits)

  def num_params(self, params) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))


def build_model(model_name_or_cfg, **overrides) -> EfficientNet:
  """Build from a named config ('efficientnetv2-s', 'efficientnet-b0', ...)."""
  from automl_tpu.configs import effnet_configs  # lazy: registry import
  if isinstance(model_name_or_cfg, str):
    mcfg = effnet_configs.get_model_config(model_name_or_cfg).model
  else:
    mcfg = model_name_or_cfg
  if overrides:
    mcfg.override(overrides, allow_new_keys=True)
  return EfficientNet(mcfg)
