"""Small shared utilities: image-size / feature-size math, pytree helpers.

Parity refs: parse_image_size/get_feat_sizes (efficientdet/utils.py:484-549).
"""

from __future__ import annotations

from typing import Tuple, Union

import jax
import jax.numpy as jnp


def parse_image_size(image_size: Union[str, int, Tuple[int, int]]) -> Tuple[int, int]:
  """Int, 'WxH' string, or (h, w) tuple -> (height, width)."""
  if isinstance(image_size, int):
    return (image_size, image_size)
  if isinstance(image_size, str):
    w, h = image_size.lower().split("x")
    return (int(h), int(w))
  if isinstance(image_size, (tuple, list)) and len(image_size) == 2:
    return tuple(int(v) for v in image_size)
  raise ValueError(f"Cannot parse image size {image_size!r}")


def get_feat_sizes(image_size, max_level: int) -> list[dict]:
  """Per-level (height, width): successive conv-stride-2 halvings (ceil)."""
  h, w = parse_image_size(image_size)
  feat_sizes = [{"height": h, "width": w}]
  for _ in range(1, max_level + 1):
    h, w = (h - 1) // 2 + 1, (w - 1) // 2 + 1
    feat_sizes.append({"height": h, "width": w})
  return feat_sizes


def num_params(params) -> int:
  return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))


def global_norm(tree) -> jnp.ndarray:
  leaves = [jnp.sum(jnp.square(x.astype(jnp.float32)))
            for x in jax.tree_util.tree_leaves(tree)]
  return jnp.sqrt(jnp.sum(jnp.stack(leaves)))


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
  """Turn on JAX's persistent compilation cache (XLA compiles of the big
  models take minutes on TPU; the reference's Estimator amortized graph
  builds the same way). Default dir: $JAX_COMPILATION_CACHE_DIR, else
  ~/.cache/automl_tpu/xla. Returns the dir used, or None on failure."""
  import os
  import jax
  cache_dir = (cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR")
               or os.path.join(os.path.expanduser("~"), ".cache",
                               "automl_tpu", "xla"))
  try:
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache every compile, not just the >1s ones (tiny-config smoke runs)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return cache_dir
  except Exception:
    return None
