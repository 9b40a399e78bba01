"""BiFPN / QuFPN node-DAG generation.

Graph-structure parity: efficientdet/tf2/fpn_configs.py:24-176. Node ids start
at the input features (one per level) and increase as fusion nodes are added;
each node fuses features from `inputs_offsets` at `feat_level`.
"""

from __future__ import annotations

import itertools

from automl_tpu.config import Config


def bifpn_config(min_level: int, max_level: int, weight_method=None) -> Config:
  """Bidirectional FPN: top-down path then bottom-up path."""
  p = Config(dict(weight_method=weight_method or "fastattn", nodes=[]))
  num_levels = max_level - min_level + 1
  node_ids = {min_level + i: [i] for i in range(num_levels)}
  id_cnt = itertools.count(num_levels)

  for i in range(max_level - 1, min_level - 1, -1):  # top-down
    p.nodes.append({
        "feat_level": i,
        "inputs_offsets": [node_ids[i][-1], node_ids[i + 1][-1]],
    })
    node_ids[i].append(next(id_cnt))
  for i in range(min_level + 1, max_level + 1):  # bottom-up
    p.nodes.append({
        "feat_level": i,
        "inputs_offsets": list(node_ids[i]) + [node_ids[i - 1][-1]],
    })
    node_ids[i].append(next(id_cnt))
  return p


def qufpn_config(min_level: int, max_level: int, weight_method=None) -> Config:
  """Quad-path FPN: (top-down->bottom-up) + (bottom-up->top-down) + quad-add."""
  p = Config(dict(weight_method=weight_method or "fastattn",
                  quad_method="fastattn", nodes=[]))
  num_levels = max_level - min_level + 1
  node_ids = {min_level + i: [i] for i in range(num_levels)}
  last = lambda lvl: node_ids[lvl][-1]
  first = lambda lvl: node_ids[lvl][0]
  id_cnt = itertools.count(num_levels)

  for i in range(max_level - 1, min_level - 1, -1):  # path 1: top-down
    p.nodes.append({"feat_level": i, "weight_method": p.weight_method,
                    "inputs_offsets": [last(i), last(i + 1)]})
    node_ids[i].append(next(id_cnt))
  node_ids[max_level].append(node_ids[max_level][-1])

  for i in range(min_level + 1, max_level):  # path 2: bottom-up
    p.nodes.append({"feat_level": i, "weight_method": p.weight_method,
                    "inputs_offsets": list(node_ids[i]) + [last(i - 1)]})
    node_ids[i].append(next(id_cnt))
  i = max_level
  p.nodes.append({"feat_level": i, "weight_method": p.weight_method,
                  "inputs_offsets": [first(i)] + [last(i - 1)]})
  node_ids[i].append(next(id_cnt))
  node_ids[min_level].append(node_ids[min_level][-1])

  for i in range(min_level + 1, max_level + 1):  # path 3: bottom-up (alt)
    p.nodes.append({
        "feat_level": i, "weight_method": p.weight_method,
        "inputs_offsets": [
            first(i),
            last(i - 1) if i != min_level + 1 else first(i - 1)],
    })
    node_ids[i].append(next(id_cnt))
  node_ids[min_level].append(node_ids[min_level][-1])

  for i in range(max_level - 1, min_level, -1):  # path 4: top-down (alt)
    p.nodes.append({
        "feat_level": i, "weight_method": p.weight_method,
        "inputs_offsets": [node_ids[i][0], node_ids[i][-1],
                           last(i + 1)],
    })
    node_ids[i].append(next(id_cnt))
  i = min_level
  p.nodes.append({"feat_level": i, "weight_method": p.weight_method,
                  "inputs_offsets": [node_ids[i][0], last(i + 1)]})
  node_ids[i].append(next(id_cnt))
  node_ids[max_level].append(node_ids[max_level][-1])

  for i in range(max_level, min_level - 1, -1):  # quad-add
    p.nodes.append({"feat_level": i, "weight_method": p.quad_method,
                    "inputs_offsets": [node_ids[i][2], node_ids[i][4]]})
    node_ids[i].append(next(id_cnt))
  return p


def get_fpn_config(fpn_name, min_level, max_level, weight_method) -> Config:
  fpn_name = fpn_name or "bifpn"
  builders = {"bifpn": bifpn_config, "qufpn": qufpn_config,
              "bifpn_dyn": bifpn_config}
  return builders[fpn_name](min_level, max_level, weight_method)
