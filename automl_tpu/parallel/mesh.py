"""Device mesh + sharding helpers: the framework's single distribution layer.

All parallelism (data / spatial / tensor / hybrid ICI+DCN) is expressed as a
named mesh + PartitionSpecs; XLA GSPMD inserts the collectives. This replaces
the reference's three distribution stacks (TPUEstimator+CrossShardOptimizer,
tf.distribute strategies, and hero's mesh code) with one.

Pattern refs: hero/model_lib.py:99-148 (hybrid ICI/DCN mesh, mesh_sharding).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec

DEFAULT_AXES = ("replica", "data", "model")


def create_mesh(mesh_shape: Sequence[int] | None = None,
                axis_names: Sequence[str] = DEFAULT_AXES,
                dcn_mesh_shape: Sequence[int] | None = None,
                devices=None) -> Mesh:
  """Create a named device mesh.

  mesh_shape entries may contain one -1 (filled with remaining devices).
  dcn_mesh_shape, when given, builds a hybrid ICI x DCN mesh for multi-slice
  (ref: hero/model_lib.py:109-124).
  """
  devices = devices if devices is not None else jax.devices()
  n = len(devices)
  if mesh_shape is None:
    mesh_shape = [1, n, 1][:len(axis_names)]
  mesh_shape = list(mesh_shape)
  if -1 in mesh_shape:
    known = math.prod(d for d in mesh_shape if d != -1)
    mesh_shape[mesh_shape.index(-1)] = n // known
  assert len(mesh_shape) == len(axis_names), (mesh_shape, axis_names)

  if dcn_mesh_shape is not None:
    try:
      device_array = mesh_utils.create_hybrid_device_mesh(
          mesh_shape, dcn_mesh_shape, devices=devices)
    except ValueError:
      # CPU-simulated devices have no slice_index attribute: emulate the
      # hybrid mesh by folding the DCN factors into the ICI axes.
      combined = [i * d for i, d in zip(mesh_shape, dcn_mesh_shape)]
      device_array = np.asarray(devices).reshape(combined)
  else:
    try:
      device_array = mesh_utils.create_device_mesh(
          mesh_shape, devices=devices)
    except (ValueError, AssertionError):
      device_array = np.asarray(devices).reshape(mesh_shape)
  return Mesh(device_array, axis_names)


def mesh_sharding(mesh: Mesh, pspec: PartitionSpec | None) -> NamedSharding:
  return NamedSharding(mesh, pspec if pspec is not None else PartitionSpec())


def shard_batch(mesh: Mesh, batch, axes=("replica", "data")):
  """Device_put a host batch sharded over the data axes (leading dim).

  Multi-process: `batch` holds only this process's rows (global_rows /
  process_count); the per-process shards are assembled into one globally
  sharded jax.Array (hero build_global_array pattern,
  ref: hero/model_lib.py:2410-2423)."""
  axes = tuple(a for a in axes if a in mesh.axis_names)
  if jax.process_count() > 1:
    from automl_tpu.parallel.distributed import build_global_batch
    return build_global_batch(batch, mesh, PartitionSpec(axes))
  sharding = NamedSharding(mesh, PartitionSpec(axes))
  return jax.tree_util.tree_map(
      lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree):
  """Broadcast host values to every device (every process holds the same
  value — required in multi-process runs, where device_put alone cannot
  target non-addressable devices)."""
  import numpy as np
  sharding = NamedSharding(mesh, PartitionSpec())
  if jax.process_count() > 1:
    def put(x):
      local = np.asarray(x)
      return jax.make_array_from_process_local_data(
          sharding, local, local.shape)
    return jax.tree_util.tree_map(put, tree)
  return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
