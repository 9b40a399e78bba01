"""Multi-process (multi-host / multi-slice) runtime support.

The reference reaches multi-host three ways (TF1 TPUEstimator PER_HOST_V2,
TF2 MultiWorkerMirroredStrategy, hero's jax multi-process run); here there is
exactly one: `initialize()` brings up the JAX distributed runtime, each
process feeds its local slice of the global batch (data/lm_pipeline.py
select_local_batch), and `build_global_array` assembles the per-process
shards into one globally-sharded jax.Array that any jitted step consumes.

Parity refs:
  hero/model_lib.py:2410-2423  build_global_array (device_put local shards ->
                               make_array_from_single_device_arrays)
  hero/data_lib.py:250-270     per-process batch slicing
  hero/main.py:27-46           mesh/dcn flags driving a multi-process run
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids: Optional[Sequence[int]] = None) -> None:
  """Bring up the JAX distributed runtime (no-op if single-process).

  With no arguments, honors the standard env vars
  (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID) or cloud
  auto-detection; explicit args win. Safe to call twice.
  """
  # AUTOML_TPU_PLATFORM=cpu forces the backend for subprocesses/tests:
  # on the axon TPU build the JAX_PLATFORMS env var is ignored, and
  # jax.config must be set before the backend initializes — this is the
  # one reliable pre-backend hook every CLI passes through.
  plat = os.environ.get("AUTOML_TPU_PLATFORM")
  if plat:
    jax.config.update("jax_platforms", plat)
  if coordinator_address is None:
    coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
  if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
    num_processes = int(os.environ["JAX_NUM_PROCESSES"])
  if process_id is None and os.environ.get("JAX_PROCESS_ID"):
    process_id = int(os.environ["JAX_PROCESS_ID"])
  if coordinator_address is None and num_processes is None:
    return  # single-process run
  # NOTE: must run before anything touches a jax backend (even
  # jax.process_count() would initialize one), so detect double-init by
  # the error instead of probing state.
  try:
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids)
  except RuntimeError as e:
    if "already" not in str(e):
      raise


def local_slice(global_batch_size: int) -> slice:
  """This process's contiguous rows of the global batch
  (ref: hero/data_lib.py:250-270)."""
  n, i = jax.process_count(), jax.process_index()
  assert global_batch_size % n == 0, (global_batch_size, n)
  per = global_batch_size // n
  return slice(i * per, (i + 1) * per)


def build_global_array(local_array, mesh: Mesh,
                       pspec: PartitionSpec = PartitionSpec(
                           ("replica", "data"))):
  """Per-process local batch shard -> one globally-sharded jax.Array.

  local_array holds only this process's rows (global_rows / process_count);
  the result behaves as the full global array, sharded over `mesh` by
  `pspec` (ref: hero/model_lib.py:2410-2423). Works single-process too,
  where it reduces to a device_put.
  """
  pspec = PartitionSpec(*[
      ax if isinstance(ax, tuple) else (ax,) for ax in pspec])
  sharding = NamedSharding(mesh, pspec)
  local = np.asarray(local_array)
  global_shape = (local.shape[0] * jax.process_count(),) + local.shape[1:]
  return jax.make_array_from_process_local_data(sharding, local, global_shape)


def build_global_batch(local_batch, mesh: Mesh,
                       pspec: PartitionSpec = PartitionSpec(
                           ("replica", "data"))):
  """Pytree version of build_global_array (any structure, not just dicts),
  so shard_batch accepts the same batch pytrees in single- and
  multi-process runs."""
  return jax.tree_util.tree_map(
      lambda v: build_global_array(v, mesh, pspec), local_batch)
