"""Pipeline parallelism (GPipe schedule) over a named mesh axis.

NOT present in the reference (SURVEY §2.7: hero scans all layers on every
device, hero/model_lib.py:1057-1076) — this extends the framework beyond
reference parity: layer memory per device drops by the stage count, so
model depth scales with chips even without tensor parallelism.

Design (TPU-native, everything inside one jit):
- The stacked layer parameters [L, ...] are sharded over `axis_name`
  (stage s holds layers [s*L/S, (s+1)*L/S)). Inside shard_map each device
  scans only its own layers — weights never move.
- Activations flow the ring: the input batch is split into M microbatches;
  on schedule tick t, stage s processes microbatch (t - s) and passes the
  result to stage s+1 with a neighbor ppermute (ICI-friendly: constant
  payload, no all-to-all). The pipeline drains after M + S - 1 ticks, with
  the classic GPipe bubble fraction (S-1)/(M+S-1).
- Backward is pure autodiff: jax reverses the fori_loop and transposes
  each ppermute, which IS the reverse pipeline schedule — no hand-written
  backward pass.

Embedding / final norm / logits run outside (they are cheap and stay under
plain GSPMD); only the transformer-block stack is pipelined.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _stage_scan(block_fn, stage_params, x, extras):
  """Apply this stage's layers (scan over the local layer slice).

  block_fn(layer_params, h, extras) -> (h, aux_scalar); aux (e.g. the MoE
  load-balance loss) is summed over the stage's layers."""
  def body(h, layer_params):
    h, aux = block_fn(layer_params, h, extras)
    return h, aux
  out, layer_auxs = jax.lax.scan(body, x, stage_params)
  return out, jnp.sum(layer_auxs)


def pipeline_blocks(x, stage_params, extras=None, *, block_fn,
                    axis_name: str, num_microbatches: int):
  """Run a stack of layers pipelined over `axis_name` stages.

  Call inside shard_map. x: [B, ...] input activations (replicated across
  stages — every device sees the full batch and injects at stage 0);
  stage_params: this stage's [L/S, ...] layer-param slice.
  extras: optional pytree of per-example side inputs with leading dim B
  (masks, positions); each stage slices the microbatch it is currently
  processing and hands it to block_fn(layer_params, h, extras_mb), which
  returns (h, aux_scalar).
  Returns ([B, ...] outputs, aux) — both valid on every device (the last
  stage's results are broadcast back with a psum). aux is the per-layer
  aux (e.g. MoE load-balance loss) summed over layers/stages and averaged
  over microbatches: each microbatch routes independently, so the
  pipelined aux is the mean of per-microbatch auxes rather than one
  full-batch aux — the same estimator GShard's per-group routing uses.

  B must be divisible by num_microbatches.
  """
  s_count = jax.lax.axis_size(axis_name)
  me = jax.lax.axis_index(axis_name)
  b = x.shape[0]
  m = num_microbatches
  assert b % m == 0, (b, m)
  mb = b // m
  # [M, mb, ...] microbatch stream
  stream = x.reshape((m, mb) + x.shape[1:])
  extras_stream = jax.tree_util.tree_map(
      lambda e: e.reshape((m, mb) + e.shape[1:]), extras)

  perm = [(j, (j + 1) % s_count) for j in range(s_count)]
  ticks = m + s_count - 1

  def tick(t, carry):
    recv, ys, aux_acc = carry
    # stage 0 injects microbatch t (clamped; out-of-range ticks process
    # garbage that never gets stored), others consume what the previous
    # stage sent last tick
    inject = stream[jnp.minimum(t, m - 1)]
    act = jnp.where(me == 0, inject, recv)
    # stage s processes microbatch (t - s): slice its side inputs
    my_idx = jnp.clip(t - me, 0, m - 1)
    extras_mb = jax.tree_util.tree_map(
        lambda e: jax.lax.dynamic_index_in_dim(e, my_idx, 0,
                                               keepdims=False),
        extras_stream)
    out, aux = _stage_scan(block_fn, stage_params, act, extras_mb)
    # aux only counts while this stage processes a real microbatch
    # (t - s in [0, M)); bubble ticks chew on garbage
    valid = jnp.logical_and(t - me >= 0, t - me < m)
    aux_acc = aux_acc + jnp.where(valid, aux, 0.0)
    # last stage stores its finished microbatch (valid when
    # 0 <= t - (S-1) < M)
    done_idx = t - (s_count - 1)
    store = jnp.logical_and(me == s_count - 1,
                            jnp.logical_and(done_idx >= 0, done_idx < m))
    idx = jnp.clip(done_idx, 0, m - 1)
    updated = jax.lax.dynamic_update_slice(
        ys, out[None], (idx,) + (0,) * out.ndim)
    ys = jnp.where(store, updated, ys)
    recv = jax.lax.ppermute(out, axis_name, perm)
    return recv, ys, aux_acc

  recv0 = jnp.zeros_like(stream[0])
  ys0 = jnp.zeros_like(stream)
  # derive from the (batch-sharded) input so the initial carry already has
  # x's varying-axes type (see CLAUDE.md: shard_map loop carries must match
  # vma types)
  aux0 = jnp.sum(stream[0].astype(jnp.float32)) * 0.0
  if hasattr(jax.lax, "pvary"):
    # the carry becomes device-varying over the stage axis inside the loop
    # (me / ppermute); the initial carry must carry the same vma type
    recv0 = jax.lax.pvary(recv0, axis_name)
    ys0 = jax.lax.pvary(ys0, axis_name)
    aux0 = jax.lax.pvary(aux0, axis_name)
  _, ys, aux_acc = jax.lax.fori_loop(0, ticks, tick, (recv0, ys0, aux0))
  # results live on the last stage; broadcast to all stages
  ys = jax.lax.psum(jnp.where(me == s_count - 1, ys, jnp.zeros_like(ys)),
                    axis_name)
  # aux: sum over stages (each stage holds its layers' aux), mean over
  # microbatches
  aux_total = jax.lax.psum(aux_acc, axis_name) / m
  return ys.reshape(x.shape), aux_total


def pipeline_blocks_sharded(x, stacked_params, extras=None, *, block_fn,
                            mesh, stage_axis: str = "model",
                            batch_axes=("replica", "data"),
                            num_microbatches: int):
  """shard_map wrapper: stacked_params [L, ...] sharded over `stage_axis`;
  x / extras stay BATCH-SHARDED over `batch_axes` (each data-parallel row
  of the mesh pipelines only its own batch shard — dp x pp composes).
  L must be divisible by the stage count; the per-shard batch by
  num_microbatches. Returns (outputs, aux) — aux is averaged over the
  data-parallel batch shards (each shard's pipeline computes its own)."""
  from jax.sharding import PartitionSpec as P
  shard_map = getattr(jax, "shard_map", None)
  if shard_map is None:  # older jax
    from jax.experimental.shard_map import shard_map
  x_spec = P(batch_axes)
  param_specs = jax.tree_util.tree_map(lambda _: P(stage_axis), stacked_params)
  extra_specs = jax.tree_util.tree_map(lambda _: x_spec, extras)

  def fn(x, stacked_params, extras):
    out, aux = pipeline_blocks(x, stacked_params, extras, block_fn=block_fn,
                               axis_name=stage_axis,
                               num_microbatches=num_microbatches)
    # mean over the data-parallel shards so aux matches the dense
    # formulation's batch-mean semantics
    for ax in batch_axes:
      aux = jax.lax.pmean(aux, ax)
    return out, aux

  return shard_map(fn, mesh=mesh,
                   in_specs=(x_spec, param_specs, extra_specs),
                   out_specs=(x_spec, P()))(x, stacked_params, extras)
