"""Mesh / sharding tests: hybrid ICI x DCN mesh, grouped cross-replica BN
via shard_map (TpuBatchNormalization semantics, efficientdet/utils.py:56-75)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from automl_tpu import nn
from automl_tpu.nn import layers as L
from automl_tpu.parallel import create_mesh, mesh_sharding, shard_batch


def test_hybrid_ici_dcn_mesh():
  # 8 devices = 2 DCN slices x 4-device ICI mesh (data=2, model=2)
  mesh = create_mesh((1, 2, 2), dcn_mesh_shape=(1, 2, 1))
  assert dict(mesh.shape) == {"replica": 1, "data": 4, "model": 2}
  x = jnp.arange(8.0).reshape(8, 1)
  sharded = jax.device_put(x, mesh_sharding(mesh, P(("replica", "data"))))
  # sharded over replica*data=4, replicated over model=2 -> all 8 devices
  assert len(sharded.sharding.device_set) == 8
  assert sharded.addressable_shards[0].data.shape == (2, 1)  # 8/4 rows each


def test_shard_batch_and_global_mean():
  mesh = create_mesh((1, 8, 1))
  batch = {"x": np.arange(16.0).reshape(16, 1)}
  sharded = shard_batch(mesh, batch)

  @jax.jit
  def mean(b):
    return jnp.mean(b["x"])

  np.testing.assert_allclose(float(mean(sharded)), 7.5)


def test_grouped_cross_replica_bn():
  """BN with axis_name + group_size=2 under shard_map: moments averaged
  within groups of 2 devices, not globally."""
  shard_map = getattr(jax, "shard_map", None)
  if shard_map is None:  # older jax
    from jax.experimental.shard_map import shard_map
  nn.set_policy("float32")
  try:
    mesh = create_mesh((1, 8, 1))
    bn = L.BatchNorm(2, axis_name="data", group_size=2, name="bn")
    params = bn.init(None)
    # per-device constant values 0..7: groups (0,1), (2,3), ...
    x = jnp.repeat(jnp.arange(8.0)[:, None, None, None], 2, axis=3)
    x = jnp.broadcast_to(x, (8, 4, 4, 2))

    def fn(params, x):
      out, stats = nn.run_and_collect_state(lambda: bn(params, x, train=True))
      return out

    out = shard_map(fn, mesh=mesh,
                    in_specs=(P(), P(("replica", "data"))),
                    out_specs=P(("replica", "data")))(params, x)
    out = np.asarray(out)
    # within a group, mean = (v0 + v1)/2; normalized values are +-1 * gamma/std
    # device 0 (value 0) and device 1 (value 1): group mean 0.5, var 0.25
    np.testing.assert_allclose(out[0, 0, 0, 0], (0 - 0.5) / np.sqrt(0.25 + 1e-3),
                               rtol=1e-4)
    np.testing.assert_allclose(out[1, 0, 0, 0], (1 - 0.5) / np.sqrt(0.25 + 1e-3),
                               rtol=1e-4)
    # device 2 belongs to the next group (values 2, 3): mean 2.5
    np.testing.assert_allclose(out[2, 0, 0, 0], (2 - 2.5) / np.sqrt(0.25 + 1e-3),
                               rtol=1e-4)
  finally:
    nn.set_policy("mixed_bfloat16")


def test_ring_attention_matches_dense():
  """Sequence-parallel ring attention over the 8-device mesh == dense
  causal attention, forward and gradients (a capability BEYOND the
  reference: hero never shards the sequence axis, config_lib.py:86-98)."""
  import functools
  from automl_tpu.ops.ring_attention import ring_attention_sharded
  from automl_tpu.parallel import create_mesh

  b, t, n, h = 2, 32, 2, 8  # T_local = 32/8 = 4 per device
  keys = jax.random.split(jax.random.key(0), 3)
  q, k, v = (jax.random.normal(kk, (b, t, n, h)) for kk in keys)
  mesh = create_mesh((1, 1, 8))

  def dense(q, k, v, logit_cap=0.0):
    s = jnp.einsum("bqnh,bknh->bqnk", q, k) * (h ** -0.5)
    if logit_cap:
      s = logit_cap * jnp.tanh(s / logit_cap)
    mask = jnp.arange(t)[None, :] <= jnp.arange(t)[:, None]
    s = jnp.where(mask[None, :, None, :], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqnk,bknh->bqnh", p, v)

  for cap in (0.0, 50.0):
    ring = functools.partial(ring_attention_sharded, mesh=mesh,
                             logit_cap=cap)
    out = jax.jit(ring)(q, k, v)
    want = dense(q, k, v, cap)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=2e-5, rtol=1e-4)

  # gradients flow through the ppermute ring
  g1 = jax.grad(lambda *a: jnp.sum(jnp.square(
      ring_attention_sharded(*a, mesh=mesh))), argnums=(0, 1, 2))(q, k, v)
  g2 = jax.grad(lambda *a: jnp.sum(jnp.square(dense(*a))),
                argnums=(0, 1, 2))(q, k, v)
  for a, b_ in zip(g1, g2):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                               atol=5e-5, rtol=1e-3)


def test_ring_attention_window_and_segments():
  """Ring attention with a sliding window and packed-segment masking ==
  dense with the same masks (segment ids ride the ring with K/V)."""
  import functools
  from automl_tpu.ops.ring_attention import ring_attention_sharded
  from automl_tpu.parallel import create_mesh

  b, t, n, h = 2, 32, 2, 8
  keys = jax.random.split(jax.random.key(3), 3)
  q, k, v = (jax.random.normal(kk, (b, t, n, h)) for kk in keys)
  seg = jnp.concatenate([jnp.zeros((b, 12), jnp.int32),
                         jnp.ones((b, 9), jnp.int32),
                         jnp.full((b, 11), 2, jnp.int32)], axis=1)
  mesh = create_mesh((1, 1, 8))

  def dense(q, k, v, window=None, seg=None):
    s = jnp.einsum("bqnh,bknh->bqnk", q, k) * (h ** -0.5)
    qi = jnp.arange(t)[:, None]
    kj = jnp.arange(t)[None, :]
    mask = (kj <= qi)
    if window:
      mask &= kj > qi - window
    mask = jnp.broadcast_to(mask[None], (b, t, t))
    if seg is not None:
      mask &= seg[:, :, None] == seg[:, None, :]
    s = jnp.where(mask[:, :, None, :], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqnk,bknh->bqnh", p, v)

  # window only (crosses device-chunk boundaries: T_local = 4, window 7)
  out = jax.jit(functools.partial(ring_attention_sharded, mesh=mesh,
                                  window=7))(q, k, v)
  np.testing.assert_allclose(np.asarray(out),
                             np.asarray(dense(q, k, v, window=7)),
                             atol=2e-5, rtol=1e-4)

  # segments only (doc boundaries not aligned to device chunks)
  out = jax.jit(lambda q, k, v, s: ring_attention_sharded(
      q, k, v, mesh, segment_ids=s))(q, k, v, seg)
  np.testing.assert_allclose(np.asarray(out),
                             np.asarray(dense(q, k, v, seg=seg)),
                             atol=2e-5, rtol=1e-4)

  # both
  out = jax.jit(lambda q, k, v, s: ring_attention_sharded(
      q, k, v, mesh, segment_ids=s, window=5))(q, k, v, seg)
  np.testing.assert_allclose(np.asarray(out),
                             np.asarray(dense(q, k, v, window=5, seg=seg)),
                             atol=2e-5, rtol=1e-4)


def test_pipeline_blocks_matches_sequential():
  """GPipe pipeline over 8 stages == sequential layer application,
  forward and gradients (autodiff reverses the ppermute schedule) —
  pipeline parallelism is absent from the reference entirely."""
  from automl_tpu.parallel import create_mesh
  from automl_tpu.parallel.pipeline import pipeline_blocks_sharded

  L, B, D = 16, 8, 12  # 2 layers per stage on the 8-device mesh
  keys = jax.random.split(jax.random.key(0), 2)
  params = {"w": 0.3 * jax.random.normal(keys[0], (L, D, D)),
            "b": 0.01 * jax.random.normal(keys[1], (L, D))}
  x = jax.random.normal(jax.random.key(2), (B, D))

  def block_fn(layer_params, h, extras):
    del extras
    out = jnp.tanh(h @ layer_params["w"] + layer_params["b"]) + h
    return out, jnp.sum(out ** 2) * 1e-3  # a per-layer aux, like MoE's

  def sequential(params, x):
    h = x
    for i in range(L):
      h, _ = block_fn(jax.tree_util.tree_map(lambda p: p[i], params), h,
                      None)
    return h

  def sequential_aux(params, x):
    h, aux = x, 0.0
    for i in range(L):
      h, a = block_fn(jax.tree_util.tree_map(lambda p: p[i], params), h,
                      None)
      aux += a
    return aux

  mesh = create_mesh((1, 1, 8))
  for m_micro in (2, 4, 8):
    run = jax.jit(lambda p, x: pipeline_blocks_sharded(
        x, p, block_fn=block_fn, mesh=mesh, num_microbatches=m_micro))
    got, got_aux = run(params, x)
    want = sequential(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
    # the threaded aux: per-microbatch aux averaged == full-batch aux for
    # this per-example-separable aux (sum over examples / M microbatches)
    np.testing.assert_allclose(float(got_aux),
                               float(sequential_aux(params, x)) / m_micro,
                               rtol=1e-4)

  def loss_pipe(p, x):
    out, aux = pipeline_blocks_sharded(
        x, p, block_fn=block_fn, mesh=mesh, num_microbatches=4)
    return jnp.sum(jnp.square(out)) + 0.0 * aux

  def loss_seq(p, x):
    return jnp.sum(jnp.square(sequential(p, x)))

  g1 = jax.jit(jax.grad(loss_pipe))(params, x)
  g2 = jax.grad(loss_seq)(params, x)
  for k in g1:
    np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g2[k]),
                               atol=1e-4, rtol=1e-4)
