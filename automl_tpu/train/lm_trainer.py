"""LM training: train step + runner (hero-equivalent training loop).

Parity refs:
  train_one_step       hero/model_lib.py:1332-1402 (value_and_grad, grad clip
                       by norm, update clip by norm/rms, decoupled weight
                       decay, manual param update)
  run_experiment loop  hero/model_lib.py:1475-1813 (config snapshot, ckpt
                       manager, metrics, validation)
  sharding             hero/config_lib.py:66-134 (GSPMD / data-parallel)
"""

from __future__ import annotations

import os
import time
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from automl_tpu.models import lm as lm_lib
from automl_tpu.train import optimizers as opt_lib
from automl_tpu.train import checkpoint as ckpt_lib
from automl_tpu.train.checkpoint import CheckpointManager


class LMTrainState(NamedTuple):
  step: jnp.ndarray
  params: Any
  opt_state: Any


def _rms(tree):
  leaves = [jnp.sum(jnp.square(x.astype(jnp.float32)))
            for x in jax.tree_util.tree_leaves(tree)]
  n = sum(x.size for x in jax.tree_util.tree_leaves(tree))
  return jnp.sqrt(sum(leaves) / max(n, 1))


def _per_leaf_diagnostics(prefix: str, tree) -> dict:
  """{'diag/<prefix>/<path>/{norm,rms}': scalar} for every leaf
  (hero's local norm/rms diagnostics, model_lib.py:1852-1888)."""
  out = {}
  for kp, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
    name = jax.tree_util.keystr(kp).replace("'", "").replace("]", "") \
        .replace("[", "/").strip("/")
    x = leaf.astype(jnp.float32)
    sq = jnp.sum(jnp.square(x))
    out[f"diag/{prefix}/{name}/norm"] = jnp.sqrt(sq)
    out[f"diag/{prefix}/{name}/rms"] = jnp.sqrt(sq / max(leaf.size, 1))
  return out


def make_lm_train_step(model: lm_lib.TransformerLM, tx,
                       grad_clip_norm: float = 1.0,
                       update_clip_rms: float = 0.0,
                       weight_decay: float = 0.0,
                       lr_fn=None, diagnostics: bool = False):
  """-> step(state, batch{'tokens' [B,T+1], 'loss_weights' opt}) -> (state, logs).

  Decoupled weight decay is lr-scaled as in the reference
  (hero/model_lib.py:1396-1400: params -= lr * (update + wd * params));
  pass lr_fn (step -> lr) so the decay follows the schedule. Without lr_fn
  the raw wd coefficient is applied (caller pre-scales).

  diagnostics=True adds hero's deep diagnostics (model_lib.py:1852-1888):
  global norm & rms of weights/grads/updates plus per-param norm/rms under
  diag/{weights,grads,updates}/<path>/{norm,rms}. All computed inside the
  jitted step (a handful of reductions — cheap next to the backward pass);
  the cost is in materializing/logging them, hence opt-in.
  """

  def train_step(state: LMTrainState, batch):
    tokens = batch["tokens"]
    inputs, targets = tokens[:, :-1], tokens[:, 1:]
    weights = batch.get("loss_weights")
    if weights is not None:
      weights = weights[:, 1:]
    segment_ids = batch.get("segment_ids")
    if segment_ids is not None:
      segment_ids = segment_ids[:, :-1]  # packed docs: no cross-doc attention
    causal_attention = batch.get("causal_attention")
    if causal_attention is not None:
      causal_attention = causal_attention[:, :-1]  # prefix-LM bidir markers

    aux_w = float(model.cfg.get("moe_aux_loss_weight", 0.0) or 0.0) \
        if model.cfg.get("moe_num_experts") else 0.0

    # False | True/"scan" (chunked scan, lm_loss_fused) | "pallas"
    # (ops/xent.py kernels, lm_loss_fused_pallas)
    fused = model.cfg.get("fused_softmax_loss", False)
    chunk = int(model.cfg.get("loss_chunk_size", 256))

    def loss_fn(params):
      if fused:
        # fused unembed+xent: the [B, T, V] logits never materialize
        hidden, _, aux = model(params, inputs, segment_ids=segment_ids,
                               causal_attention=causal_attention,
                               return_aux=True, return_hidden=True)
        if fused == "pallas":
          return lm_lib.lm_loss_fused_pallas(
              params, hidden, targets, model.cfg, weights) + aux_w * aux
        return lm_lib.lm_loss_fused(params, hidden, targets, model.cfg,
                                    weights, chunk) + aux_w * aux
      logits, _, aux = model(params, inputs, segment_ids=segment_ids,
                             causal_attention=causal_attention,
                             return_aux=True)
      return lm_lib.lm_loss(logits, targets, weights) + aux_w * aux

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    gnorm = optax.global_norm(grads)
    if grad_clip_norm:
      scale = jnp.minimum(1.0, grad_clip_norm / jnp.maximum(gnorm, 1e-9))
      grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    if update_clip_rms:
      def clip_rms(u):
        rms = jnp.sqrt(jnp.mean(jnp.square(u.astype(jnp.float32))) + 1e-12)
        return u * jnp.minimum(1.0, update_clip_rms / rms)
      updates = jax.tree_util.tree_map(clip_rms, updates)
    if weight_decay:
      wd = weight_decay * (lr_fn(state.step) if lr_fn is not None else 1.0)
      updates = jax.tree_util.tree_map(
          lambda u, p: u - wd * p, updates, state.params)
    params = optax.apply_updates(state.params, updates)
    logs = {"loss": loss, "gnorm": gnorm,
            "unorm": optax.global_norm(updates)}
    if diagnostics:
      logs.update({
          "wnorm": optax.global_norm(params), "wrms": _rms(params),
          "grms": _rms(grads), "urms": _rms(updates)})
      logs.update(_per_leaf_diagnostics("weights", params))
      logs.update(_per_leaf_diagnostics("grads", grads))
      logs.update(_per_leaf_diagnostics("updates", updates))
    return LMTrainState(state.step + 1, params, opt_state), logs

  return train_step


class SyntheticLMData:
  """Packed synthetic token batches (deterministic 'copy task' stream so the
  loss measurably drops — a trainability smoke signal, cf. hero tests)."""

  def __init__(self, batch_size: int, seq_len: int, vocab_size: int,
               seed: int = 0):
    self.rng = np.random.RandomState(seed)
    self.b, self.t, self.v = batch_size, seq_len, vocab_size

  def __iter__(self):
    while True:
      # repeated short pattern -> learnable next-token structure
      pattern = self.rng.randint(1, self.v, (self.b, 4))
      reps = (self.t + 1) // 4 + 1
      tokens = np.tile(pattern, (1, reps))[:, :self.t + 1]
      yield {"tokens": tokens.astype(np.int32)}


def make_lm_eval_step(model: lm_lib.TransformerLM):
  """-> eval_step(params, batch) -> (loss, total_weight) on held-out data
  (ref: hero/model_lib.py:1763-1809 validation loop)."""

  def eval_step(params, batch):
    tokens = batch["tokens"]
    inputs, targets = tokens[:, :-1], tokens[:, 1:]
    weights = batch.get("loss_weights")
    weights = weights[:, 1:] if weights is not None else jnp.ones(
        targets.shape, jnp.float32)
    segment_ids = batch.get("segment_ids")
    if segment_ids is not None:
      segment_ids = segment_ids[:, :-1]
    causal_attention = batch.get("causal_attention")
    if causal_attention is not None:
      causal_attention = causal_attention[:, :-1]
    logits, _ = model(params, inputs, segment_ids=segment_ids,
                      causal_attention=causal_attention)
    loss = lm_lib.lm_loss(logits, targets, weights)
    return loss, jnp.sum(weights)

  return eval_step


def write_sharding_artifact(params, path: str) -> None:
  """Step-0 per-param `path :: shape :: dtype :: sharding` text artifact
  (ref: hero/model_lib.py:1591-1639 logs the same map to TB at step 0)."""
  lines = []
  total = 0
  for kp, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
    name = jax.tree_util.keystr(kp).replace("'", "").replace("]", "") \
        .replace("[", "/").strip("/")
    total += int(np.prod(leaf.shape))
    sharding = getattr(leaf, "sharding", None)
    spec = getattr(sharding, "spec", sharding)
    lines.append(f"{name} :: {tuple(leaf.shape)} :: {leaf.dtype} :: {spec}")
  lines.append(f"total_params :: {total}")
  with open(path, "w") as f:
    f.write("\n".join(lines) + "\n")


def run_lm(config, model_dir: str, train_steps: int,
           sharding: Optional[lm_lib.ShardingConfig] = None,
           mesh_shape=None, dcn_mesh_shape=None, data_iter=None,
           log_every: int = 20,
           learning_rate: float = 1e-3, optimizer: str = "lion",
           lr_schedule: str = "cosine_decay", warmup_steps: int = 0,
           end_decay: float = 0.1, eval_iter=None, eval_every: int = 0,
           eval_steps: int = 8, ckpt_every: int = 0,
           deep_diagnostics: bool = False, seed: int = 0) -> dict:
  """Train a TransformerLM; GSPMD over a mesh when mesh_shape is given.

  Parity with hero run_experiment (model_lib.py:1475-1813): scheduled LR
  with warmup, periodic held-out validation (weight-averaged loss),
  per-step scalars to metrics.jsonl/TB, periodic + final checkpoints,
  step-0 params_sharding.txt artifact, opt-in deep diagnostics
  (deep_diagnostics=True -> global/per-param norm & rms of
  weights/grads/updates in metrics.jsonl).
  """
  from automl_tpu.parallel import create_mesh
  from automl_tpu.train import schedules
  from automl_tpu.train.metrics import MetricsWriter
  os.makedirs(model_dir, exist_ok=True)
  config.save_to_yaml(os.path.join(model_dir, "experiment_config.yaml"))

  mesh = (create_mesh(mesh_shape, dcn_mesh_shape=dcn_mesh_shape)
          if mesh_shape else None)
  sharding = sharding or (lm_lib.ShardingConfig() if mesh
                          else lm_lib.ShardingConfig.data_parallel())
  model = lm_lib.TransformerLM(config, sharding)
  warmup = warmup_steps or max(1, min(1000, train_steps // 10))
  lr_fn = schedules.lm_lr(lr_schedule, learning_rate,
                          num_train_steps=train_steps, warmup_steps=warmup,
                          end_decay=end_decay)

  def build():
    params = jax.jit(model.init)(jax.random.key(seed))
    tx = opt_lib.build_optimizer(optimizer, lr_fn)
    state = LMTrainState(jnp.zeros((), jnp.int32), params, tx.init(params))
    return tx, state

  ctx = jax.set_mesh(mesh) if mesh else None
  if ctx:
    ctx.__enter__()
  try:
    tx, state = build()
    mngr = CheckpointManager(os.path.join(model_dir, "ckpt"))
    restored = mngr.restore(state)
    if restored is not None:
      state = restored
    write_sharding_artifact(state.params,
                            os.path.join(model_dir, "params_sharding.txt"))
    step_fn = jax.jit(make_lm_train_step(
        model, tx, weight_decay=config.get("weight_decay", 0.0),
        lr_fn=lr_fn, diagnostics=deep_diagnostics))
    eval_fn = jax.jit(make_lm_eval_step(model))
    writer = MetricsWriter(model_dir)

    it = data_iter if data_iter is not None else iter(
        SyntheticLMData(config.get("batch_size", 8), config.seq_len,
                        config.vocab_size))
    logs = {}
    t0 = time.perf_counter()
    prev_t = t0
    step = int(jax.device_get(state.step))

    multiproc = jax.process_count() > 1
    if multiproc:
      # each process feeds its slice of the global batch; assemble one
      # globally-sharded array (ref: hero/model_lib.py:2410-2423)
      from automl_tpu.data.lm_pipeline import select_local_batch
      from automl_tpu.parallel import build_global_batch

    def device_batch(host_batch):
      """Host batch -> what the jitted fns accept (global array multiproc:
      a process-local jnp array cannot be placed against multi-host-sharded
      params)."""
      if multiproc:
        return build_global_batch(select_local_batch(host_batch), mesh)
      return {k: jnp.asarray(v) for k, v in host_batch.items()}

    def run_validation(step):
      """Weight-averaged held-out loss (incremental mean, as the ref)."""
      mean_loss, total_w = 0.0, 0.0
      # iter() restarts re-iterable loaders (fresh pass per validation, as
      # the ref's validation_set.repeat(1)); plain iterators stream on.
      for i, ebatch in enumerate(iter(eval_iter)):
        if i >= eval_steps:
          break
        loss, w = (float(x) for x in jax.device_get(
            eval_fn(state.params, device_batch(ebatch))))
        total_w += w
        mean_loss += (loss - mean_loss) * (w / max(total_w, 1e-6))
      writer.write(step, {"validation_loss": mean_loss,
                          "validation_weights": total_w})
      print(f"step {step} validation_loss {mean_loss:.4f}")
      return mean_loss

    while step < train_steps:
      batch = device_batch(next(it))
      with jax.profiler.StepTraceAnnotation("train", step_num=step):
        state, logs = step_fn(state, batch)
      step += 1
      if ckpt_every and step % ckpt_every == 0:
        mngr.save(step, ckpt_lib.state_for_save(state))
      if step % log_every == 0 or step == train_steps:
        l = {k: float(v) for k, v in jax.device_get(logs).items()}
        now = time.perf_counter()
        l["lr"] = float(lr_fn(step - 1))
        l["secs_per_step"] = (now - prev_t) / log_every
        l["tokens_per_sec"] = (batch["tokens"].shape[0] * config.seq_len
                               * log_every / max(now - prev_t, 1e-9))
        prev_t = now
        writer.write(step, l)
        print(f"step {step} loss {l['loss']:.4f} lr {l['lr']:.2e} "
              f"gnorm {l['gnorm']:.3f} ({l['tokens_per_sec']:.0f} tok/s)")
      if eval_iter is not None and eval_every and (
          step % eval_every == 0 or step == train_steps):
        logs = dict(logs)
        logs["validation_loss"] = run_validation(step)
    mngr.save(step, ckpt_lib.state_for_save(state))
    mngr.wait_until_finished()
    writer.close()
    return {k: float(v) for k, v in jax.device_get(logs).items()}
  finally:
    if ctx:
      ctx.__exit__(None, None, None)
