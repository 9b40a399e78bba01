"""Benchmark suite: device-busy timings for the BASELINE.json config list.

Prints one JSON line per workload (bench.py stays the driver's single-line
D0-inference contract):
  d0_train        EfficientDet-D0 512^2 b16 full train step (BASELINE north star)
  effnetv2s_train EfficientNetV2-S 300^2 b32 train step (BASELINE config #3)
  d4_train        EfficientDet-D4 1024^2 b4 train step (BASELINE config #4)
  d7x_infer       EfficientDet-D7x 1536^2 b1 infer + postprocess (config #5)
  d7x_lion_train  EfficientDet-D7x 1536^2 b1 Lion train step (config #5)
  lm_train        234M LM train step b8 T2048 Lion (Pallas flash fwd/bwd)
  lm_decode       234M LM KV-cache generation b8 (prefill 128 + 896 tokens)

Usage: python bench_suite.py [workload ...]   (default: all)
Timings are device-busy via profiler timestamps (the chip sits behind a
shared tunnel; wall clock is unreliable — see bench.py docstring).
"""

import json
import sys
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from bench import device_busy_ms_per_call

PROFILED_CALLS = 6

# Measured sustained bf16 matmul throughput on THIS chip (the matmul_peak
# workload below; best shape of the sweep, device-busy). Used as the MFU
# denominator for every bench row: an *achieved-peak* anchor is honest on an
# experimental backend whose nominal spec is unpublished. Re-run
# `python bench_suite.py matmul_peak` to refresh.
PEAK_TFLOPS_BF16 = 190.7  # round-4 on-chip sweep: 187.4 / 190.7 / 186.8
                          # TFLOP/s at n=2048/4096/8192 (8-dot chains,
                          # device-busy) — consistent with a v5e-class
                          # nominal ~197 TFLOP/s bf16


def _step_flops(jitted_fn, *example_args) -> float:
  """XLA's own FLOP count for one compiled call (cost_analysis), or 0.0."""
  try:
    lowered = jitted_fn.lower(*example_args)
    analysis = lowered.compile().cost_analysis()
    if isinstance(analysis, (list, tuple)):
      analysis = analysis[0]
    return float((analysis or {}).get("flops", 0.0))
  except Exception:
    return 0.0


def _mfu_fields(flops_per_step: float, ms_per_step: float) -> dict:
  """tflops/s + MFU vs the measured matmul anchor (omitted if unanchored)."""
  if not flops_per_step or not ms_per_step:
    return {}
  tflops = flops_per_step / (ms_per_step / 1e3) / 1e12
  out = {"model_tflops_per_s": round(tflops, 2),
         "flops_per_step": flops_per_step}
  if PEAK_TFLOPS_BF16:
    out["mfu"] = round(tflops / PEAK_TFLOPS_BF16, 4)
  return out


def bench_matmul_peak():
  """Chip-peak anchor: sustained bf16 matmul TFLOP/s (f32 accumulation).

  Eight chained [N,N]x[N,N] dots per jit call (data-dependent, so XLA can't
  elide any) amortize dispatch; device-busy per call / flops -> TFLOP/s.
  The best shape across the sweep is the MFU denominator for every other
  bench row.
  """
  results = {}
  best = 0.0
  chain = 8
  for n in (2048, 4096, 8192):
    a0 = jax.random.normal(jax.random.key(0), (n, n), jnp.bfloat16)
    bs = [jax.random.normal(jax.random.key(i + 1), (n, n), jnp.bfloat16)
          for i in range(chain)]

    @jax.jit
    def run(a, bs):
      x = a
      for b in bs:
        x = jnp.matmul(x, b, preferred_element_type=jnp.float32)
        x = x.astype(jnp.bfloat16)
      return x

    out = run(a0, bs)
    jax.block_until_ready(out)
    args = [(jax.random.normal(jax.random.key(100 + i), (n, n),
                               jnp.bfloat16), bs)
            for i in range(PROFILED_CALLS)]
    with tempfile.TemporaryDirectory() as d:
      ms = device_busy_ms_per_call(run, args, d)
    tflops = chain * 2 * n**3 / (ms / 1e3) / 1e12
    results[f"n{n}_tflops_per_s"] = round(tflops, 1)
    best = max(best, tflops)
  return {"metric": "matmul_peak_bf16", "value": round(best, 1),
          "unit": "TFLOP/s (device-busy, f32 accum)", **results}


def _det_train_step(model_name: str, batch: int, overrides=None):
  from automl_tpu import nn
  from automl_tpu.configs.efficientdet_configs import get_efficientdet_config
  from automl_tpu.models.efficientdet import EfficientDet
  from automl_tpu.train import optimizers as opt_lib
  from automl_tpu.train import train_lib

  nn.set_policy("mixed_bfloat16")
  cfg = get_efficientdet_config(model_name)
  if overrides:
    cfg.override(overrides)
  model = EfficientDet(cfg)
  params = jax.jit(model.init)(jax.random.key(0))
  tx = opt_lib.masked_for_params(
      opt_lib.build_optimizer(
          cfg.optimizer if cfg.optimizer != "sgd" else "momentum", 1e-3,
          momentum=cfg.momentum), params)
  state = train_lib.create_train_state(params, tx)
  step_fn = jax.jit(train_lib.make_det_train_step(model, tx, cfg))

  from automl_tpu.utils import parse_image_size
  size = parse_image_size(cfg.image_size)[0]
  g = cfg.max_instances_per_image

  def make_batch(i):
    key = jax.random.key(i)
    boxes = jnp.tile(jnp.asarray([[10.0, 10.0, size * 0.4, size * 0.4],
                                  [size * 0.3] * 4]), (batch, g // 2, 1))[:, :g]
    classes = jnp.tile(jnp.asarray([1, 2], jnp.int32), (batch, g // 2))[:, :g]
    return {"image": jax.random.normal(key, (batch, size, size, 3)),
            "gt_boxes": boxes, "gt_classes": classes}

  rng = jax.random.key(7)
  # one warmup compile + distinct batches for the profiled calls
  state, _ = step_fn(state, make_batch(0), rng)
  jax.block_until_ready(state.params)
  args = []
  for i in range(PROFILED_CALLS):
    args.append((state, make_batch(i + 1), rng))
  flops = _step_flops(step_fn, state, make_batch(0), rng)
  return (lambda s, b, r: step_fn(s, b, r)[1]["loss"]), args, flops


def bench_d0_train():
  fn, args, flops = _det_train_step("efficientdet-d0", 16)
  with tempfile.TemporaryDirectory() as d:
    ms = device_busy_ms_per_call(fn, args, d)
  return {"metric": "d0_train_img_per_s", "value": round(16 / ms * 1000, 1),
          "unit": "img/s", "ms_per_step": round(ms, 2), "batch": 16,
          **_mfu_fields(flops, ms)}


def bench_d4_train():
  fn, args, flops = _det_train_step("efficientdet-d4", 4)
  with tempfile.TemporaryDirectory() as d:
    ms = device_busy_ms_per_call(fn, args, d)
  return {"metric": "d4_train_img_per_s", "value": round(4 / ms * 1000, 1),
          "unit": "img/s", "ms_per_step": round(ms, 2), "batch": 4,
          **_mfu_fields(flops, ms)}


def bench_effnetv2s_train():
  from automl_tpu import nn
  from automl_tpu.configs.effnet_configs import get_model_config
  from automl_tpu.models import build_model
  from automl_tpu.train import optimizers as opt_lib
  from automl_tpu.train import train_lib

  nn.set_policy("mixed_bfloat16")
  cfg = get_model_config("efficientnetv2-s")
  batch, size = 32, 300  # published train_size for v2-s (effnetv2_configs.py)
  model = build_model(cfg.model)
  params = jax.jit(model.init)(jax.random.key(0))
  tx = opt_lib.masked_for_params(
      opt_lib.build_optimizer("rmsprop", 1e-3), params)
  state = train_lib.create_train_state(params, tx)
  step_fn = jax.jit(train_lib.make_cls_train_step(model, tx, cfg))

  def make_batch(i):
    return {"image": jax.random.normal(jax.random.key(i), (batch, size, size, 3)),
            "label": jax.nn.one_hot(jnp.arange(batch) % cfg.model.num_classes,
                                    cfg.model.num_classes)}

  rng = jax.random.key(7)
  state, _ = step_fn(state, make_batch(0), rng)
  jax.block_until_ready(state.params)
  args = [(state, make_batch(i + 1), rng) for i in range(PROFILED_CALLS)]
  flops = _step_flops(step_fn, state, make_batch(0), rng)
  with tempfile.TemporaryDirectory() as d:
    ms = device_busy_ms_per_call(
        lambda s, b, r: step_fn(s, b, r)[1]["loss"], args, d)
  return {"metric": "effnetv2s_train_img_per_s",
          "value": round(batch / ms * 1000, 1), "unit": "img/s",
          "ms_per_step": round(ms, 2), "batch": batch, "image_size": size,
          **_mfu_fields(flops, ms)}


def bench_d7x_infer():
  from automl_tpu import nn
  from automl_tpu.models.efficientdet import build_detection_model
  from automl_tpu.ops import postprocess

  nn.set_policy("mixed_bfloat16")
  model = build_detection_model("efficientdet-d7x")
  params = jax.jit(model.init)(jax.random.key(0))

  @jax.jit
  def infer(params, images):
    cls_out, box_out = model(params, images, train=False)
    return postprocess.postprocess_global(model.config, cls_out, box_out)

  def img(i):
    return jax.random.normal(jax.random.key(i), (1, 1536, 1536, 3))

  out = infer(params, img(0))
  jax.block_until_ready(out)
  args = [(params, img(i + 1)) for i in range(PROFILED_CALLS)]
  flops = _step_flops(infer, params, img(0))
  with tempfile.TemporaryDirectory() as d:
    ms = device_busy_ms_per_call(infer, args, d)
  return {"metric": "d7x_infer_latency_b1", "value": round(ms, 2),
          "unit": "ms", "fps": round(1000 / ms, 2),
          "vs_baseline_v100_ms": 153, **_mfu_fields(flops, ms)}


def _det_infer_ms(model_name: str, batch: int):
  """Device-busy ms/call for infer + full on-device postprocess at the
  model's native image size. Returns (ms, flops, image_size)."""
  from automl_tpu import nn
  from automl_tpu.models.efficientdet import build_detection_model
  from automl_tpu.ops import postprocess
  from automl_tpu.utils import parse_image_size

  nn.set_policy("mixed_bfloat16")
  model = build_detection_model(model_name)
  params = jax.jit(model.init)(jax.random.key(0))
  size = parse_image_size(model.config.image_size)[0]

  @jax.jit
  def infer(params, images):
    cls_out, box_out = model(params, images, train=False)
    return postprocess.postprocess_global(model.config, cls_out, box_out)

  def img(i):
    return jax.random.normal(jax.random.key(i), (batch, size, size, 3))

  jax.block_until_ready(infer(params, img(0)))
  args = [(params, img(i + 1)) for i in range(PROFILED_CALLS)]
  flops = _step_flops(infer, params, img(0))
  with tempfile.TemporaryDirectory() as d:
    ms = device_busy_ms_per_call(infer, args, d)
  return ms, flops, size


# BASELINE.md V100 end-to-end rows (efficientdet/README.md:85-95): batch-1
# latency ms and batch-8 FPS (no-TensorRT column); lite rows are Pixel-class
# mobile latencies (README.md:114-121) — recorded for reference, not ratio.
_V100_ROWS = {
    "efficientdet-d0": (10.2, 209), "efficientdet-d1": (13.5, 140),
    "efficientdet-d2": (17.7, 97), "efficientdet-d3": (28.0, 58),
    "efficientdet-d4": (42.8, 35), "efficientdet-d5": (72.5, 18),
    "efficientdet-d6": (92.8, None), "efficientdet-d7": (122.0, None),
    "efficientdet-d7x": (153.0, None),
}


def bench_det_ladder():
  """Every BASELINE.md detection row on-chip (verdict r4 #3): b1 latency +
  b8 throughput (+MFU) for the d0-d7x family and lite0-4, and train rows
  where the batch fits. OOM/compile failures are recorded per row."""
  rows = []

  def _try(fn, **tag):
    try:
      rows.append({**tag, **fn()})
    except Exception as e:
      rows.append({**tag, "error": f"{type(e).__name__}: {str(e)[:200]}"})
    print("ROW", json.dumps(rows[-1]), flush=True)  # survive tunnel death

  infer_models = [f"efficientdet-d{i}" for i in (0, 1, 2, 3, 4, 5, 6, 7)] + [
      f"efficientdet-lite{i}" for i in range(5)]
  for name in infer_models:
    v100_b1, v100_b8 = _V100_ROWS.get(name, (None, None))

    def b1(name=name, v100=v100_b1):
      ms, flops, size = _det_infer_ms(name, 1)
      r = {"ms_b1": round(ms, 2), "fps_b1": round(1000 / ms, 1),
           "image_size": size, **_mfu_fields(flops, ms)}
      if v100:
        r["vs_baseline_v100_b1"] = round(v100 / ms, 2)
      return r

    _try(b1, model=name, kind="infer")
    if v100_b8 or "lite" in name:  # b8 rows where the baseline has one
      def b8(name=name, v100=v100_b8):
        ms, flops, size = _det_infer_ms(name, 8)
        r = {"ms_b8": round(ms, 2), "img_per_s_b8": round(8000 / ms, 1),
             **_mfu_fields(flops, ms)}
        if v100:
          r["vs_baseline_v100_b8"] = round((8000 / ms) / v100, 2)
        return r
      _try(b8, model=name, kind="infer_b8")

  # train rows at batches that fit one chip (d0 b16 / d4 b4 / d7x b1 are
  # standing bench rows; these fill the gaps)
  for name, batch in [("efficientdet-d1", 8), ("efficientdet-d2", 8),
                      ("efficientdet-d3", 4), ("efficientdet-d5", 2),
                      ("efficientdet-d6", 1)]:
    def tr(name=name, batch=batch):
      fn, args, flops = _det_train_step(name, batch)
      with tempfile.TemporaryDirectory() as d:
        ms = device_busy_ms_per_call(fn, args, d)
      return {"ms_per_step": round(ms, 2), "batch": batch,
              "img_per_s": round(batch / ms * 1000, 1),
              **_mfu_fields(flops, ms)}
    _try(tr, model=name, kind="train")

  return {"metric": "det_ladder", "rows": rows}


def bench_d7x_lion_train():
  fn, args, flops = _det_train_step("efficientdet-d7x", 1,
                                    overrides=dict(optimizer="lion",
                                                   grad_checkpoint=True))
  with tempfile.TemporaryDirectory() as d:
    ms = device_busy_ms_per_call(fn, args, d)
  return {"metric": "d7x_lion_train_img_per_s",
          "value": round(1 / ms * 1000, 2), "unit": "img/s",
          "ms_per_step": round(ms, 2), "batch": 1, **_mfu_fields(flops, ms)}


def _lm_analytic_train_flops(cfg, batch: int) -> float:
  """Analytic train-step FLOPs for the LM bench.

  XLA's cost_analysis counts a lax.scan body ONCE (not x n_layers) and
  counts Pallas custom calls as zero, so it under-reports the scanned,
  flash-attention LM by ~4x — use the standard accounting instead:
  matmul flops fwd = 2 * (matmul params touched per token); attention fwd
  = 2 dots x 2*T*(T/2 causal)*n*h per layer; backward = 2x forward
  (remat recomputation excluded, per the usual MFU convention)."""
  d, L, T = cfg.model_dim, cfg.n_layers, cfg.seq_len
  n, h, nkv = cfg.n_heads, cfg.head_dim, cfg.n_kv_heads
  ffn_hidden = cfg.expand_factor * d
  ffn_mats = 3 if cfg.use_gated_ffn else 2
  per_layer = (d * n * h + 2 * d * nkv * h + n * h * d
               + ffn_mats * d * ffn_hidden)
  logits = d * cfg.vocab_size  # tied embed: one logits matmul
  dot_fwd = 2 * (L * per_layer + logits) * batch * T
  attn_fwd = L * batch * (2 * 2 * T * (T / 2) * n * h)
  return 3.0 * (dot_fwd + attn_fwd)


def _lm_model(use_flash: bool = True, **overrides):
  from automl_tpu.models import lm as lm_lib
  cfg = lm_lib.lm_defaults()
  cfg.update(dict(model_dim=1024, n_layers=12, n_heads=8, n_kv_heads=8,
                  head_dim=128, vocab_size=32000, seq_len=2048,
                  use_flash_attention=use_flash, **overrides))
  model = lm_lib.TransformerLM(cfg, lm_lib.ShardingConfig.data_parallel())
  params = jax.jit(model.init)(jax.random.key(0))
  return cfg, model, params


def bench_lm_train():
  """234M-param LM train step b8 T2048 Lion (+ Pallas flash fwd/bwd).

  Runs the round-5 measured-best b8 composition: flash_block_k=1024 +
  fused flash backward (both defaults) + remat_policy='dots_flash'
  (246.9 ms / 54.1% MFU; split-bwd dots_flash 257.9 / 51.8, 'dots'
  alone 266.4 / 50.2, full recompute 284.2 / 47.0 — PERF_NOTES round
  5). dots_flash fits at b8 (10.32 GiB temp HBM); large-batch runs
  need fused_softmax_loss."""
  from automl_tpu.train import lm_trainer, optimizers as opt_lib

  cfg, model, params = _lm_model(remat_policy="dots_flash")
  tx = opt_lib.build_optimizer("lion", 1e-3)
  state = lm_trainer.LMTrainState(jnp.zeros((), jnp.int32), params,
                                  tx.init(params))
  step_fn = jax.jit(lm_trainer.make_lm_train_step(model, tx))

  def make_batch(i):
    toks = jax.random.randint(jax.random.key(i), (8, cfg.seq_len + 1),
                              0, cfg.vocab_size)
    return {"tokens": toks}

  state, _ = step_fn(state, make_batch(0))
  jax.block_until_ready(state.params)
  args = [(state, make_batch(i + 1)) for i in range(PROFILED_CALLS)]
  flops = _lm_analytic_train_flops(cfg, 8)
  with tempfile.TemporaryDirectory() as d:
    ms = device_busy_ms_per_call(
        lambda s, b: step_fn(s, b)[1]["loss"], args, d)
  toks = 8 * cfg.seq_len
  return {"metric": "lm234m_train_tok_per_s",
          "value": round(toks / ms * 1000), "unit": "tok/s",
          "ms_per_step": round(ms, 2), "batch": 8, "seq_len": cfg.seq_len,
          **_mfu_fields(flops, ms)}


def bench_lm_decode():
  """234M-param LM KV-cache decode: b8, prefill 128, 896 generated tokens."""
  from automl_tpu.models.lm import greedy_generate

  cfg, model, params = _lm_model(use_flash=False)  # decode is step-wise
  new_tokens = 896

  @jax.jit
  def gen(params, prompt):
    return greedy_generate(model, params, prompt, new_tokens)

  def prompt(i):
    return jax.random.randint(jax.random.key(i), (8, 128), 0, cfg.vocab_size)

  out = gen(params, prompt(0))
  jax.block_until_ready(out)
  args = [(params, prompt(i + 1)) for i in range(PROFILED_CALLS)]
  with tempfile.TemporaryDirectory() as d:
    ms = device_busy_ms_per_call(gen, args, d)
  toks = 8 * new_tokens
  return {"metric": "lm234m_decode_tok_per_s",
          "value": round(toks / ms * 1000), "unit": "tok/s",
          "ms_per_call": round(ms, 2), "batch": 8,
          "prefill": 128, "new_tokens": new_tokens}


def bench_lm_decode_int8():
  """Same decode workload with int8-quantized weights (half the HBM reads)."""
  from automl_tpu.models.lm import greedy_generate, quantize_lm_params

  cfg, model, params = _lm_model(use_flash=False)
  params = quantize_lm_params(params)
  new_tokens = 896

  @jax.jit
  def gen(params, prompt):
    return greedy_generate(model, params, prompt, new_tokens)

  def prompt(i):
    return jax.random.randint(jax.random.key(i), (8, 128), 0, cfg.vocab_size)

  out = gen(params, prompt(0))
  jax.block_until_ready(out)
  args = [(params, prompt(i + 1)) for i in range(PROFILED_CALLS)]
  with tempfile.TemporaryDirectory() as d:
    ms = device_busy_ms_per_call(gen, args, d)
  toks = 8 * new_tokens
  return {"metric": "lm234m_decode_int8_tok_per_s",
          "value": round(toks / ms * 1000), "unit": "tok/s",
          "ms_per_call": round(ms, 2), "batch": 8,
          "prefill": 128, "new_tokens": new_tokens}


def bench_lm_spec_decode():
  """Speculative decoding economics at B=1 (the latency case), measured.

  Random weights can't exhibit a realistic draft acceptance rate, so this
  reports the measured pieces an operator needs instead of a fantasy tok/s:
    * plain_tok_per_s     — 234M greedy decode baseline (B=1)
    * ceiling_tok_per_s   — speculative with the target AS ITS OWN draft
                            (acceptance == 1): the chunk-verify mechanism's
                            upper bound including all bookkeeping
    * draft_ms/chunk_ms/step_ms — per-forward device costs (27M draft
                            single step, 234M (k+1)-chunk verify, 234M
                            single step)
    * breakeven_accept    — leading-acceptance probability where the 27M
                            draft starts paying: solves
                            E[advance](p) * step_ms =
                            (k+1)*draft_ms + chunk_ms
  """
  from automl_tpu.models import lm as lm_lib
  from automl_tpu.models.lm import greedy_generate
  from automl_tpu.models.speculative import speculative_generate

  cfg, model, params = _lm_model(use_flash=False)
  k, new_tokens = 4, 256

  dcfg = lm_lib.lm_defaults()
  dcfg.update(dict(model_dim=512, n_layers=4, n_heads=8, n_kv_heads=8,
                   head_dim=64, vocab_size=32000, seq_len=2048,
                   use_flash_attention=False))
  draft = lm_lib.TransformerLM(dcfg, lm_lib.ShardingConfig.data_parallel())
  draft_params = jax.jit(draft.init)(jax.random.key(1))

  def prompt(i):
    return jax.random.randint(jax.random.key(i), (1, 128), 0, cfg.vocab_size)

  @jax.jit
  def gen_plain(params, p):
    return greedy_generate(model, params, p, new_tokens)

  @jax.jit
  def gen_self(params, p):
    return speculative_generate(model, params, model, params, p,
                                new_tokens, n_draft=k)

  out = {"metric": "lm234m_spec_decode", "batch": 1, "n_draft": k,
         "new_tokens": new_tokens}
  with tempfile.TemporaryDirectory() as d:
    jax.block_until_ready(gen_plain(params, prompt(0)))
    args = [(params, prompt(i + 1)) for i in range(PROFILED_CALLS)]
    plain_ms = device_busy_ms_per_call(gen_plain, args, d)
  out["plain_tok_per_s"] = round(new_tokens / plain_ms * 1000)
  out["step_ms"] = round(plain_ms / new_tokens, 3)
  with tempfile.TemporaryDirectory() as d:
    jax.block_until_ready(gen_self(params, prompt(0)))
    args = [(params, prompt(i + 1)) for i in range(PROFILED_CALLS)]
    self_ms = device_busy_ms_per_call(gen_self, args, d)
  out["ceiling_tok_per_s"] = round(new_tokens / self_ms * 1000)

  # per-iteration costs of the real draft/verify pieces (prefill excluded:
  # caches are pre-built outside the timed functions)
  S = 128 + k + 2
  kvp = jnp.arange(S)[None]
  p0 = prompt(0)
  d_cache = draft.init_cache(1, S)
  _, d_cache = draft(draft_params, p0, cache=d_cache, cache_index=0,
                     kv_positions=kvp)
  t_cache = model.init_cache(1, S)
  _, t_cache = model(params, p0, cache=t_cache, cache_index=0,
                     kv_positions=kvp)

  @jax.jit
  def draft_iter(dp, cache, tok):  # k+1 single-token draft forwards
    def body(c, j):
      cache, tok = c
      lg, cache = draft(dp, tok[:, None],
                        positions=jnp.full((1, 1), 127 + j, jnp.int32),
                        cache=cache, cache_index=127 + j, kv_positions=kvp)
      return (cache, jnp.argmax(lg[:, 0], -1).astype(jnp.int32)), ()
    (cache, tok), _ = jax.lax.scan(body, (cache, tok), jnp.arange(k + 1))
    return tok

  @jax.jit
  def chunk_verify(params, cache, chunk):  # one (k+1)-wide target forward
    lg, _ = model(params, chunk, positions=127 + jnp.arange(k + 1)[None],
                  cache=cache, cache_index=127, kv_positions=kvp)
    return jnp.argmax(lg, -1)

  tok0 = p0[:, -1]
  with tempfile.TemporaryDirectory() as d:
    jax.block_until_ready(draft_iter(draft_params, d_cache, tok0))
    args = [(draft_params, d_cache, tok0)] * PROFILED_CALLS
    dm = device_busy_ms_per_call(draft_iter, args, d)
  out["draft_iter_ms"] = round(dm, 3)
  chunk = jnp.ones((1, k + 1), jnp.int32)
  with tempfile.TemporaryDirectory() as d:
    jax.block_until_ready(chunk_verify(params, t_cache, chunk))
    args = [(params, t_cache, chunk)] * PROFILED_CALLS
    cm = device_busy_ms_per_call(chunk_verify, args, d)
  out["chunk_verify_ms"] = round(cm, 3)

  # E[advance] at leading-accept prob a: sum_{j=0..k-1} a^j + a^k (bonus)
  # = (1-a^k)/(1-a) + a^k; the draft pays once E[advance] * step_ms >=
  # iteration cost = draft_iter_ms + chunk_verify_ms.
  import numpy as _np
  step = plain_ms / new_tokens
  iter_cost = dm + cm
  for a in _np.arange(0.05, 1.0, 0.0025):
    adv = (1 - a ** k) / (1 - a) + a ** k
    if adv * step >= iter_cost:
      out["breakeven_accept"] = round(float(a), 3)
      break
  else:
    out["breakeven_accept"] = None
  return out


def _device_busy_total_ms(fn, trace_dir) -> float:
  """Total device-busy ms across ALL module executions of one fn() call
  (serve loops make many jit calls; per-call averaging is meaningless)."""
  import glob
  with jax.profiler.trace(trace_dir):
    out = fn()
    jax.block_until_ready(out)
  from jax.profiler import ProfileData
  path = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))[-1]
  pd = ProfileData.from_file(path)
  total = 0.0
  for plane in pd.planes:
    if "TPU" not in plane.name:
      continue
    for line in plane.lines:
      if line.name == "XLA Modules":
        for ev in line.events:
          total += (ev.end_ns - ev.start_ns) / 1e6
  if total == 0.0:
    raise RuntimeError("no device events captured")
  return total


def _device_module_events(fn, trace_dir):
  """Run fn() under the profiler; return ordered [(module_name, ms)] for
  every device module execution (start-time order)."""
  import glob
  with jax.profiler.trace(trace_dir):
    out = fn()
    jax.block_until_ready(out)
  from jax.profiler import ProfileData
  path = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))[-1]
  pd = ProfileData.from_file(path)
  events = []
  for plane in pd.planes:
    if "TPU" not in plane.name:
      continue
    for line in plane.lines:
      if line.name == "XLA Modules":
        for ev in line.events:
          events.append((ev.start_ns, ev.name,
                         (ev.end_ns - ev.start_ns) / 1e6))
  events.sort()
  return [(name, ms) for _, name, ms in events]


def _pct(xs, p):
  xs = sorted(xs)
  return xs[min(len(xs) - 1, int(p / 100 * len(xs)))]


def bench_lm_serve():
  """Continuous batching vs static batching, 234M, 8 slots — throughput
  AND device-latency distributions (verdict r3 #4).

  24 requests with heterogeneous budgets (32/64/128/256 new tokens,
  prompts 32-128). Static batching (the reference's only serving shape,
  hero/model_lib.py sample_decode: fixed batch, everyone padded to the
  longest prompt and decoded to the largest budget) pays for the
  stragglers; the slot server frees capacity the moment a request's
  budget is done.

  Latency is priced in DEVICE time (wall clock through the shared tunnel
  is unreliable): the server records a device-call timeline + the call
  index after which each request's first/last token exists; the profiler
  gives every module execution's device duration in order; TTFT /
  completion = cumulative device time up to those indices. Static TTFT
  for batch j = full time of batches 1..j-1 + batch j's prefill part
  (measured separately).
  """
  from automl_tpu.inference.lm_server import GenRequest, LMServer
  from automl_tpu.models.lm import greedy_generate

  cfg, model, params = _lm_model(use_flash=False)
  budgets = [32, 64, 128, 256] * 6
  plens = [32, 64, 96, 128] * 6
  prompts = [jax.random.randint(jax.random.key(i), (n,), 0, cfg.vocab_size)
             for i, n in enumerate(plens)]
  useful = sum(budgets)

  server = LMServer(model, params, max_batch=8, max_seq_len=512, burst=16)
  reqs = [GenRequest(p, m) for p, m in zip(prompts, budgets)]
  server.serve(reqs)  # compile prefill buckets + decode burst
  with tempfile.TemporaryDirectory() as d:
    events = _device_module_events(
        lambda: server.serve(reqs)[-1].tokens, d)
  serve_ms = sum(ms for _, ms in events)

  # align the server's timeline with the profiled model-call events (the
  # in-between eager ops are tiny host/dispatch executables; model calls
  # are the jitted prefill / chunk_prefill / _decode_burst modules)
  call_ms = [ms for name, ms in events
             if "prefill" in name or "decode_burst" in name]
  lat = {}
  if len(call_ms) == len(server.timeline):
    cum = np.cumsum([0.0] + call_ms)
    ttfts, comps = [], []
    for i in range(len(reqs)):
      ev = server.request_events[i]
      ttfts.append(float(cum[ev["first"]]))
      comps.append(float(cum[ev["done"]]))
    lat = {"serve_ttft_ms_p50": round(_pct(ttfts, 50), 1),
           "serve_ttft_ms_p95": round(_pct(ttfts, 95), 1),
           "serve_ttft_ms_max": round(max(ttfts), 1),
           "serve_completion_ms_p50": round(_pct(comps, 50), 1),
           "serve_completion_ms_p95": round(_pct(comps, 95), 1)}
  else:
    lat = {"latency_align_error":
           f"{len(call_ms)} call events vs {len(server.timeline)} timeline"}

  # static baseline: 3 batches of 8, padded to the batch max prompt,
  # decoded to the batch max budget — one compile (all groups same shape)
  pad_len, pad_new = max(plens), max(budgets)
  static = jnp.stack([jnp.pad(p, (0, pad_len - p.shape[0])) for p in prompts])

  @jax.jit
  def gen(params, toks):
    return greedy_generate(model, params, toks, pad_new)

  jax.block_until_ready(gen(params, static[:8]))
  def run_static():
    outs = [gen(params, static[i:i + 8]) for i in range(0, 24, 8)]
    return outs[-1]
  with tempfile.TemporaryDirectory() as d:
    static_ms = _device_busy_total_ms(run_static, d)

  # static latency: batch j's requests all wait for batches < j, then for
  # batch j's prefill (prefill part measured as one [8, pad_len] forward)
  @jax.jit
  def static_prefill(params, toks):
    cache = model.init_cache(8, pad_len + pad_new)
    pos = jnp.broadcast_to(jnp.arange(pad_len)[None], (8, pad_len))
    kv = jnp.broadcast_to(jnp.arange(pad_len + pad_new)[None],
                          (8, pad_len + pad_new))
    logits, cache = model(params, toks, positions=pos, cache=cache,
                          cache_index=0, kv_positions=kv)
    return logits[:, -1]
  jax.block_until_ready(static_prefill(params, static[:8]))
  with tempfile.TemporaryDirectory() as d:
    prefill_ms = _device_busy_total_ms(
        lambda: static_prefill(params, static[:8]), d)
  batch_ms = static_ms / 3.0
  s_ttfts = [i * batch_ms + prefill_ms for i in range(3) for _ in range(8)]
  s_comps = [(i + 1) * batch_ms for i in range(3) for _ in range(8)]
  lat.update({"static_ttft_ms_p50": round(_pct(s_ttfts, 50), 1),
              "static_ttft_ms_p95": round(_pct(s_ttfts, 95), 1),
              "static_ttft_ms_max": round(max(s_ttfts), 1),
              "static_completion_ms_p50": round(_pct(s_comps, 50), 1),
              "static_completion_ms_p95": round(_pct(s_comps, 95), 1)})

  return {"metric": "lm234m_serve_tok_per_s", "requests": 24, "slots": 8,
          "value": round(useful / serve_ms * 1000), "unit": "useful tok/s",
          "static_batching_tok_per_s": round(useful / static_ms * 1000),
          "speedup_vs_static": round(static_ms / serve_ms, 2),
          "serve_ms": round(serve_ms, 1), "static_ms": round(static_ms, 1),
          **lat}


def bench_lm_serve_long():
  """Long-context serving across the decode-kernel S gate (verdict r4 #6).

  The calibrated crossover says the Pallas decode kernel beats the rank-3
  XLA dots at S>~766 (PERF_NOTES round 4) — but the composed production
  path (continuous batching + chunked prefill + the gate actually
  flipping) had only ever been benchmarked at S=512, below the gate. This
  runs 16 requests with 768-1536-token prompts on a 2048-slot cache —
  comfortably above the gate — twice: once with the calibrated gate
  (kernel active) and once with the gate forced off (dots path), so the
  composed kernel win (or loss) at the S the kernel was built for is a
  measured number. TTFT/completion accounting identical to
  bench_lm_serve (device-time module alignment)."""
  from automl_tpu.inference.lm_server import GenRequest, LMServer

  plens = [768, 1024, 1280, 1536] * 4
  budgets = [128, 192, 256, 320] * 4
  useful = sum(budgets)
  prompts = [jax.random.randint(jax.random.key(i), (n,), 0, 32000)
             for i, n in enumerate(plens)]

  out = {"metric": "lm234m_serve_long_tok_per_s", "unit": "useful tok/s",
         "requests": len(plens), "slots": 8, "max_seq_len": 2048,
         "prompt_lens": "768-1536", "prefill_chunk": 256}
  for label, min_s in (("kernel", 768), ("dots", 1 << 30)):
    cfg, model, params = _lm_model(use_flash=False)
    cfg.update(dict(decode_kernel_min_s=min_s))
    server = LMServer(model, params, max_batch=8, max_seq_len=2048,
                      burst=16, prefill_chunk=256,
                      use_decode_kernel=(label == "kernel"))
    reqs = [GenRequest(p, m) for p, m in zip(prompts, budgets)]
    server.serve(reqs)  # compile chunk prefill + decode burst
    with tempfile.TemporaryDirectory() as d:
      events = _device_module_events(
          lambda: server.serve(reqs)[-1].tokens, d)
    serve_ms = sum(ms for _, ms in events)
    out[f"{label}_tok_per_s"] = round(useful / serve_ms * 1000)
    out[f"{label}_serve_ms"] = round(serve_ms, 1)
    call_ms = [ms for name, ms in events
               if "prefill" in name or "decode_burst" in name]
    if len(call_ms) == len(server.timeline):
      cum = np.cumsum([0.0] + call_ms)
      ttfts = [float(cum[server.request_events[i]["first"]])
               for i in range(len(reqs))]
      comps = [float(cum[server.request_events[i]["done"]])
               for i in range(len(reqs))]
      out[f"{label}_ttft_ms_p50"] = round(_pct(ttfts, 50), 1)
      out[f"{label}_ttft_ms_p95"] = round(_pct(ttfts, 95), 1)
      out[f"{label}_completion_ms_p50"] = round(_pct(comps, 50), 1)
    else:
      out[f"{label}_latency_align_error"] = (
          f"{len(call_ms)} call events vs {len(server.timeline)} timeline")
  if out.get("dots_tok_per_s"):
    out["value"] = out["kernel_tok_per_s"]
    out["kernel_speedup_vs_dots"] = round(
        out["kernel_tok_per_s"] / out["dots_tok_per_s"], 3)
  return out


def bench_lm_moe_vs_dense():
  """MoE at width (r2 verdict weak #6 / next #8): d1024 L4, 8 experts top-2
  expand-4 vs a DENSE expand-8 FFN — matched ACTIVE FLOPs per token
  (2 x 2·d·4d == 2·d·8d), MoE carries ~3.4x the FFN params. Reports both
  step times so "where EP pays" is a number, not a claim."""
  from automl_tpu.models import lm as lm_lib
  from automl_tpu.train import lm_trainer, optimizers as opt_lib

  def build(moe: bool):
    cfg = lm_lib.lm_defaults()
    cfg.update(dict(model_dim=1024, n_layers=4, n_heads=8, n_kv_heads=8,
                    head_dim=128, vocab_size=32000, seq_len=1024,
                    use_flash_attention=True))
    if moe:
      cfg.update(dict(expand_factor=4, moe_num_experts=8, moe_top_k=2,
                      moe_capacity_factor=1.25))
    else:
      cfg.update(dict(expand_factor=8))
    model = lm_lib.TransformerLM(cfg, lm_lib.ShardingConfig.data_parallel())
    params = jax.jit(model.init)(jax.random.key(0))
    tx = opt_lib.build_optimizer("lion", 1e-3)
    state = lm_trainer.LMTrainState(jnp.zeros((), jnp.int32), params,
                                    tx.init(params))
    step_fn = jax.jit(lm_trainer.make_lm_train_step(model, tx))
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    return cfg, step_fn, state, n_params

  out = {"metric": "lm_moe_vs_dense_matched_flops", "unit": "ms/step",
         "batch": 8, "seq_len": 1024, "dims": "d1024 L4 E8 top2"}
  for name, moe in (("dense_x8", False), ("moe_e8_top2_x4", True)):
    cfg, step_fn, state, n_params = build(moe)
    def make_batch(i):
      toks = jax.random.randint(jax.random.key(i), (8, cfg.seq_len + 1),
                                0, cfg.vocab_size)
      return {"tokens": toks}
    state, _ = step_fn(state, make_batch(0))
    jax.block_until_ready(state.params)
    args = [(state, make_batch(i + 1)) for i in range(PROFILED_CALLS)]
    with tempfile.TemporaryDirectory() as d:
      ms = device_busy_ms_per_call(
          lambda s, b: step_fn(s, b)[1]["loss"], args, d)
    out[name + "_ms"] = round(ms, 2)
    out[name + "_params_m"] = round(n_params / 1e6, 1)
  out["value"] = out["moe_e8_top2_x4_ms"]
  out["moe_overhead_x"] = round(
      out["moe_e8_top2_x4_ms"] / out["dense_x8_ms"], 3)
  return out


def bench_infeed():
  """Host input-pipeline throughput: native C++ loader vs tf.data.

  CPU-only (no chip): N JPEG records through (a) the fully-native
  parallel pipeline (reader thread + JPEG worker pool + prefetch ring,
  native/tfrecord_jpeg.cc), (b) the serial ctypes loader, (c) an
  equivalent tf.data pipeline (TFRecordDataset -> parse -> decode_jpeg ->
  resize-pad, parallel map AUTOTUNE). Same file, same 512x512 canvas.
  North-star context (BASELINE.md): D0 b16 training consumes 349 img/s;
  this measures what ONE host core sustains (TPU hosts scale this by
  their core count)."""
  import io, os, tempfile, time
  import numpy as np
  from PIL import Image
  import tensorflow as tf
  from automl_tpu.data import native_loader

  rng = np.random.RandomState(0)
  n_rec, size, canvas = 192, 512, 512
  tmp = tempfile.mkdtemp()
  path = os.path.join(tmp, "bench.tfrecord")
  records = []
  for i in range(n_rec):
    # realistic JPEG entropy: smoothed noise
    img = rng.randint(0, 255, (size // 8, size // 8, 3), np.uint8)
    img = np.asarray(Image.fromarray(img).resize((size, size)))
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=90)
    ex = tf.train.Example(features=tf.train.Features(feature={
        "image/encoded": tf.train.Feature(
            bytes_list=tf.train.BytesList(value=[buf.getvalue()])),
        "image/class/label": tf.train.Feature(
            int64_list=tf.train.Int64List(value=[i % 10])),
    }))
    records.append(ex.SerializeToString())
  with tf.io.TFRecordWriter(path) as w:
    for r in records:
      w.write(r)

  def run_native_parallel():
    loader = native_loader.NativeParallelClassificationLoader(
        [path], batch_size=16, canvas_size=canvas, num_classes=10,
        num_workers=4, repeat=False)
    n = 0
    for b in loader:
      n += b["image"].shape[0]
    return n

  def run_native_serial():
    loader = native_loader.NativeClassificationLoader(
        [path], batch_size=16, canvas_size=canvas, num_classes=10,
        repeat=False)
    return sum(b["image"].shape[0] for b in loader)

  feat = {"image/encoded": tf.io.FixedLenFeature([], tf.string),
          "image/class/label": tf.io.FixedLenFeature([], tf.int64)}
  def run_tfdata():
    ds = tf.data.TFRecordDataset(path)
    def mp(rec):
      ex = tf.io.parse_single_example(rec, feat)
      img = tf.io.decode_jpeg(ex["image/encoded"], channels=3)
      img = tf.image.resize_with_crop_or_pad(img, canvas, canvas)
      return img, ex["image/class/label"]
    ds = ds.map(mp, num_parallel_calls=tf.data.AUTOTUNE).batch(16) \
           .prefetch(tf.data.AUTOTUNE)
    n = 0
    for img, lab in ds:
      n += int(img.shape[0])
    return n

  out = {"metric": "infeed_native_img_per_s", "records": n_rec,
         "canvas": canvas, "unit": "img/s (1 host core)"}
  for name, fn in (("native_parallel", run_native_parallel),
                   ("native_serial", run_native_serial),
                   ("tfdata", run_tfdata)):
    fn()  # warm (build lib / autotune)
    best = 0.0
    for _ in range(3):
      t0 = time.perf_counter()
      n = fn()
      best = max(best, n / (time.perf_counter() - t0))
    out[name + "_img_per_s"] = round(best, 1)
  out["value"] = out["native_parallel_img_per_s"]
  out["vs_tfdata"] = round(out["native_parallel_img_per_s"]
                           / out["tfdata_img_per_s"], 2)
  return out


def _make_cls_records(tmp, n_rec, size):
  import io, os
  import numpy as np
  from PIL import Image
  import tensorflow as tf
  from automl_tpu.data import native_loader as nl
  rng = np.random.RandomState(0)
  path = os.path.join(tmp, f"cls{size}.tfrecord")
  with nl.TFRecordWriter(path) as w:
    for i in range(n_rec):
      img = rng.randint(0, 255, (size // 8, size // 8, 3), np.uint8)
      img = np.asarray(Image.fromarray(img).resize((size, size)))
      buf = io.BytesIO()
      Image.fromarray(img).save(buf, "JPEG", quality=90)
      w.write(nl.build_example({
          "image/encoded": [buf.getvalue()],
          "image/class/label": [i % 10]}))
  return path


def _make_det_records(tmp, n_rec, size):
  import io, os
  import numpy as np
  from PIL import Image
  from automl_tpu.data import native_loader as nl
  rng = np.random.RandomState(1)
  path = os.path.join(tmp, f"det{size}.tfrecord")
  with nl.TFRecordWriter(path) as w:
    for i in range(n_rec):
      img = rng.randint(0, 255, (size // 8, size // 8, 3), np.uint8)
      img = np.asarray(Image.fromarray(img).resize((size, size)))
      buf = io.BytesIO()
      Image.fromarray(img).save(buf, "JPEG", quality=90)
      nb = int(rng.randint(1, 6))
      y0 = rng.uniform(0, 0.5, nb); x0 = rng.uniform(0, 0.5, nb)
      w.write(nl.build_example({
          "image/encoded": [buf.getvalue()],
          "image/source_id": [str(i).encode()],
          "image/object/bbox/ymin": list(y0),
          "image/object/bbox/xmin": list(x0),
          "image/object/bbox/ymax": list(y0 + rng.uniform(0.1, 0.5, nb)),
          "image/object/bbox/xmax": list(x0 + rng.uniform(0.1, 0.5, nb)),
          "image/object/class/label": [int(c) for c in
                                       rng.randint(1, 90, nb)],
          "image/object/is_crowd": [0] * nb}))
  return path


def bench_infeed_train():
  """Loader -> device TRAIN (verdict r3 #5): real TFRecord JPEGs through
  the native C++ pipeline feeding on-chip train steps.

  For effnetv2s b32@300² and d0 b16@512²:
    host_img_per_s    native parallel loader standalone (1 host core,
                      wall clock — host-only work, no tunnel involved)
    device_img_per_s  train-step consumption (device-busy, loader-fed)
    host_cores_needed device rate / 1-core host rate: how many host cores
                      keep the MXU fed at scale (TPU hosts have 20-30
                      cores per chip)
  Fed device ms/step is also compared with the synthetic device-resident
  number — the loader path must not change device work. Wall-clock stall
  accounting is impossible through the shared tunnel (PERF_NOTES
  measurement integrity); the infeed question is answered by the rate
  comparison + the core requirement.
  """
  import tempfile, time
  import numpy as np
  from automl_tpu.data import native_loader as nl

  tmp = tempfile.mkdtemp()
  out = {"metric": "infeed_fed_train", "unit": "img/s"}

  # ---------------- classification: effnetv2-s b32 @ 300² ----------------
  from automl_tpu import nn
  from automl_tpu.configs.effnet_configs import get_model_config
  from automl_tpu.models import build_model
  from automl_tpu.train import optimizers as opt_lib
  from automl_tpu.train import train_lib

  cls_path = _make_cls_records(tmp, 256, 300)
  loader = nl.NativeParallelClassificationLoader(
      [cls_path], batch_size=32, canvas_size=300, num_classes=1000,
      num_workers=4, repeat=False)
  n = sum(b["image"].shape[0] for b in loader)  # warm
  best = 0.0
  for _ in range(3):
    t0 = time.perf_counter()
    n = sum(b["image"].shape[0]
            for b in nl.NativeParallelClassificationLoader(
                [cls_path], batch_size=32, canvas_size=300,
                num_classes=1000, num_workers=4, repeat=False))
    best = max(best, n / (time.perf_counter() - t0))
  out["cls_host_img_per_s_300"] = round(best, 1)

  nn.set_policy("mixed_bfloat16")
  cfg = get_model_config("efficientnetv2-s")
  model = build_model(cfg.model)
  params = jax.jit(model.init)(jax.random.key(0))
  tx = opt_lib.masked_for_params(
      opt_lib.build_optimizer("rmsprop", 1e-3), params)
  state = train_lib.create_train_state(params, tx)
  step_fn = jax.jit(train_lib.make_cls_train_step(model, tx, cfg))

  @jax.jit
  def fed_cls_step(state, image_u8, label, rng):
    batch = {"image": image_u8.astype(jnp.float32) / 127.5 - 1.0,
             "label": label}
    return step_fn(state, batch, rng)

  rng = jax.random.key(7)
  feed = [b for b in nl.NativeParallelClassificationLoader(
      [cls_path], batch_size=32, canvas_size=300, num_classes=1000,
      num_workers=4, repeat=False)][:PROFILED_CALLS + 1]
  state, _ = fed_cls_step(state, jnp.asarray(feed[0]["image"]),
                          jnp.asarray(feed[0]["label"]), rng)
  jax.block_until_ready(state.params)
  args = [(state, jnp.asarray(b["image"]), jnp.asarray(b["label"]), rng)
          for b in feed[1:]]
  with tempfile.TemporaryDirectory() as d:
    ms = device_busy_ms_per_call(
        lambda s, i, l, r: fed_cls_step(s, i, l, r)[1]["loss"], args, d)
  out["cls_device_img_per_s"] = round(32 / ms * 1000, 1)
  out["cls_fed_ms_per_step"] = round(ms, 2)
  out["cls_host_cores_needed"] = round(
      out["cls_device_img_per_s"] / out["cls_host_img_per_s_300"], 1)

  # ---------------- detection: d0 b16 @ 512² ----------------
  det_path = _make_det_records(tmp, 128, 512)
  best = 0.0
  for _ in range(3):
    t0 = time.perf_counter()
    n = sum(b["image"].shape[0]
            for b in nl.NativeParallelDetectionLoader(
                [det_path], batch_size=16, canvas_size=512,
                num_workers=4, repeat=False))
    best = max(best, n / (time.perf_counter() - t0))
  out["det_host_img_per_s_512"] = round(best, 1)

  fn, det_args, _ = _det_train_step("efficientdet-d0", 16)
  det_state = det_args[0][0]
  det_rng = det_args[0][2]
  from automl_tpu.configs.efficientdet_configs import get_efficientdet_config
  from automl_tpu.models.efficientdet import EfficientDet
  from automl_tpu.train import train_lib as tl
  dcfg = get_efficientdet_config("efficientdet-d0")
  dmodel = EfficientDet(dcfg)
  dstep = jax.jit(tl.make_det_train_step(
      dmodel, opt_lib.masked_for_params(
          opt_lib.build_optimizer("momentum", 1e-3,
                                  momentum=dcfg.momentum),
          det_state.params), dcfg))

  @jax.jit
  def fed_det_step(state, image_u8, boxes, classes, rng):
    # device-side normalize (mean_rgb/stddev_rgb are 0-255 scale)
    batch = {"image": (image_u8.astype(jnp.float32)
                       - jnp.asarray(dcfg.mean_rgb))
             / jnp.asarray(dcfg.stddev_rgb),
             "gt_boxes": boxes, "gt_classes": classes}
    return dstep(state, batch, rng)

  dfeed = [b for b in nl.NativeParallelDetectionLoader(
      [det_path], batch_size=16, canvas_size=512, num_workers=4,
      repeat=False)][:PROFILED_CALLS + 1]
  det_state, _ = fed_det_step(
      det_state, jnp.asarray(dfeed[0]["image"]),
      jnp.asarray(dfeed[0]["gt_boxes"]),
      jnp.asarray(dfeed[0]["gt_classes"]), det_rng)
  jax.block_until_ready(det_state.params)
  dargs = [(det_state, jnp.asarray(b["image"]), jnp.asarray(b["gt_boxes"]),
            jnp.asarray(b["gt_classes"]), det_rng) for b in dfeed[1:]]
  with tempfile.TemporaryDirectory() as d:
    dms = device_busy_ms_per_call(
        lambda s, i, bx, c, r: fed_det_step(s, i, bx, c, r)[1]["loss"],
        dargs, d)
  out["det_device_img_per_s"] = round(16 / dms * 1000, 1)
  out["det_fed_ms_per_step"] = round(dms, 2)
  out["det_host_cores_needed"] = round(
      out["det_device_img_per_s"] / out["det_host_img_per_s_512"], 1)
  out["value"] = out["cls_device_img_per_s"]
  return out


WORKLOADS = {
    "matmul_peak": bench_matmul_peak,
    "d0_train": bench_d0_train,
    "effnetv2s_train": bench_effnetv2s_train,
    "d4_train": bench_d4_train,
    "d7x_infer": bench_d7x_infer,
    "det_ladder": bench_det_ladder,
    "d7x_lion_train": bench_d7x_lion_train,
    "lm_train": bench_lm_train,
    "lm_decode": bench_lm_decode,
    "lm_decode_int8": bench_lm_decode_int8,
    "lm_spec_decode": bench_lm_spec_decode,
    "lm_serve": bench_lm_serve,
    "lm_serve_long": bench_lm_serve_long,
    "lm_moe": bench_lm_moe_vs_dense,
    "infeed": bench_infeed,
    "infeed_train": bench_infeed_train,
}


def main(names=None):
  names = names or list(WORKLOADS)
  results = []
  for name in names:
    try:
      r = WORKLOADS[name]()
    except Exception as e:  # keep going; report the failure
      r = {"metric": name, "error": f"{type(e).__name__}: {e}"}
    results.append(r)
    print(json.dumps(r), flush=True)
  return results


if __name__ == "__main__":
  main(sys.argv[1:] or None)
