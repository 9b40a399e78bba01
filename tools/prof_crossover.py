"""Decode-loop per-step cost vs cache length: kernel vs rank-3 dots.

Measured in the REAL loop context (greedy_generate while_loop): the
rank-3-dots path pays a carry relayout copy per layer per step that a
single-step jit does not show, and the kernel pays a fixed per-call
dispatch that matters at short S. Crossover decides use_decode_kernel's
S gate."""
import tempfile, json, sys
import jax, jax.numpy as jnp
import bench_suite
from automl_tpu.models import lm as lm_lib

def build(use_kernel):
  cfg = lm_lib.lm_defaults()
  cfg.update(dict(model_dim=1024, n_layers=12, n_heads=8, n_kv_heads=8,
                  head_dim=128, vocab_size=32000, seq_len=2048,
                  use_flash_attention=False, use_decode_kernel=use_kernel,
                  # disable the S gate: this sweep MEASURES the crossover
                  decode_kernel_min_s=0))
  model = lm_lib.TransformerLM(cfg, lm_lib.ShardingConfig.data_parallel())
  params = jax.jit(model.init)(jax.random.key(0))
  return cfg, model, lm_lib.cast_lm_params_for_serving(params, cfg)

NEW = 128
for use_kernel in (True, False):
  cfg, model, params = build(use_kernel)
  for prefill in (128, 384, 768, 1536):
    @jax.jit
    def gen(params, prompt):
      return lm_lib.greedy_generate(model, params, prompt, NEW)
    def prompt(i):
      return jax.random.randint(jax.random.key(i), (8, prefill), 0,
                                cfg.vocab_size)
    out = gen(params, prompt(0)); jax.block_until_ready(out)
    args = [(params, prompt(i + 1)) for i in range(4)]
    with tempfile.TemporaryDirectory() as d:
      ms = bench_suite.device_busy_ms_per_call(gen, args, d)
    print(json.dumps({"kernel": use_kernel, "prefill": prefill,
                      "avg_S": prefill + NEW // 2,
                      "ms_per_step": round((ms) / NEW, 4)}), flush=True)
