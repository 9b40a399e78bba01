"""Op-budget profiler: bucket a train/infer step's device time by op class.

Runs a bench_suite workload's step under jax.profiler, reads the "XLA Ops"
line of ProfileData (NOT "Async XLA Ops", which double-counts overlapped
DMA — PERF_NOTES round 3), and buckets per-op device time by name patterns.
This is the tool behind the round-3 D0 op budget (PERF_NOTES) and the
round-4 D4 budget.

Usage (on the chip):
  PYTHONPATH=/root/repo:/root/.axon_site python tools/prof_opbudget.py d4
  python tools/prof_opbudget.py d0 --top 40     # also list top-N single ops
"""

import argparse
import collections
import glob
import json
import re
import tempfile

import jax

# Ordered: first match wins.
CATEGORIES = [
    ("bn_stats_reduces", r"convert_reduce|batch_norm|bn_"),
    ("depthwise_filter_grads", r"fusion.*depthwise|depthwise.*grad"),
    ("convolutions", r"^%?(convolution|conv)"),
    ("matmuls", r"^%?(dot|gemm)"),
    ("copies", r"^%?(copy|transpose|bitcast)"),
    ("multiply_reduce", r"multiply_reduce|reduce"),
    ("loop_fusion", r"^%?loop_fusion|^%?fusion"),
    ("all_reduce", r"all-reduce|all_reduce|psum"),
    ("custom_call", r"custom-call|custom_call|tpu_custom_call"),
]


def categorize(name: str) -> str:
  for cat, pat in CATEGORIES:
    if re.search(pat, name):
      return cat
  return "other"


def op_budget(fn, args_list, top: int = 25):
  """Run fn over args under the profiler; return (buckets_ms, top_ops)."""
  with tempfile.TemporaryDirectory() as trace_dir:
    with jax.profiler.trace(trace_dir):
      out = None
      for args in args_list:
        out = fn(*args)
      jax.block_until_ready(out)
    from jax.profiler import ProfileData
    path = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb",
                            recursive=True))[-1]
    pd = ProfileData.from_file(path)
    per_op = collections.Counter()
    module_ms = 0.0
    module_calls = 0
    for plane in pd.planes:
      if "TPU" not in plane.name:
        continue
      for line in plane.lines:
        if line.name == "XLA Modules":
          for ev in line.events:
            module_ms += (ev.end_ns - ev.start_ns) / 1e6
            module_calls += 1
        if line.name != "XLA Ops":
          continue
        for ev in line.events:
          per_op[ev.name] += (ev.end_ns - ev.start_ns) / 1e6
  n = max(1, len(args_list))
  buckets = collections.Counter()
  for name, ms in per_op.items():
    buckets[categorize(name)] += ms / n
  top_ops = [(name, round(ms / n, 3))
             for name, ms in per_op.most_common(top)]
  return (dict(buckets), top_ops,
          module_ms / max(1, module_calls))


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("workload", help="d0 | d4 | d7x_train | effnetv2s | lm[_fused]")
  ap.add_argument("--top", type=int, default=25)
  ap.add_argument("--batch", type=int, default=8,
                  help="lm workloads: per-chip batch (default 8)")
  ap.add_argument("--remat", default=None,
                  help="lm workloads: remat_policy override (full|dots|...)")
  args = ap.parse_args()

  import bench_suite as bs

  def effnetv2s():
    import jax, jax.numpy as jnp
    from automl_tpu import nn
    from automl_tpu.configs.effnet_configs import get_model_config
    from automl_tpu.models import build_model
    from automl_tpu.train import optimizers as opt_lib
    from automl_tpu.train import train_lib
    nn.set_policy("mixed_bfloat16")
    cfg = get_model_config("efficientnetv2-s")
    batch, size = 32, 300
    model = build_model(cfg.model)
    params = jax.jit(model.init)(jax.random.key(0))
    tx = opt_lib.masked_for_params(
        opt_lib.build_optimizer("rmsprop", 1e-3), params)
    state = train_lib.create_train_state(params, tx)
    step_fn = jax.jit(train_lib.make_cls_train_step(model, tx, cfg))
    def mk(i):
      return {"image": jax.random.normal(jax.random.key(i),
                                         (batch, size, size, 3)),
              "label": jax.nn.one_hot(jnp.arange(batch) % 1000, 1000)}
    rng = jax.random.key(7)
    state, _ = step_fn(state, mk(0), rng)
    jax.block_until_ready(state.params)
    args_list = [(state, mk(i + 1), rng) for i in range(6)]
    return ((lambda s, b, r: step_fn(s, b, r)[1]["loss"]), args_list,
            bs._step_flops(step_fn, state, mk(0), rng))

  def lm(fused: bool):
    import jax, jax.numpy as jnp
    from automl_tpu.train import lm_trainer, optimizers as opt_lib
    batch = args.batch
    overrides = dict(remat_policy=args.remat) if args.remat else {}
    cfg, model, params = bs._lm_model(**overrides)
    if fused:
      cfg.override(dict(fused_softmax_loss=True), allow_new_keys=True)
    tx = opt_lib.build_optimizer("lion", 1e-3)
    state = lm_trainer.LMTrainState(jnp.zeros((), jnp.int32), params,
                                    tx.init(params))
    step_fn = jax.jit(lm_trainer.make_lm_train_step(model, tx))
    def mk(i):
      return {"tokens": jax.random.randint(
          jax.random.key(i), (batch, cfg.seq_len + 1), 0, cfg.vocab_size)}
    state, _ = step_fn(state, mk(0))
    jax.block_until_ready(state.params)
    args_list = [(state, mk(i + 1)) for i in range(6)]
    return ((lambda s, b: step_fn(s, b)[1]["loss"]), args_list,
            bs._lm_analytic_train_flops(cfg, batch))

  build = {
      "d0": lambda: bs._det_train_step("efficientdet-d0", 16),
      "d4": lambda: bs._det_train_step("efficientdet-d4", 4),
      "d7x_train": lambda: bs._det_train_step(
          "efficientdet-d7x", 1,
          overrides=dict(optimizer="lion", grad_checkpoint=True)),
      "effnetv2s": effnetv2s,
      "lm": lambda: lm(False),
      "lm_fused": lambda: lm(True),
  }[args.workload]
  fn, call_args, flops = build()
  buckets, top_ops, step_ms = op_budget(fn, call_args, args.top)
  total = sum(buckets.values())
  print(json.dumps({"workload": args.workload,
                    "step_ms_modules": round(step_ms, 2),
                    "ops_total_ms": round(total, 2),
                    "flops_per_step": flops}))
  for cat, ms in sorted(buckets.items(), key=lambda kv: -kv[1]):
    print(f"{cat:28s} {ms:9.3f} ms  {100 * ms / total:5.1f}%")
  print("\ntop ops:")
  for name, ms in top_ops:
    print(f"  {ms:9.3f} ms  {name}")


if __name__ == "__main__":
  main()
