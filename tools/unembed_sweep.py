"""LM train unembed-matmul precision sweep (round 5).

The b8 op budget put the f32 loss chain (unembed dot + log-softmax +
xent bwd + unembed grads over [B,T,32000] f32 tensors) at ~10% of the
step. hero itself runs the final projection at the ACTIVATION dtype and
casts to f32 only for log-softmax (model_lib.py:1101,1296) — our
default f32-operand matmul is stricter than the reference. This sweep
measures the two bf16 modes (models/lm.py unembed_matmul_dtype):

  f32      : f32 operands (default; bit-stable sampled tokens)
  bf16     : bf16 operands, f32 accum, plain autodiff (mixed-dtype bwd)
  bf16vjp  : bf16 operands + custom vjp casting the cotangent to bf16
             so all three dots are bf16 MXU passes

at the flagship b8 composition (bk=1024, remat dots, unfused loss) and
the large-batch b32 composition (fused loss chunk 256, remat full).

Usage (on the chip):
  PYTHONPATH=/root/repo:/root/.axon_site python tools/unembed_sweep.py
  python tools/unembed_sweep.py --points b8_dots_bf16vjp
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile

MODES = {"f32": "float32", "bf16": "bfloat16", "bf16vjp": "bfloat16_vjp"}

# (name, batch, fused, remat, mode)
POINTS = [
    ("b8_dotsflash_f32", 8, False, "dots_flash", "f32"),
    ("b8_dotsflash_bf16", 8, False, "dots_flash", "bf16"),
    ("b8_dotsflash_bf16vjp", 8, False, "dots_flash", "bf16vjp"),
    ("b32_fused_f32", 32, True, "full", "f32"),
    ("b32_fused_bf16vjp", 32, True, "full", "bf16vjp"),
]


def run_child(batch: int, fused: bool, remat: str, mode: str) -> None:
  sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
  import jax
  import jax.numpy as jnp
  import bench_suite as bs
  from bench import device_busy_ms_per_call
  from automl_tpu.train import lm_trainer, optimizers as opt_lib

  overrides = dict(remat_policy=remat, unembed_matmul_dtype=MODES[mode])
  if fused:
    overrides.update(fused_softmax_loss=True, loss_chunk_size=256)
  cfg, model, params = bs._lm_model(**overrides)
  tx = opt_lib.build_optimizer("lion", 1e-3)
  state = lm_trainer.LMTrainState(jnp.zeros((), jnp.int32), params,
                                  tx.init(params))
  step_fn = jax.jit(lm_trainer.make_lm_train_step(model, tx))

  def make_batch(i):
    toks = jax.random.randint(jax.random.key(i), (batch, cfg.seq_len + 1),
                              0, cfg.vocab_size)
    return {"tokens": toks}

  compiled = step_fn.lower(state, make_batch(0)).compile()
  temp_gib = compiled.memory_analysis().temp_size_in_bytes / 2**30
  state, _ = compiled(state, make_batch(0))
  jax.block_until_ready(state.params)
  step_fn = compiled
  args = [(state, make_batch(i + 1)) for i in range(bs.PROFILED_CALLS)]
  flops = bs._lm_analytic_train_flops(cfg, batch)
  with tempfile.TemporaryDirectory() as d:
    ms = device_busy_ms_per_call(lambda s, b: step_fn(s, b)[1]["loss"], args, d)
  toks = batch * cfg.seq_len
  print(json.dumps({
      "ms": round(ms, 2), "tok_per_s": round(toks / ms * 1000),
      "temp_hbm_gib": round(temp_gib, 2), **bs._mfu_fields(flops, ms)}))


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--child", default=None, help="batch,fused,remat,mode")
  ap.add_argument("--points", default=None,
                  help="comma-separated subset of point names")
  ap.add_argument("--timeout", type=int, default=1500)
  args = ap.parse_args()

  if args.child:
    b, f, r, m = args.child.split(",")
    run_child(int(b), f == "True", r, m)
    return

  wanted = args.points.split(",") if args.points else None
  for name, batch, fused, remat, mode in POINTS:
    if wanted and name not in wanted:
      continue
    env = dict(os.environ)
    env.setdefault("PYTHONPATH", "/root/repo:/root/.axon_site")
    try:
      proc = subprocess.run(
          [sys.executable, os.path.abspath(__file__),
           "--child", f"{batch},{fused},{remat},{mode}"],
          env=env, capture_output=True, text=True, timeout=args.timeout)
    except subprocess.TimeoutExpired:
      print(json.dumps({"point": name, "status": "timeout"}), flush=True)
      continue
    if proc.returncode != 0:
      err = (proc.stderr or "")[-300:]
      status = "oom" if ("RESOURCE_EXHAUSTED" in proc.stderr
                         or "Out of memory" in proc.stderr
                         or "exceeds the limit" in proc.stderr) else "failed"
      print(json.dumps({"point": name, "status": status, "err": err}),
            flush=True)
    else:
      row = json.loads(proc.stdout.strip().splitlines()[-1])
      print(json.dumps({"point": name, "status": "ok", **row}), flush=True)


if __name__ == "__main__":
  main()
