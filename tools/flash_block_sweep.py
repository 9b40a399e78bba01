"""Flash-attention block sweep on the 234M train step (round 5).

The round-2 block tuning was 4.5x sensitive; round 5's fwd block_k=512->1024
retune bought 3.8% whole-step. This sweeps the remaining axes — the bwd
kernels' blocks (block_q_bwd tiles the dkv accumulation grid, block_k_bwd
the dq grid) — independently of the forward, on the production composition
(remat_policy=dots, flash_block_k=1024). Child process per point (a Mosaic
VMEM overflow kills only that point). Prints one JSON row per point.

Usage (on the chip):
  PYTHONPATH=/root/repo:/root/.axon_site python tools/flash_block_sweep.py
  python tools/flash_block_sweep.py --points bwd_1024x512,bwd_512x512
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile

# (name, block_q, block_k, block_q_bwd, block_k_bwd); None = fwd default.
POINTS = [
    ("baseline_fwdblocks", 512, 1024, None, None),   # bwd inherits fwd
    ("bwd_512x512", 512, 1024, 512, 512),
    ("bwd_1024x512", 512, 1024, 1024, 512),
    ("bwd_1024x1024", 512, 1024, 1024, 1024),
    ("bwd_256x1024", 512, 1024, 256, 1024),
    ("bwd_2048x512", 512, 1024, 2048, 512),
    ("bwd_512x2048", 512, 1024, 512, 2048),
    ("fwd_1024x1024", 1024, 1024, None, None),
    ("fwd_256x2048", 256, 2048, None, None),
]


def run_child(bq, bk, bqb, bkb, remat="dots") -> None:
  sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
  import jax
  import jax.numpy as jnp
  import bench_suite as bs
  from bench import device_busy_ms_per_call
  from automl_tpu.train import lm_trainer, optimizers as opt_lib

  cfg, model, params = bs._lm_model(
      remat_policy=remat, flash_block_q=bq, flash_block_k=bk,
      flash_block_q_bwd=bqb, flash_block_k_bwd=bkb)
  tx = opt_lib.build_optimizer("lion", 1e-3)
  state = lm_trainer.LMTrainState(jnp.zeros((), jnp.int32), params,
                                  tx.init(params))
  step_fn = jax.jit(lm_trainer.make_lm_train_step(model, tx))

  def make_batch(i):
    toks = jax.random.randint(jax.random.key(i), (8, cfg.seq_len + 1),
                              0, cfg.vocab_size)
    return {"tokens": toks}

  compiled = step_fn.lower(state, make_batch(0)).compile()
  state, _ = compiled(state, make_batch(0))
  jax.block_until_ready(state.params)
  args = [(state, make_batch(i + 1)) for i in range(bs.PROFILED_CALLS)]
  flops = bs._lm_analytic_train_flops(cfg, 8)
  with tempfile.TemporaryDirectory() as d:
    ms = device_busy_ms_per_call(
        lambda s, b: compiled(s, b)[1]["loss"], args, d)
  print(json.dumps({"ms": round(ms, 2), **bs._mfu_fields(flops, ms)}))


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--child", default=None, help="bq,bk,bqb,bkb (0 = None)")
  ap.add_argument("--points", default=None)
  ap.add_argument("--remat", default="dots",
                  help="remat_policy for every point (e.g. dots_flash; "
                  "the fused flash backward follows the model default)")
  ap.add_argument("--timeout", type=int, default=1500)
  args = ap.parse_args()

  if args.child:
    vals = [int(x) or None for x in args.child.split(",")[:4]]
    remat = (args.child.split(",")[4:] or ["dots"])[0]
    run_child(*vals, remat=remat)
    return

  wanted = args.points.split(",") if args.points else None
  for name, bq, bk, bqb, bkb in POINTS:
    if wanted and name not in wanted:
      continue
    env = dict(os.environ)
    env.setdefault("PYTHONPATH", "/root/repo:/root/.axon_site")
    spec = f"{bq},{bk},{bqb or 0},{bkb or 0},{args.remat}"
    try:
      proc = subprocess.run(
          [sys.executable, os.path.abspath(__file__), "--child", spec],
          env=env, capture_output=True, text=True, timeout=args.timeout)
    except subprocess.TimeoutExpired:
      print(json.dumps({"point": name, "status": "timeout"}), flush=True)
      continue
    if proc.returncode != 0:
      print(json.dumps({"point": name, "status": "failed",
                        "err": (proc.stderr or "")[-300:]}), flush=True)
    else:
      row = json.loads(proc.stdout.strip().splitlines()[-1])
      print(json.dumps({"point": name, "status": "ok", **row}), flush=True)


if __name__ == "__main__":
  main()
