"""LM train composition matrix: loss x remat_policy x batch (round 5).

Round 4 measured the MFU decay b8 45.9% -> b32 39.8% on the fused path and
left it unexplained; round 5's remat_policy=dots won at b8 but OOMs at b16
with the unfused loss. This sweep maps the full composition space so the
large-batch recommendation is measured, not guessed:

  loss  in {unfused, fused(chunk 256)}
  remat in {full, dots}
  batch in {8, 16, 32}

Each point runs in a fresh child process (an OOM/compile crash kills only
that point). Prints one JSON row per point.

Usage (on the chip):
  PYTHONPATH=/root/repo:/root/.axon_site python tools/lm_batch_matrix.py
  python tools/lm_batch_matrix.py --points b16_fused_dots,b32_fused_dots
"""

import argparse
import itertools
import json
import os
import subprocess
import sys
import tempfile


def point_name(batch, fused, remat):
  return f"b{batch}_{'fused' if fused else 'unfused'}_{remat}"


POINTS = [(b, f, r) for b, f, r in itertools.product(
    (8, 16, 32), (False, True), ("full", "dots"))]


def run_child(batch: int, fused, remat: str) -> None:
  sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
  import jax
  import jax.numpy as jnp
  import bench_suite as bs
  from bench import device_busy_ms_per_call
  from automl_tpu.train import lm_trainer, optimizers as opt_lib

  # remat accepts suffixes: "+bf"/"-bf" force the fused flash backward
  # kernel (flash_bwd_fused) on/off (e.g. --child 8,False,dots_flash-bf);
  # "+nocap" zeroes attn_logit_cap (A/B for the tanh soft-cap VPU cost).
  overrides = {}
  if remat.endswith("+nocap"):
    remat = remat[:-6]
    overrides["attn_logit_cap"] = 0.0
  if remat.endswith("+bf"):
    remat = remat[:-3]
    overrides["flash_bwd_fused"] = True
  elif remat.endswith("-bf"):
    remat = remat[:-3]
    overrides["flash_bwd_fused"] = False
  overrides["remat_policy"] = remat
  # fused: False | True (chunked scan) | "pallas" (ops/xent.py kernels)
  if fused == "pallas":
    overrides.update(fused_softmax_loss="pallas")
  elif fused:
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

  # AOT-compile once and profile the compiled object (a second traced call
  # would compile AGAIN — minutes per point on this 1-core host).
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
  ap.add_argument("--child", default=None, help="batch,fused,remat")
  ap.add_argument("--points", default=None,
                  help="comma-separated subset of point names")
  ap.add_argument("--timeout", type=int, default=1500)
  args = ap.parse_args()

  if args.child:
    b, f, r = args.child.split(",")
    run_child(int(b), f if f == "pallas" else f == "True", r)
    return

  wanted = args.points.split(",") if args.points else None
  for batch, fused, remat in POINTS:
    name = point_name(batch, fused, remat)
    if wanted and name not in wanted:
      continue
    env = dict(os.environ)
    env.setdefault("PYTHONPATH", "/root/repo:/root/.axon_site")
    try:
      proc = subprocess.run(
          [sys.executable, os.path.abspath(__file__),
           "--child", f"{batch},{fused},{remat}"],
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
