"""One detection train point at an arbitrary batch (round 5).

Finishes the round-4 batch-scaling curve: d0 b256 "did not finish
compiling inside the 10-min window under 1-core suite contention"
(PERF_NOTES round 4). Child-process isolation so an OOM or compile
crash reports cleanly; AOT-compile with no deadline, then the standard
device-busy measurement.

Usage (on the chip):
  PYTHONPATH=/root/repo:/root/.axon_site \
    python tools/det_batch_point.py efficientdet-d0 256
  python tools/det_batch_point.py efficientdet-d0 256 --grad-checkpoint
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile


def run_child(model: str, batch: int, grad_checkpoint: bool,
              calls: int) -> None:
  sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
  import jax
  import bench_suite as bs
  from bench import device_busy_ms_per_call

  # At b256 the step itself fits (with remat) but 8 resident 805-MB input
  # batches do not — allow a slimmer measurement harness for huge batches.
  bs.PROFILED_CALLS = calls
  overrides = dict(grad_checkpoint=True) if grad_checkpoint else None
  fn, args, flops = bs._det_train_step(model, batch, overrides=overrides)
  with tempfile.TemporaryDirectory() as d:
    ms = device_busy_ms_per_call(fn, args, d)
  print(json.dumps({
      "model": model, "batch": batch, "grad_checkpoint": grad_checkpoint,
      "ms": round(ms, 2), "img_per_s": round(batch / ms * 1000, 1),
      "calls": calls, **bs._mfu_fields(flops, ms)}))


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("model")
  ap.add_argument("batch", type=int)
  ap.add_argument("--grad-checkpoint", action="store_true")
  ap.add_argument("--calls", type=int, default=8)
  ap.add_argument("--child", action="store_true")
  ap.add_argument("--timeout", type=int, default=3600)
  args = ap.parse_args()

  if args.child:
    run_child(args.model, args.batch, args.grad_checkpoint, args.calls)
    return

  env = dict(os.environ)
  env.setdefault("PYTHONPATH", "/root/repo:/root/.axon_site")
  cmd = [sys.executable, os.path.abspath(__file__), args.model,
         str(args.batch), "--child", "--calls", str(args.calls)]
  if args.grad_checkpoint:
    cmd.append("--grad-checkpoint")
  try:
    proc = subprocess.run(cmd, env=env, capture_output=True, text=True,
                          timeout=args.timeout)
  except subprocess.TimeoutExpired:
    print(json.dumps({"status": "timeout", "timeout_s": args.timeout}),
          flush=True)
    return
  if proc.returncode != 0:
    err = (proc.stderr or "")[-400:]
    status = "oom" if ("RESOURCE_EXHAUSTED" in proc.stderr
                       or "Out of memory" in proc.stderr
                       or "exceeds the limit" in proc.stderr) else "failed"
    print(json.dumps({"status": status, "err": err}), flush=True)
  else:
    print(proc.stdout.strip().splitlines()[-1], flush=True)


if __name__ == "__main__":
  main()
