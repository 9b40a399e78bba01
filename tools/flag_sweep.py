"""XLA TPU flag sweep on a whole-step workload (round-4 verdict #2).

Three rounds of user-space rewrites (Pallas filter-grad, 1x1-as-einsum,
shift-and-add) failed to move the detection step's ~30% copies/relayout
bucket; this tool turns the COMPILER's own knobs instead. XLA flags are
process-level, so every setting runs in a fresh child process (same
device-busy measurement as bench_suite) and the parent prints a table of
ms-per-step vs baseline.

Candidate flags were enumerated from this image's libtpu
(`strings libtpu.so | grep -o 'xla_tpu_[a-z_]*'`) and filtered to
layout/fusion/VMEM levers; a setting this libtpu rejects is recorded as
"rejected", a crash as "failed".

Delivery mechanism (measured, round 5): XLA_FLAGS is parsed by the LOCAL
jaxlib whose flag registry has no --xla_tpu_* flags (instant abort);
under axon the TPU compile runs remotely and LIBTPU_INIT_ARGS IS
forwarded to the tpu_compile_helper (a bogus flag fails that compile
with HTTP 500, a real one compiles) — so the sweep sets
LIBTPU_INIT_ARGS. The terminal overrides a small list of its own flags
(the axon_host warns which; ours are not in it).

Usage (on the chip):
  PYTHONPATH=/root/repo:/root/.axon_site python tools/flag_sweep.py d0
  python tools/flag_sweep.py d4 --settings scoped_vmem_64m,baseline
"""

import argparse
import json
import os
import subprocess
import sys

SETTINGS = [
    ("baseline", ""),
    ("scoped_vmem_32m", "--xla_tpu_scoped_vmem_limit_kib=32768"),
    ("scoped_vmem_64m", "--xla_tpu_scoped_vmem_limit_kib=65536"),
    ("scavenge_vmem", "--xla_tpu_scavenge_vmem_for_fusions=true"),
    ("aggressive_loop_fusion_layout",
     "--xla_tpu_enable_aggressive_loop_fusion_layout_opt=true"),
    ("layout_negotiation", "--xla_tpu_allow_layout_negotiation=true"),
    ("untiled_layout", "--xla_tpu_enable_untiled_layout=true"),
    ("rwb_fusion_off", "--xla_tpu_rwb_fusion=false"),
    ("dot_dot_fusion", "--xla_tpu_dot_dot_fusion=true"),
    ("nested_dot_fusion", "--xla_tpu_nested_dot_fusion=true"),
    ("bundle_aware_cost_model",
     "--xla_tpu_use_bundle_aware_cost_model_for_fusions=true"),
    ("multi_output_fusion_16", "--xla_tpu_multi_output_fusion_limit=16"),
    ("pre_fusion_remat", "--xla_tpu_pre_fusion_remat=true"),
    ("order_dot_after_layout", "--xla_tpu_order_dot_after_layout=true"),
    ("reverse_layout_order",
     "--xla_tpu_reverse_layout_computation_order=true"),
    ("x16_large_2nd_minor",
     "--xla_tpu_allow_large_2nd_minor_layout_for_x16=true"),
    ("remove_bf16_bitcasts",
     "--xla_tpu_remove_bf16_bitcast_converts_for_all=true"),
    ("copy_fusion_allow_split", "--xla_tpu_copy_fusion_allow_split=true"),
    ("vmem_to_vmem_dmas", "--xla_tpu_enable_vmem_to_vmem_dmas=true"),
    ("copy_elision_10x", "--xla_tpu_copy_elision_analysis_allowance=100000"),
    # re-measure baseline at the end to bound chip/tunnel drift
    ("baseline_end", ""),
]


def run_child(workload: str) -> None:
  import tempfile
  sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
  import bench_suite as bs
  from bench import device_busy_ms_per_call
  build = {
      "d0": lambda: bs._det_train_step("efficientdet-d0", 16),
      "d4": lambda: bs._det_train_step("efficientdet-d4", 4),
  }[workload]
  fn, args, flops = build()
  with tempfile.TemporaryDirectory() as d:
    ms = device_busy_ms_per_call(fn, args, d)
  print(json.dumps({"ms": round(ms, 3)}))


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("workload", choices=["d0", "d4"])
  ap.add_argument("--child", action="store_true")
  ap.add_argument("--settings", default=None,
                  help="comma-separated subset of setting names")
  ap.add_argument("--timeout", type=int, default=1800)
  args = ap.parse_args()

  if args.child:
    run_child(args.workload)
    return

  settings = SETTINGS
  if args.settings:
    wanted = args.settings.split(",")
    settings = [s for s in SETTINGS if s[0] in wanted]

  results = []
  base_ms = None
  for name, flags in settings:
    env = dict(os.environ)
    if flags:
      env["LIBTPU_INIT_ARGS"] = (
          env.get("LIBTPU_INIT_ARGS", "") + " " + flags).strip()
    env.setdefault("PYTHONPATH", "/root/repo:/root/.axon_site")
    try:
      proc = subprocess.run(
          [sys.executable, os.path.abspath(__file__), args.workload,
           "--child"],
          env=env, capture_output=True, text=True, timeout=args.timeout)
    except subprocess.TimeoutExpired:
      print(f"{name:32s} timeout ({args.timeout}s)", flush=True)
      results.append({"setting": name, "flags": flags, "status": "timeout",
                      "ms": None})
      continue
    status, ms = "ok", None
    if proc.returncode != 0:
      err = (proc.stderr or "")[-400:]
      status = "rejected" if ("Unknown flag" in proc.stderr
                              or "unknown flag" in proc.stderr
                              or "tpu_compile_helper subprocess" in proc.stderr
                              or "Illegal" in proc.stderr) else "failed"
      print(f"{name:32s} {status}: {err!r}", flush=True)
    else:
      ms = json.loads(proc.stdout.strip().splitlines()[-1])["ms"]
      if name == "baseline":
        base_ms = ms
      delta = (f"  {100 * (ms / base_ms - 1):+.1f}% vs baseline"
               if base_ms and name != "baseline" else "")
      print(f"{name:32s} {ms:9.2f} ms{delta}", flush=True)
    results.append({"setting": name, "flags": flags, "status": status,
                    "ms": ms})
  print(json.dumps({"workload": args.workload, "results": results}))


if __name__ == "__main__":
  main()
