"""Multi-process runtime tests: real jax.distributed over 2 CPU processes.

Each worker gets 4 virtual CPU devices (8 global), initializes the
distributed runtime, feeds its local slice of a global batch, assembles it
with build_global_array, and jits a global reduction — the actual multi-host
data path (ref: hero/model_lib.py:2410-2423, data_lib.py:250-270).
"""

import os
import socket
import subprocess
import sys



_WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
import os
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=4")
coordinator, pid = sys.argv[1], int(sys.argv[2])

from automl_tpu.parallel import distributed, create_mesh
distributed.initialize(coordinator_address=coordinator, num_processes=2,
                       process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, jax.devices()

import numpy as np
import jax.numpy as jnp
mesh = create_mesh((1, 8, 1))
global_batch = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
local = global_batch[distributed.local_slice(16)]
arr = distributed.build_global_array(local, mesh)
assert arr.shape == (16, 3), arr.shape

total = jax.jit(lambda x: jnp.sum(x))(arr)
expect = float(global_batch.sum())
assert abs(float(total) - expect) < 1e-3, (float(total), expect)

# the trainers' path: shard_batch assembles per-process rows into the
# global batch; replicate broadcasts state (both multi-process aware)
from automl_tpu.parallel.mesh import shard_batch, replicate
local_b = {"image": np.full((4, 4, 4, 3), pid + 1.0, np.float32)}
gb = shard_batch(mesh, local_b)
assert gb["image"].shape == (8, 4, 4, 3), gb["image"].shape
got = float(jax.jit(lambda b: jnp.sum(b["image"]))(gb))
assert abs(got - (1.0 + 2.0) * 4 * 4 * 4 * 3) < 1e-3, got
state = replicate(mesh, {"w": np.arange(3.0, dtype=np.float32)})
sw = float(jax.jit(lambda s: jnp.sum(s["w"]))(state))
assert abs(sw - 3.0) < 1e-3, sw
# multi-process EVAL (advisor r2 #5 fix): local eval rows -> global arrays
# against replicated params; every process must compute the SAME global
# metric (inputs assembled with build_global_array, labels allgathered,
# predictions replicated via out_shardings)
from automl_tpu import nn
from automl_tpu.configs.effnet_configs import get_model_config
from automl_tpu.models import build_model
from automl_tpu.train import runners
nn.set_policy("float32")
cfg = get_model_config("efficientnetv2-test")
model = build_model("efficientnetv2-test")
params = jax.jit(model.init)(jax.random.key(0))
params = replicate(mesh, params)
rng = np.random.RandomState(100 + pid)  # DIFFERENT local rows per process
batch = {"image": rng.randint(0, 255, (4, 36, 36, 3)).astype(np.uint8),
         "label": np.eye(4, dtype=np.float32)[rng.randint(0, 4, 4)]}
m = runners.evaluate_classification(model, params, cfg, iter([batch]), 1,
                                    mesh=mesh)
assert m["samples"] == 8.0, m  # global rows, not local
print(f"proc {pid} EVAL top1={m['top1']:.4f} top5={m['top5']:.4f}")

print(f"proc {pid} OK total={float(total)}")
"""


def _free_port():
  s = socket.socket()
  s.bind(("127.0.0.1", 0))
  port = s.getsockname()[1]
  s.close()
  return port


def test_two_process_global_array():
  coordinator = f"127.0.0.1:{_free_port()}"
  env = dict(os.environ)
  env.pop("JAX_PLATFORMS", None)
  procs = [
      subprocess.Popen([sys.executable, "-c", _WORKER, coordinator, str(i)],
                       stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                       env=env, cwd=os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))))
      for i in range(2)
  ]
  outs = []
  try:
    for p in procs:
      out, _ = p.communicate(timeout=300)
      outs.append(out.decode())
  finally:
    for p in procs:
      if p.poll() is None:
        p.kill()
  for i, (p, out) in enumerate(zip(procs, outs)):
    assert p.returncode == 0, f"proc {i} failed:\n{out}"
    assert f"proc {i} OK" in out, out
  # both processes computed the SAME global eval metric from different
  # local rows
  evals = []
  for out in outs:
    (line,) = [l for l in out.splitlines() if "EVAL" in l]
    evals.append(line.split("EVAL")[1])
  assert evals[0] == evals[1], evals


def test_local_slice_single_process():
  from automl_tpu.parallel import distributed
  s = distributed.local_slice(8)
  assert (s.start, s.stop) == (0, 8)
