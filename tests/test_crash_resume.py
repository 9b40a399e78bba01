"""Crash-resume state equivalence under a HARD kill (SIGKILL, no cleanup).

For both trainers: train N steps straight vs train k -> SIGKILL mid-run
(while an async orbax save may be in flight) -> resume -> N, on the same
data stream. Asserts the final checkpoints are exactly equal (params, EMA,
optimizer state, step) and metrics.jsonl reaches the same final entry —
i.e. checkpoint saves are atomic under interruption and restart-from-latest
reproduces the straight run bit-for-bit.

Parity refs: Estimator auto-resume + train_and_eval epoch arithmetic
(efficientdet/main.py:330-338), hero unconditional restart-from-latest
(hero/model_lib.py:1568-1575), orbax async save (model_lib.py:1513-1519).

The kill is injected through the data iterator: the child's stream yields a
CONSTANT batch (so straight and resumed runs see identical data — per-step
augmentation RNG is already resume-aligned because train steps fold the key
by state.step, train/train_lib.py) and SIGKILLs its own process on the
(k+1)-th request, immediately after step k issued an async checkpoint save.
"""

import json
import os
import signal
import subprocess
import sys
import textwrap

import numpy as np
import pytest


def _run_child(script: str, args, tmp_path, expect_kill: bool):
  env = dict(os.environ)
  env["AUTOML_TPU_PLATFORM"] = "cpu"
  env["JAX_COMPILATION_CACHE_DIR"] = str(tmp_path / "xla_cache")
  env.pop("JAX_PLATFORMS", None)
  proc = subprocess.run([sys.executable, "-c", script, *map(str, args)],
                        env=env, capture_output=True, text=True, timeout=900)
  if expect_kill:
    assert proc.returncode == -signal.SIGKILL, (
        proc.returncode, proc.stdout[-2000:], proc.stderr[-2000:])
  else:
    assert proc.returncode == 0, (
        proc.returncode, proc.stdout[-2000:], proc.stderr[-2000:])
  return proc


def _read_metrics(model_dir):
  path = os.path.join(model_dir, "metrics.jsonl")
  with open(path) as f:
    return [json.loads(line) for line in f if line.strip()]


def _assert_tree_equal(a, b, context=""):
  import jax
  la, ta = jax.tree_util.tree_flatten(a)
  lb, tb = jax.tree_util.tree_flatten(b)
  assert ta == tb, f"{context}: tree structure differs"
  for i, (x, y) in enumerate(zip(la, lb)):
    np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                  err_msg=f"{context}: leaf {i}")


_DET_CHILD = textwrap.dedent("""
    import os, signal, sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    from automl_tpu.configs.efficientdet_configs import get_efficientdet_config
    from automl_tpu.data import pipeline
    from automl_tpu.train import runners

    model_dir, kill_after, train_steps = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
    template = next(iter(pipeline.SyntheticDetection(
        2, 64, max_instances=4, num_classes=3, seed=0)))

    def stream():
      served = 0
      while True:
        served += 1
        if kill_after and served > kill_after:
          os.kill(os.getpid(), signal.SIGKILL)  # hard kill, no cleanup
        yield template

    cfg = get_efficientdet_config("efficientdet-test")
    runners.run_detection(cfg, model_dir, train_steps, data_iter=stream(),
                          log_every=1, ckpt_every=1, seed=0)
""")


_LM_CHILD = textwrap.dedent("""
    import os, signal, sys
    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")
    from automl_tpu.models import lm as lm_lib
    from automl_tpu.train import lm_trainer

    model_dir, kill_after, train_steps = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
    cfg = lm_lib.lm_defaults()
    cfg.override(dict(vocab_size=64, model_dim=32, n_layers=2, n_heads=4,
                      n_kv_heads=2, head_dim=8, expand_factor=2, seq_len=16,
                      activation_dtype="float32"), allow_new_keys=True)
    batch = {"tokens": np.tile(np.arange(1, 18, dtype=np.int32), (2, 1))[:, :17]}

    def stream():
      served = 0
      while True:
        served += 1
        if kill_after and served > kill_after:
          os.kill(os.getpid(), signal.SIGKILL)
        yield batch

    lm_trainer.run_lm(cfg, model_dir, train_steps, data_iter=stream(),
                      log_every=1, ckpt_every=1, warmup_steps=1, seed=0)
""")


def _det_template():
  import jax
  from automl_tpu import nn
  from automl_tpu.cli.main_det import build_eval_state_template
  from automl_tpu.configs.efficientdet_configs import get_efficientdet_config
  from automl_tpu.models.efficientdet import EfficientDet
  cfg = get_efficientdet_config("efficientdet-test")
  nn.set_policy("mixed_bfloat16" if cfg.mixed_precision else "float32")
  return build_eval_state_template(cfg, EfficientDet(cfg))


def _lm_template():
  import jax
  import jax.numpy as jnp
  from automl_tpu.models import lm as lm_lib
  from automl_tpu.train import lm_trainer, optimizers as opt_lib
  cfg = lm_lib.lm_defaults()
  cfg.override(dict(vocab_size=64, model_dim=32, n_layers=2, n_heads=4,
                    n_kv_heads=2, head_dim=8, expand_factor=2, seq_len=16,
                    activation_dtype="float32"), allow_new_keys=True)
  model = lm_lib.TransformerLM(cfg, lm_lib.ShardingConfig.data_parallel())
  params = jax.eval_shape(model.init, jax.random.key(0))
  params = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype),
                                  params)
  tx = opt_lib.build_optimizer("lion", lambda s: 0.0)
  return lm_trainer.LMTrainState(jnp.zeros((), jnp.int32), params,
                                 tx.init(params))


@pytest.mark.parametrize("family,child,template_fn", [
    ("det", _DET_CHILD, _det_template),
    ("lm", _LM_CHILD, _lm_template),
])
def test_crash_resume_state_equivalence(tmp_path, family, child, template_fn):
  from automl_tpu.train.checkpoint import CheckpointManager

  n, k = 3, 2
  straight = str(tmp_path / "straight")
  crashed = str(tmp_path / "crashed")

  # 1) straight run to N
  _run_child(child, [straight, 0, n], tmp_path, expect_kill=False)
  # 2) run that is SIGKILLed on the (k+1)-th batch request — right after
  #    step k kicked off an async checkpoint save
  _run_child(child, [crashed, k, n], tmp_path, expect_kill=True)
  latest_mid = CheckpointManager(os.path.join(crashed, "ckpt")).latest_step()
  assert latest_mid is not None and 1 <= latest_mid < n, latest_mid
  # 3) resume to N (same command; restart-from-latest)
  _run_child(child, [crashed, 0, n], tmp_path, expect_kill=False)

  # final checkpoints must be exactly equal
  template = template_fn()
  st_a = CheckpointManager(os.path.join(straight, "ckpt")).restore(template)
  st_b = CheckpointManager(os.path.join(crashed, "ckpt")).restore(template)
  assert int(np.asarray(st_a.step)) == n
  assert int(np.asarray(st_b.step)) == n
  _assert_tree_equal(st_a, st_b, context=family)

  # metrics.jsonl: the resumed run continues the step sequence to N and its
  # final entry matches the straight run's (same data + same restored state)
  ma, mb = _read_metrics(straight), _read_metrics(crashed)
  assert ma[-1]["step"] == n and mb[-1]["step"] == n
  assert mb[-1]["loss"] == ma[-1]["loss"], (mb[-1], ma[-1])
  steps_b = [m["step"] for m in mb]
  # continuity: every step from the resume point to N is present
  for s in range(latest_mid + 1, n + 1):
    assert s in steps_b, (s, steps_b)
