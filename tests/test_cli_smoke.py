"""CLI smoke tests on tiny named configs (cf. efficientnetv2/smoke_test.py):
one real train step / serve through each entry point."""

import json
import os

import numpy as np
import pytest


def test_main_cls_smoke(tmp_path):
  from automl_tpu.cli import main_cls
  metrics = main_cls.main([
      "--model_name=efficientnetv2-test",
      f"--model_dir={tmp_path}/cls", "--train_steps=2"])
  assert np.isfinite(metrics["loss"])
  assert (tmp_path / "cls" / "config.yaml").exists()


def test_main_det_smoke(tmp_path):
  from automl_tpu.cli import main_det
  metrics = main_det.main([
      "--model_name=efficientdet-test",
      f"--model_dir={tmp_path}/det", "--train_steps=2", "--use_fake_data"])
  assert np.isfinite(metrics["loss"])
  assert metrics["num_positives"] > 0


def test_inspector_dry_and_bm(capsys):
  from automl_tpu.cli import inspector
  inspector.main(["--runmode=dry", "--model_name=efficientdet-test"])
  out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
  assert out["ok"] is True
  inspector.main(["--runmode=bm", "--model_name=efficientdet-test",
                  "--bm_runs=2"])
  out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
  assert out["fps"] > 0


def test_serving_driver_visualize():
  from automl_tpu.inference.driver import ServingDriver
  driver = ServingDriver("efficientdet-test", batch_size=1,
                         mixed_precision=False).init_random()
  img = np.random.RandomState(0).randint(0, 255, (96, 128, 3), np.uint8)
  dets = driver.serve(img[None])
  assert dets["boxes"].shape[0] == 1
  annotated = driver.visualize(img, dets, 0, min_score_thresh=0.0)
  assert annotated.shape == img.shape


def test_checkpoint_save_restore_roundtrip(tmp_path):
  import jax
  import jax.numpy as jnp
  from automl_tpu.train.checkpoint import CheckpointManager
  state = {"params": {"w": jnp.arange(4.0)}, "step": jnp.asarray(3)}
  mngr = CheckpointManager(str(tmp_path / "ckpt"), async_save=False)
  assert mngr.save(3, state)
  mngr.wait_until_finished()
  template = jax.tree_util.tree_map(jnp.zeros_like, state)
  restored = mngr.restore(template)
  np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                np.arange(4.0))
  assert mngr.latest_step() == 3


def test_tflite_export_and_invoke(tmp_path):
  import numpy as np
  from automl_tpu.inference.driver import ServingDriver
  driver = ServingDriver("efficientdet-test", batch_size=1,
                         mixed_precision=False).init_random()
  path = driver.export_tflite(str(tmp_path / "m.tflite"))
  import tensorflow as tf
  interp = tf.lite.Interpreter(model_path=path)
  interp.allocate_tensors()
  inp = interp.get_input_details()[0]
  interp.set_tensor(inp["index"], np.zeros((1, 64, 64, 3), np.float32))
  interp.invoke()
  outs = [interp.get_tensor(o["index"]) for o in interp.get_output_details()]
  shapes = sorted(tuple(o.shape) for o in outs)
  assert shapes == [(1, 774), (1, 774), (1, 774, 4)]


def test_watch_checkpoints_yields_new_steps_then_times_out(tmp_path):
  """Continuous-eval watcher (ref: efficientdet/main.py:303-327)."""
  import threading
  import time
  from automl_tpu.train.checkpoint import watch_checkpoints

  d = str(tmp_path / "ckpt")
  os.makedirs(f"{d}/5")

  def add_later():
    time.sleep(0.3)
    os.makedirs(f"{d}/10")

  t = threading.Thread(target=add_later)
  t.start()
  seen = list(watch_checkpoints(d, timeout_secs=1.0, poll_secs=0.1))
  t.join()
  assert seen == [5, 10], seen


def test_generate_lm_cli_end_to_end(tmp_path):
  """Train a tiny LM via run_lm, then generate text through the CLI
  (greedy + int8 sampling paths) — the hero LMInterface.generate analog."""
  from automl_tpu.cli import generate_lm
  from automl_tpu.models import lm as lm_lib
  from automl_tpu.train import lm_trainer

  d = str(tmp_path / "lm")
  cfg = lm_lib.get_lm_config("lm-test")
  lm_trainer.run_lm(cfg, d, 4, learning_rate=1e-3)

  outs = generate_lm.main(["--model_dir", d, "--prompt", "abcabc",
                           "--max_new_tokens", "6"])
  assert len(outs) == 1 and isinstance(outs[0], str)
  outs2 = generate_lm.main(["--model_dir", d, "--prompt", "xy",
                            "--max_new_tokens", "4", "--int8",
                            "--temperature", "0.7", "--top_k", "5"])
  assert len(outs2) == 1

  # continuous-batching server path: same greedy completion as sequential
  outs3 = generate_lm.main(["--model_dir", d, "--prompt", "abcabc",
                            "--max_new_tokens", "6", "--serve_slots", "2"])
  assert outs3 == outs

  # sharded serving modes over the 8-dev CPU mesh: token-exact vs plain
  outs_tp = generate_lm.main(["--model_dir", d, "--prompt", "abcabc",
                              "--max_new_tokens", "6",
                              "--serve_mode", "tp", "--mesh_model", "2"])
  assert outs_tp == outs
  outs_sp = generate_lm.main(["--model_dir", d, "--prompt", "abcabc",
                              "--max_new_tokens", "6",
                              "--serve_mode", "sp", "--mesh_model", "4"])
  assert outs_sp == outs
  # both sharded modes compose with the slot server
  outs_sps = generate_lm.main(["--model_dir", d, "--prompt", "abcabc",
                               "--max_new_tokens", "6", "--serve_slots", "2",
                               "--serve_mode", "sp", "--mesh_model", "4"])
  assert outs_sps == outs
  outs_tps = generate_lm.main(["--model_dir", d, "--prompt", "abcabc",
                               "--max_new_tokens", "6", "--serve_slots", "2",
                               "--serve_mode", "tp", "--mesh_model", "2"])
  assert outs_tps == outs

  # --stop: byte-tokenizer stop text truncates both paths identically
  outs_stop = generate_lm.main(["--model_dir", d, "--prompt", "abcabc",
                                "--max_new_tokens", "6",
                                "--stop", outs[0][:2]])
  outs_stop2 = generate_lm.main(["--model_dir", d, "--prompt", "abcabc",
                                 "--max_new_tokens", "6",
                                 "--stop", outs[0][:2],
                                 "--serve_slots", "2"])
  assert outs_stop == outs_stop2
  assert outs[0].startswith(outs_stop[0].rstrip("\x00"))

  # --num_beams=1-equivalent check + beam CLI path runs
  outs_beam = generate_lm.main(["--model_dir", d, "--prompt", "abcabc",
                                "--max_new_tokens", "6", "--num_beams", "3"])
  assert len(outs_beam) == 1 and isinstance(outs_beam[0], str)
  import pytest as _pytest
  with _pytest.raises(ValueError, match="num_beams"):
    generate_lm.main(["--model_dir", d, "--prompt", "x",
                      "--num_beams", "2", "--serve_slots", "2"])

  # --logprobs prints without changing the completion (both paths)
  outs_lp = generate_lm.main(["--model_dir", d, "--prompt", "abcabc",
                              "--max_new_tokens", "6", "--logprobs"])
  assert outs_lp == outs
  outs_lp2 = generate_lm.main(["--model_dir", d, "--prompt", "abcabc",
                               "--max_new_tokens", "6", "--logprobs",
                               "--serve_slots", "2"])
  assert outs_lp2 == outs


def test_eval_state_template_matches_training_checkpoint(tmp_path):
  """The eval-mode restore template must structurally match what training
  saved — including the moving normalizer (positives_momentum) and EMA —
  or orbax raises a tree-mismatch that masquerades as a vanished ckpt."""
  import jax
  from automl_tpu.configs.efficientdet_configs import get_efficientdet_config
  from automl_tpu.cli.main_det import build_eval_state_template
  from automl_tpu.models.efficientdet import EfficientDet
  from automl_tpu.train import runners
  from automl_tpu.train.checkpoint import CheckpointManager
  from automl_tpu import nn

  d = str(tmp_path / "det")
  cfg = get_efficientdet_config("efficientdet-test")
  cfg.override(dict(positives_momentum=0.9))
  runners.run_detection(cfg, d, 2)

  nn.set_policy("float32")
  try:
    model = EfficientDet(cfg)
    template = build_eval_state_template(cfg, model)
    state = CheckpointManager(f"{d}/ckpt").restore(template)
    assert state is not None
    assert state.normalizer is not None and float(state.normalizer) != 1.0
    assert state.ema_params is not None
  finally:
    nn.set_policy("mixed_bfloat16")


def test_run_epoch_in_child_process(tmp_path):
  """Per-epoch child-process isolation (ref: efficientdet/main.py:113-117,
  352-357): children train to cumulative step budgets, resume from the
  latest checkpoint, and the final checkpoint reflects all steps."""
  from automl_tpu.cli import main_det
  from automl_tpu.train.checkpoint import CheckpointManager

  d = str(tmp_path / "det")
  # children are fresh interpreters: pin them to CPU (hermetic — no
  # tunnel-TPU dependence) and share a persistent compile cache so the
  # second epoch's child doesn't pay the full XLA compile again
  os.environ["AUTOML_TPU_PLATFORM"] = "cpu"
  os.environ["JAX_COMPILATION_CACHE_DIR"] = str(tmp_path / "xla_cache")
  try:
    out = main_det.main([
        "--model_name=efficientdet-test", f"--model_dir={d}",
        "--train_steps=2", "--num_examples_per_epoch=1", "--use_fake_data",
        "--run_epoch_in_child_process"])
  finally:
    os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)
    os.environ.pop("AUTOML_TPU_PLATFORM", None)
  assert out["train_steps"] == 2.0
  assert CheckpointManager(f"{d}/ckpt").latest_step() == 2


def test_main_cls_traineval_smoke(tmp_path):
  """traineval: eval metrics written during training, best ckpt archived
  (r2 judged this a dead flag; ref: efficientnetv2/main.py:229-289)."""
  import json as json_lib
  from automl_tpu.cli import main_cls
  metrics = main_cls.main([
      "--mode=traineval", "--model_name=efficientnetv2-test",
      f"--model_dir={tmp_path}/cls", "--train_steps=2", "--eval_samples=8"])
  assert "eval/top1" in metrics and 0.0 <= metrics["eval/top1"] <= 1.0
  assert "eval/top5" in metrics
  recs = [json_lib.loads(l) for l in
          open(tmp_path / "cls" / "metrics.jsonl")]
  assert any("eval/top1" in r for r in recs)
  # best-ckpt archive by objective (ref: utils.archive_ckpt)
  assert (tmp_path / "cls" / "archive" / "best_objective.txt").exists()
  # standalone eval mode reuses the saved checkpoint
  m2 = main_cls.main([
      "--mode=eval", "--model_name=efficientnetv2-test",
      f"--model_dir={tmp_path}/cls", "--eval_samples=8"])
  assert 0.0 <= m2["top1"] <= 1.0


def test_saved_model_export_and_serve(tmp_path):
  """SavedModel roundtrip (ref: inference.py:584-644 — the reference's
  primary deployment artifact): the serving_default signature reproduces
  the driver's own serve() outputs exactly."""
  import numpy as np
  from automl_tpu.inference.driver import ServingDriver
  driver = ServingDriver("efficientdet-test", batch_size=1,
                         mixed_precision=False).init_random()
  out_dir = driver.export_saved_model(str(tmp_path / "saved_model"))
  import tensorflow as tf
  loaded = tf.saved_model.load(out_dir)
  img = np.random.randint(0, 255, (1, 64, 64, 3), np.uint8)
  got = loaded.signatures["serving_default"](images=tf.constant(img))
  want = driver.serve(img)
  for key in ("boxes", "scores", "classes", "valid_len"):
    np.testing.assert_allclose(got[key].numpy(), np.asarray(want[key]),
                               atol=1e-4, err_msg=key)
