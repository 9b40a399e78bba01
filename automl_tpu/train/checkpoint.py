"""Checkpointing: orbax-backed save/restore + best-objective archiving.

Parity refs:
  orbax CheckpointManager usage   hero/model_lib.py:1513-1579 (async save,
                                  max_to_keep, restore-latest, abstract restore)
  best-ckpt archive               efficientdet/utils.py:434-481 (archive/ dir,
                                  backup/ dir, best_objective.txt)
"""

from __future__ import annotations

import os
import shutil
import time
from typing import Iterator, Optional

import orbax.checkpoint as ocp


def state_for_save(state):
  """What trainers pass to CheckpointManager.save.

  Single-process: a host copy (device_get) so async orbax saves never race
  donated buffers. Multi-process: the sharded jax.Arrays themselves —
  device_get raises on non-addressable shards, and orbax's native
  multi-host path wants the global arrays (hero/model_lib.py:1709-1713)."""
  import jax
  return jax.device_get(state) if jax.process_count() == 1 else state


class CheckpointManager:
  """Thin orbax wrapper for TrainState-like pytrees."""

  def __init__(self, directory: str, max_to_keep: int = 5,
               save_interval_steps: int = 1, async_save: bool = True):
    self.directory = os.path.abspath(directory)
    os.makedirs(self.directory, exist_ok=True)
    options = ocp.CheckpointManagerOptions(
        max_to_keep=max_to_keep,
        save_interval_steps=save_interval_steps,
        enable_async_checkpointing=async_save,
    )
    self._mngr = ocp.CheckpointManager(self.directory, options=options)

  def save(self, step: int, state) -> bool:
    return self._mngr.save(step, args=ocp.args.StandardSave(state))

  def restore(self, state_template, step: Optional[int] = None):
    step = self.latest_step() if step is None else step
    if step is None:
      return None
    return self._mngr.restore(step,
                              args=ocp.args.StandardRestore(state_template))

  def latest_step(self) -> Optional[int]:
    return self._mngr.latest_step()

  def wait_until_finished(self):
    self._mngr.wait_until_finished()

  def close(self):
    self._mngr.close()


def watch_checkpoints(directory: str, timeout_secs: float = 3600.0,
                      poll_secs: float = 10.0,
                      last_seen: Optional[int] = None) -> Iterator[int]:
  """Yield new checkpoint steps as they appear in `directory`.

  Continuous-eval analog of tf.train.checkpoints_iterator
  (ref: efficientdet/main.py:303-327, efficientnetv2/main.py:388-423):
  a --mode=eval job follows a concurrent trainer, evaluating each new
  checkpoint; stops after `timeout_secs` with no new checkpoint. Deleted /
  half-written checkpoints are the caller's problem (restore raises; skip
  and continue), matching the reference's NotFoundError tolerance.
  """
  deadline = time.time() + timeout_secs
  while time.time() < deadline:
    steps = all_checkpoint_steps(directory)
    fresh = [s for s in steps if last_seen is None or s > last_seen]
    if fresh:
      for s in fresh:
        last_seen = s
        yield s
      deadline = time.time() + timeout_secs
    else:
      time.sleep(poll_secs)


def all_checkpoint_steps(directory: str) -> list[int]:
  """Sorted step numbers present on disk (orbax layout: <dir>/<step>/)."""
  if not os.path.isdir(directory):
    return []
  steps = []
  for name in os.listdir(directory):
    if name.isdigit() and os.path.isdir(os.path.join(directory, name)):
      steps.append(int(name))
  return sorted(steps)


def archive_ckpt(ckpt_dir: str, step: int, objective: float,
                 mngr: CheckpointManager) -> bool:
  """Keep the best checkpoint by eval objective (ref: utils.py:434-481).

  Copies the step's checkpoint dir into <ckpt_dir>/archive when objective
  improves on archive/best_objective.txt; previous archive moves to backup/.
  """
  archive = os.path.join(ckpt_dir, "archive")
  backup = os.path.join(ckpt_dir, "backup")
  best_file = os.path.join(archive, "best_objective.txt")
  if os.path.exists(best_file):
    with open(best_file) as f:
      best = float(f.read().strip().split()[-1])
    if objective <= best:
      return False
  mngr.wait_until_finished()
  src = os.path.join(mngr.directory, str(step))
  if not os.path.isdir(src):
    return False
  if os.path.isdir(backup):
    shutil.rmtree(backup)
  if os.path.isdir(archive):
    shutil.move(archive, backup)
  os.makedirs(archive)
  shutil.copytree(src, os.path.join(archive, str(step)))
  with open(best_file, "w") as f:
    f.write(f"step {step} objective {objective}\n")
  return True
