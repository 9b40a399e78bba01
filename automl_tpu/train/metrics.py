"""Training metrics/observability: JSONL + TensorBoard writers.

Parity refs: the reference's host_call scalar summaries
(efficientdet/utils.py:376-431) and hero's clu metric_writers usage
(hero/model_lib.py:1506-1510, 1745-1758). Here one writer object fans out to
a metrics.jsonl (always) and TensorBoard via clu (when available).
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


class MetricsWriter:
  """write(step, {name: scalar}) -> model_dir/metrics.jsonl (+ TB events)."""

  def __init__(self, model_dir: str, use_tensorboard: bool = True):
    os.makedirs(model_dir, exist_ok=True)
    self._f = open(os.path.join(model_dir, "metrics.jsonl"), "a")
    self._tb = None
    if use_tensorboard:
      try:
        from clu import metric_writers
        self._tb = metric_writers.create_default_writer(model_dir)
      except Exception:
        self._tb = None

  def write(self, step: int, scalars: dict):
    rec = {"step": int(step), "time": time.time()}
    rec.update({k: float(v) for k, v in scalars.items()})
    self._f.write(json.dumps(rec) + "\n")
    self._f.flush()
    if self._tb is not None:
      self._tb.write_scalars(int(step), {k: float(v)
                                         for k, v in scalars.items()})

  def close(self):
    self._f.close()
    if self._tb is not None:
      self._tb.flush()


class StepTimer:
  """Tracks steps/sec and examples/sec with a rolling window."""

  def __init__(self, window: int = 50):
    self.window = window
    self._t0 = time.perf_counter()
    self._count = 0

  def tick(self, examples: int = 0) -> Optional[dict]:
    self._count += 1
    if self._count % self.window:
      return None
    dt = time.perf_counter() - self._t0
    out = {"steps_per_sec": self.window / dt}
    if examples:
      out["examples_per_sec"] = examples * self.window / dt
    self._t0 = time.perf_counter()
    return out
