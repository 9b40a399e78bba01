"""Benchmark: EfficientDet-D0 inference images/sec on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline of record: reference network-only D0 batch-8 = 238 FPS on V100
(efficientdet/README.md:159-160); our number additionally includes the
on-device postprocess (decode + class-offset soft-NMS).
"""

import json
import time

import jax
import jax.numpy as jnp

BASELINE_FPS = 238.0  # V100 b8 network-only (efficientdet/README.md:159)
BATCH = 32
ITERS = 20
TRIALS = 5


def main():
  from automl_tpu import nn
  from automl_tpu.models.efficientdet import build_detection_model
  from automl_tpu.ops import postprocess

  nn.set_policy("mixed_bfloat16")
  model = build_detection_model("efficientdet-d0")
  params = jax.jit(model.init)(jax.random.key(0))

  @jax.jit
  def forward(params, images):
    cls_outputs, box_outputs = model(params, images, train=False)
    return postprocess.postprocess_global(
        model.config, cls_outputs, box_outputs)

  images = jax.random.uniform(jax.random.key(1), (BATCH, 512, 512, 3),
                              jnp.float32)
  # warmup / compile
  out = forward(params, images)
  jax.block_until_ready(out)

  # The chip sits behind a shared tunnel: take the best of several trials.
  best = float("inf")
  for _ in range(TRIALS):
    start = time.perf_counter()
    for _ in range(ITERS):
      out = forward(params, images)
    jax.block_until_ready(out)
    best = min(best, (time.perf_counter() - start) / ITERS)

  fps = BATCH / best
  print(json.dumps({
      "metric": "effdet_d0_infer_images_per_sec",
      "value": round(fps, 2),
      "unit": "images/sec",
      "vs_baseline": round(fps / BASELINE_FPS, 3),
  }))


if __name__ == "__main__":
  main()
