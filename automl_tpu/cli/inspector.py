"""Model inspector CLI: dry/infer/benchmark/export runmodes.

Parity refs: efficientdet/model_inspect.py:439-479, tf2/inspector.py:31-193.

Examples:
  python -m automl_tpu.cli.inspector --runmode=dry --model_name=efficientdet-d0
  python -m automl_tpu.cli.inspector --runmode=bm --model_name=efficientdet-d0 \
    --batch_size=8 --bm_runs=20
  python -m automl_tpu.cli.inspector --runmode=infer --input_image=img.jpg \
    --output_image_dir=/tmp/out
"""

from __future__ import annotations

import argparse
import json


def parse_args(argv=None):
  p = argparse.ArgumentParser(description=__doc__)
  p.add_argument("--runmode", default="dry",
                 choices=["dry", "infer", "bm", "benchmark", "export",
                          "saved_model", "params_flops", "video"])
  p.add_argument("--input_video", default=None)
  p.add_argument("--output_video", default=None)
  p.add_argument("--model_name", default="efficientdet-d0")
  p.add_argument("--ckpt_path", default=None)
  p.add_argument("--hparams", default="")
  p.add_argument("--batch_size", type=int, default=1)
  p.add_argument("--bm_runs", type=int, default=10)
  p.add_argument("--input_image", default=None)
  p.add_argument("--output_image_dir", default=None)
  p.add_argument("--export_dir", default=None)
  p.add_argument("--trace_filename", default=None)
  return p.parse_args(argv)


def main(argv=None):
  args = parse_args(argv)
  from automl_tpu.inference.driver import InferenceDriver, ServingDriver

  if args.runmode == "params_flops":
    import jax
    import math
    from automl_tpu.models.efficientdet import build_detection_model
    model = build_detection_model(args.model_name)
    shapes = jax.eval_shape(model.init, jax.random.key(0))
    n = sum(math.prod(s.shape) for s in jax.tree_util.tree_leaves(shapes))
    from automl_tpu.utils import parse_image_size
    size = parse_image_size(model.config.image_size)
    fwd = jax.jit(lambda p, x: model(p, x, train=False))
    import jax.numpy as jnp
    x = jax.ShapeDtypeStruct((1, *size, 3), jnp.float32)
    analysis = fwd.lower(shapes, x).compile().cost_analysis()
    flops = (analysis or {}).get("flops", -1)
    print(json.dumps({"params": n, "flops": flops}))
    return

  driver = ServingDriver(args.model_name, batch_size=args.batch_size,
                         hparams=args.hparams)
  if args.ckpt_path:
    driver.load(args.ckpt_path)
  else:
    driver.init_random()

  if args.runmode == "dry":
    import numpy as np
    out = driver.serve(np.zeros(
        (args.batch_size, 64, 64, 3), np.uint8))
    print(json.dumps({"runmode": "dry", "ok": True,
                      "valid_len": out["valid_len"].tolist()}))
  elif args.runmode in ("bm", "benchmark"):
    result = driver.benchmark(bm_runs=args.bm_runs,
                              trace_filename=args.trace_filename)
    print(json.dumps({k: round(float(v), 3) for k, v in result.items()}))
  elif args.runmode == "infer":
    assert args.input_image, "--input_image required"
    d = InferenceDriver(args.model_name, args.ckpt_path)
    dets, _ = d.inference(args.input_image, args.output_image_dir)
    print(json.dumps({"detections": int(dets["valid_len"][0])}))
  elif args.runmode == "export":
    assert args.export_dir, "--export_dir required"
    out = driver.export(args.export_dir)
    print(json.dumps({"export_dir": out}))
  elif args.runmode == "saved_model":
    # ref: inference.py:584-644 export (SavedModel is the reference's
    # primary deployment artifact); model_inspect.py saved_model runmode
    assert args.export_dir, "--export_dir required"
    out = driver.export_saved_model(args.export_dir)
    print(json.dumps({"saved_model_dir": out}))
  elif args.runmode == "video":
    # ref: model_inspect saved_model_video / tf2 inspector video mode
    assert args.input_video and args.output_video
    import cv2
    import numpy as np
    cap = cv2.VideoCapture(args.input_video)
    fps = cap.get(cv2.CAP_PROP_FPS) or 24
    writer = None
    frames = 0
    while True:
      ok, frame = cap.read()
      if not ok:
        break
      rgb = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
      dets = driver.serve(rgb[None])
      annotated = driver.visualize(rgb, dets, 0)
      if writer is None:
        writer = cv2.VideoWriter(
            args.output_video, cv2.VideoWriter_fourcc(*"mp4v"), fps,
            (annotated.shape[1], annotated.shape[0]))
      writer.write(cv2.cvtColor(annotated, cv2.COLOR_RGB2BGR))
      frames += 1
    cap.release()
    if writer:
      writer.release()
    print(json.dumps({"frames": frames, "output": args.output_video}))


if __name__ == "__main__":
  main()
