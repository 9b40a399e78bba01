"""ServingDriver / InferenceDriver: build, restore, predict, benchmark, export.

API parity refs:
  ServingDriver.create/serve/benchmark/export  efficientdet/tf2/infer_lib.py:102-267
  InferenceDriver one-shot                     efficientdet/inference.py:647-721
  benchmark with trace                         efficientdet/inference.py:500-537

TPU-native: one jitted program does uint8 -> normalize/resize -> network ->
decode -> NMS; export goes through jax.export (StableHLO) instead of
SavedModel/TFLite converters.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from automl_tpu import nn
from automl_tpu.configs.efficientdet_configs import get_efficientdet_config
from automl_tpu.data import preprocessing
from automl_tpu.models.efficientdet import EfficientDet
from automl_tpu.ops import postprocess
from automl_tpu.utils import parse_image_size


class ServingDriver:
  """End-to-end detection serving: uint8 image batches -> detections.

  Usage:
    driver = ServingDriver('efficientdet-d0', batch_size=1)
    driver.load(ckpt_path)            # or .init_random()
    dets = driver.serve(images)       # [B,H,W,3] uint8 -> dict of arrays
  """

  def __init__(self, model_name: str, batch_size: int = 1,
               min_score_thresh: float = 0.3, max_boxes_to_draw: int = 100,
               mixed_precision: bool = True, hparams=None,
               post_mode: str = "per_class"):
    self.config = get_efficientdet_config(model_name)
    if hparams:
      self.config.override(hparams)
    if post_mode not in ("per_class", "global", "combined"):
      raise ValueError(f"post_mode must be per_class/global/combined, "
                       f"got {post_mode!r}")
    self.post_mode = post_mode
    self.batch_size = batch_size
    self.min_score_thresh = min_score_thresh
    self.max_boxes_to_draw = max_boxes_to_draw
    nn.set_policy("mixed_bfloat16" if mixed_precision else "float32")
    self.model = EfficientDet(self.config)
    self.params = None
    self._serve_fn = None

  def init_random(self, seed: int = 0):
    self.params = jax.jit(self.model.init)(jax.random.key(seed))
    return self

  def load(self, ckpt_path: str, step: Optional[int] = None):
    """Restore from an orbax checkpoint dir saved by our trainers."""
    from automl_tpu.train.checkpoint import CheckpointManager
    template = jax.eval_shape(self.model.init, jax.random.key(0))
    template = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), template)
    mngr = CheckpointManager(ckpt_path)
    restored = mngr.restore({"params": template}, step)
    if restored is None:
      raise FileNotFoundError(f"No checkpoint under {ckpt_path}")
    self.params = restored["params"]
    return self

  def load_tf(self, ckpt_path: str, use_ema: bool = True):
    """Restore from a published reference TF checkpoint file/prefix.

    This is the path a reference user runs with downloaded efficientdet-d*
    checkpoints: TF1-style variable names (incl. '{name}/ExponentialMovingAverage'
    EMA shadows, preferred when use_ema) are mapped onto our pytree
    (ref: tf2/util_keras.py:108-204 restore_ckpt semantics)."""
    from automl_tpu.ckpt import tf_compat
    self.params = tf_compat.convert_effdet_checkpoint(
        ckpt_path, self.model, use_ema=use_ema)
    return self

  def _build_serve(self):
    config = self.config
    size = parse_image_size(config.image_size)

    def serve(params, images):
      # scale is static (fixed input dims): compute once, not under vmap
      in_h, in_w = images.shape[1], images.shape[2]
      scale_out = max(in_h, in_w) / size[0]
      normalized = jax.vmap(
          lambda im: preprocessing.det_eval_preprocess(
              im, size[0], config.mean_rgb, config.stddev_rgb)[0])(
                  images.astype(jnp.float32))
      scales = jnp.full((images.shape[0],), scale_out, jnp.float32)
      cls_out, box_out = self.model(params, normalized, train=False)
      post_fn = {"per_class": postprocess.postprocess_per_class,
                 "global": postprocess.postprocess_global,
                 "combined": postprocess.postprocess_combined}[self.post_mode]
      boxes, scores, classes, valid = post_fn(
          config, cls_out, box_out, scales)
      return {"boxes": boxes, "scores": scores, "classes": classes,
              "valid_len": valid}

    self._serve_fn = jax.jit(serve)

  def serve(self, images) -> dict:
    """images: [B,H,W,3] uint8 (any H,W; resized on device)."""
    if self.params is None:
      raise RuntimeError("Call load() or init_random() first")
    if self._serve_fn is None:
      self._build_serve()
    out = self._serve_fn(self.params, jnp.asarray(images))
    return jax.tree_util.tree_map(np.asarray, out)

  def serve_files(self, image_files: Sequence[str]) -> dict:
    from PIL import Image
    images = [np.asarray(Image.open(f).convert("RGB")) for f in image_files]
    h = max(im.shape[0] for im in images)
    w = max(im.shape[1] for im in images)
    canvas = np.zeros((len(images), h, w, 3), np.uint8)
    for i, im in enumerate(images):
      canvas[i, :im.shape[0], :im.shape[1]] = im
    return self.serve(canvas)

  def visualize(self, image, detections: dict, index: int = 0, **kwargs):
    from automl_tpu.inference.visualize import visualize_image
    n = int(detections["valid_len"][index])
    kwargs.setdefault("label_map", self.config.label_map)
    kwargs.setdefault("min_score_thresh", self.min_score_thresh)
    kwargs.setdefault("max_boxes_to_draw", self.max_boxes_to_draw)
    return visualize_image(
        image, detections["boxes"][index][:n],
        detections["classes"][index][:n].astype(int),
        detections["scores"][index][:n], **kwargs)

  def benchmark(self, images=None, bm_runs: int = 10,
                trace_filename: Optional[str] = None) -> dict:
    """Measure serve throughput; optional jax profiler trace."""
    if images is None:
      size = parse_image_size(self.config.image_size)
      images = np.zeros((self.batch_size, *size, 3), np.uint8)
    images = jnp.asarray(images)
    if self._serve_fn is None:
      self._build_serve()
    out = self._serve_fn(self.params, images)  # compile
    jax.block_until_ready(out)
    if trace_filename:
      with jax.profiler.trace(os.path.dirname(trace_filename) or "."):
        out = self._serve_fn(self.params, images)
        jax.block_until_ready(out)
    start = time.perf_counter()
    for _ in range(bm_runs):
      out = self._serve_fn(self.params, images)
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - start
    fps = images.shape[0] * bm_runs / elapsed
    latency = elapsed / bm_runs
    return {"fps": fps, "latency_ms": latency * 1000.0, "batch_size":
            int(images.shape[0])}

  def export_tflite(self, output_path: str, post_mode: str = "tflite",
                    int8_calibration_images=None):
    """Export to TFLite via jax2tf (ref contract: the reference's tflite path
    exports network + box decode + scores, deferring NMS to the runtime's
    custom op — tf2/postprocess.py:248-372).

    post_mode 'tflite': outputs (boxes [B,N,4] decoded, scores [B,N] sigmoid,
    classes [B,N]) pre-NMS; 'none': raw per-level outputs.
    int8_calibration_images: optional iterable of [B,H,W,3] float batches ->
    full INT8 post-training quantization (ref: KerasDriver INT8 calib via
    file_pattern, tf2/infer_lib.py:383+).
    """
    import numpy as np
    import tensorflow as tf
    from jax.experimental import jax2tf
    from automl_tpu.utils import parse_image_size
    if post_mode not in ("tflite", "none"):
      raise ValueError(f"post_mode must be 'tflite' or 'none', got {post_mode!r}")
    size = parse_image_size(self.config.image_size)
    config = self.config

    def fn(images):
      imgs = jax.vmap(
          lambda im: preprocessing.det_eval_preprocess(
              im, size[0], config.mean_rgb, config.stddev_rgb)[0])(
                  images.astype(jnp.float32))
      cls_out, box_out = self.model(self.params, imgs, train=False)
      if post_mode == "none":
        return tuple(cls_out) + tuple(box_out)
      boxes, scores, classes = postprocess.pre_nms(config, cls_out, box_out)
      return boxes, scores, classes.astype(jnp.int32)

    tf_fn = tf.function(
        jax2tf.convert(fn, enable_xla=False),
        input_signature=[tf.TensorSpec((self.batch_size, *size, 3),
                                       tf.float32)])
    converter = tf.lite.TFLiteConverter.from_concrete_functions(
        [tf_fn.get_concrete_function()])
    if int8_calibration_images is not None:
      def rep_dataset():
        for images in int8_calibration_images:
          yield [np.asarray(images, np.float32)]
      converter.optimizations = [tf.lite.Optimize.DEFAULT]
      converter.representative_dataset = rep_dataset
    tflite_model = converter.convert()
    os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
    with open(output_path, "wb") as f:
      f.write(tflite_model)
    return output_path

  def export_saved_model(self, output_dir: str):
    """Export the FULL serve program as a TF SavedModel via jax2tf.

    The reference's primary deployment artifact (efficientdet/inference.py:
    584-644 ServingDriver.export; tf2/infer_lib.py:383+ KerasDriver): a
    SavedModel whose serving_default signature maps a uint8 image batch to
    {boxes, scores, classes, valid_len} — here the whole on-device pipeline
    (normalize/resize -> network -> box decode -> NMS) rides inside one
    converted function, so the artifact needs no Python pre/postprocessing.
    Weights are embedded as constants (the reference exports frozen graphs
    the same way, inference.py:570-582).
    """
    import tensorflow as tf
    from jax.experimental import jax2tf
    if self.params is None:
      raise RuntimeError("Call load() or init_random() first")
    if self._serve_fn is None:
      self._build_serve()
    size = parse_image_size(self.config.image_size)
    params = self.params
    serve_fn = self._serve_fn

    module = tf.Module()
    module.serve = tf.function(
        jax2tf.convert(lambda images: serve_fn(params, images)),
        input_signature=[tf.TensorSpec((self.batch_size, *size, 3),
                                       tf.uint8, name="images")],
        autograph=False)
    os.makedirs(output_dir, exist_ok=True)
    tf.saved_model.save(
        module, output_dir,
        signatures={"serving_default":
                    module.serve.get_concrete_function()})
    return output_dir

  def export(self, output_dir: str):
    """Export the serving function as StableHLO (jax.export)."""
    from jax import export as jax_export
    if self._serve_fn is None:
      self._build_serve()
    size = parse_image_size(self.config.image_size)
    spec = jax.ShapeDtypeStruct((self.batch_size, *size, 3), jnp.uint8)
    exported = jax_export.export(self._serve_fn)(
        jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), self.params),
        spec)
    os.makedirs(output_dir, exist_ok=True)
    with open(os.path.join(output_dir, "serving.stablehlo"), "wb") as f:
      f.write(exported.serialize())
    with open(os.path.join(output_dir, "config.json"), "w") as f:
      json.dump({"model_name": self.config.name,
                 "image_size": list(size),
                 "batch_size": self.batch_size}, f)
    return output_dir


class InferenceDriver:
  """One-shot file -> annotated image (ref: inference.py:647-721)."""

  def __init__(self, model_name: str, ckpt_path: Optional[str] = None,
               **kwargs):
    self.driver = ServingDriver(model_name, batch_size=1, **kwargs)
    if ckpt_path:
      self.driver.load(ckpt_path)
    else:
      self.driver.init_random()

  def inference(self, image_path: str, output_dir: Optional[str] = None):
    from PIL import Image
    image = np.asarray(Image.open(image_path).convert("RGB"))
    dets = self.driver.serve(image[None])
    annotated = self.driver.visualize(image, dets, 0)
    if output_dir:
      os.makedirs(output_dir, exist_ok=True)
      out_path = os.path.join(output_dir, os.path.basename(image_path))
      Image.fromarray(annotated).save(out_path)
    return dets, annotated
