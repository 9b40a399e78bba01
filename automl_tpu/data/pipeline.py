"""Host-side input pipeline: TFRecord readers + synthetic data.

Host responsibilities END at: read records, decode JPEG, aspect-preserving
resize onto a fixed uint8 canvas, pad ground truth to fixed shapes. All
randomness (crop/flip/jitter/RandAugment/mixup) and anchor labeling run on
device (data/preprocessing.py, data/augment.py, ops/anchors.py) — the infeed
ships fixed-shape uint8 tensors only (bytes/step stays minimal; the reference
ships float32 post-normalize images, dataloader.py:356).

Reader parity refs:
  ImageNet TF-Example keys   efficientnetv2/datasets.py:303-329
  detection TF-Example keys  efficientdet/dataset/create_coco_tfrecord.py:15-50,
                             object_detection/tf_example_decoder.py
  fake/null data modes       efficientdet/dataloader.py:455-459,
                             efficientnetv2/datasets.py:178-189
TFRecord IO uses tf.data's C++ pipeline on host only (the same native reader
the reference consumes); nothing TF touches device memory.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np


# ---------------------------------------------------------------------------
# Synthetic data (the reference's data_dir='null' / --use_fake_data modes).
# ---------------------------------------------------------------------------


class SyntheticClassification:
  """Yields {'image': uint8 [B,S,S,3], 'label': f32 [B,num_classes]} forever."""

  def __init__(self, batch_size: int, image_size: int, num_classes: int,
               seed: int = 0):
    rng = np.random.RandomState(seed)
    self.batch = {
        "image": rng.randint(0, 256, (batch_size, image_size, image_size, 3),
                             dtype=np.uint8),
        "label": np.eye(num_classes, dtype=np.float32)[
            rng.randint(0, num_classes, batch_size)],
    }

  def __iter__(self) -> Iterator[dict]:
    while True:
      yield self.batch


class SyntheticDetection:
  """Yields fixed-shape detection batches with a couple of boxes per image."""

  def __init__(self, batch_size: int, image_size: int,
               max_instances: int = 100, num_classes: int = 90, seed: int = 0):
    rng = np.random.RandomState(seed)
    b, s, g = batch_size, image_size, max_instances
    boxes = np.zeros((b, g, 4), np.float32)
    classes = -np.ones((b, g), np.int32)
    for i in range(b):
      n = rng.randint(1, 4)
      y0 = rng.uniform(0, s * 0.6, n)
      x0 = rng.uniform(0, s * 0.6, n)
      hh = rng.uniform(s * 0.1, s * 0.4, n)
      ww = rng.uniform(s * 0.1, s * 0.4, n)
      boxes[i, :n] = np.stack([y0, x0, np.minimum(y0 + hh, s),
                               np.minimum(x0 + ww, s)], axis=1)
      classes[i, :n] = rng.randint(1, num_classes + 1, n)
    self.batch = {
        "image": rng.randint(0, 256, (b, s, s, 3), dtype=np.uint8),
        "true_hw": np.full((b, 2), s, np.float32),
        "gt_boxes": boxes,
        "gt_classes": classes,
    }

  def __iter__(self) -> Iterator[dict]:
    while True:
      yield self.batch


# ---------------------------------------------------------------------------
# TFRecord readers (host-only tf.data).
# ---------------------------------------------------------------------------


def _tf():
  import tensorflow as tf  # local import: host-side IO only
  tf.config.set_visible_devices([], "GPU")
  try:
    tf.config.set_visible_devices([], "TPU")
  except Exception:
    pass
  return tf


class ImageNetTFRecordLoader:
  """ImageNet-style TFRecords -> {'image': uint8 canvas, 'label': one-hot}.

  canvas_size should be ~1.15x the largest train size so the device-side
  random crop has headroom (eval uses size/(size+32) center crop).
  """

  def __init__(self, file_pattern: str, is_training: bool, batch_size: int,
               canvas_size: int, num_classes: int,
               shuffle_buffer: int = 8192, drop_remainder: bool = True,
               shard_index: int = 0, num_shards: int = 1):
    self.cfg = dict(locals())
    del self.cfg["self"]

  def __iter__(self):
    tf = _tf()
    c = self.cfg
    files = tf.data.Dataset.list_files(c["file_pattern"],
                                       shuffle=c["is_training"])
    if c["num_shards"] > 1:
      files = files.shard(c["num_shards"], c["shard_index"])
    ds = files.interleave(tf.data.TFRecordDataset, cycle_length=16,
                          num_parallel_calls=tf.data.AUTOTUNE,
                          deterministic=not c["is_training"])
    if c["is_training"]:
      ds = ds.shuffle(c["shuffle_buffer"]).repeat()

    size = c["canvas_size"]

    def parse(serialized):
      feats = tf.io.parse_single_example(serialized, {
          "image/encoded": tf.io.FixedLenFeature((), tf.string),
          "image/class/label": tf.io.FixedLenFeature((), tf.int64, -1),
      })
      image = tf.io.decode_image(feats["image/encoded"], channels=3,
                                 expand_animations=False)
      if c["is_training"] or size <= 32:
        # tiny canvases (test fixtures) have no isize+32 headroom
        image = tf.image.resize(image, (size, size), method="bilinear")
      else:
        # EXACT reference eval geometry (efficientnetv2/preprocessing.py:
        # 58-70): center-crop ratio*min(h,w) from the ORIGINAL image (only
        # when isize < 320 — larger models eval on the full frame), then
        # one bilinear resize to isize. The canvas contract puts eval
        # isize at canvas_size - 32; consumers must pass precropped=True
        # to cls_eval_preprocess (no second crop).
        isize = size - 32
        if isize < 320:
          shape = tf.shape(image)
          h, w = shape[0], shape[1]
          ratio = isize / (isize + 32)
          crop = tf.cast(ratio * tf.cast(tf.minimum(h, w), tf.float32),
                         tf.int32)
          image = tf.image.crop_to_bounding_box(
              image, (h - crop) // 2, (w - crop) // 2, crop, crop)
        image = tf.image.resize(image, (isize, isize), method="bilinear")
      image = tf.cast(tf.round(image), tf.uint8)
      label = tf.one_hot(feats["image/class/label"], c["num_classes"])
      return {"image": image, "label": label}

    ds = ds.map(parse, num_parallel_calls=tf.data.AUTOTUNE)
    ds = ds.batch(c["batch_size"], drop_remainder=c["drop_remainder"])
    ds = ds.prefetch(tf.data.AUTOTUNE)
    return iter(ds.as_numpy_iterator())


class MultiLabelTFRecordLoader:
  """ImageNet21k-style TFRecords ({'id','image','labels'}, ref:
  efficientnetv2/datasets.py:481-489) -> {'image': uint8 canvas,
  'label_ids': [B, max_labels] int32, -1 padded}.

  Dense multi-hot expansion happens ON DEVICE (datasets.multihot_on_device)
  so the host never ships 21843-wide label tensors."""

  def __init__(self, file_pattern: str, is_training: bool, batch_size: int,
               canvas_size: int, max_labels: int = 16,
               shuffle_buffer: int = 8192, drop_remainder: bool = True,
               shard_index: int = 0, num_shards: int = 1):
    self.cfg = dict(locals())
    del self.cfg["self"]

  def __iter__(self):
    tf = _tf()
    c = self.cfg
    files = tf.data.Dataset.list_files(c["file_pattern"],
                                       shuffle=c["is_training"])
    if c["num_shards"] > 1:
      files = files.shard(c["num_shards"], c["shard_index"])
    ds = files.interleave(tf.data.TFRecordDataset, cycle_length=16,
                          num_parallel_calls=tf.data.AUTOTUNE,
                          deterministic=not c["is_training"])
    if c["is_training"]:
      ds = ds.shuffle(c["shuffle_buffer"]).repeat()

    size, max_labels = c["canvas_size"], c["max_labels"]

    def parse(serialized):
      feats = tf.io.parse_single_example(serialized, {
          "image": tf.io.FixedLenFeature((), tf.string),
          "labels": tf.io.FixedLenSequenceFeature((), tf.int64,
                                                  allow_missing=True),
      })
      image = tf.io.decode_image(feats["image"], channels=3,
                                 expand_animations=False)
      if c["is_training"] or size <= 32:
        # tiny canvases (test fixtures) have no isize+32 headroom
        image = tf.image.resize(image, (size, size), method="bilinear")
      else:
        # reference eval geometry, as in ImageNetTFRecordLoader above
        isize = size - 32
        if isize < 320:
          shape = tf.shape(image)
          h, w = shape[0], shape[1]
          ratio = isize / (isize + 32)
          crop = tf.cast(ratio * tf.cast(tf.minimum(h, w), tf.float32),
                         tf.int32)
          image = tf.image.crop_to_bounding_box(
              image, (h - crop) // 2, (w - crop) // 2, crop, crop)
        image = tf.image.resize(image, (isize, isize), method="bilinear")
      image = tf.cast(tf.round(image), tf.uint8)
      ids = tf.cast(feats["labels"][:max_labels], tf.int32)
      ids = tf.pad(ids, [[0, max_labels - tf.shape(ids)[0]]],
                   constant_values=-1)
      ids = tf.ensure_shape(ids, [max_labels])
      return {"image": image, "label_ids": ids}

    ds = ds.map(parse, num_parallel_calls=tf.data.AUTOTUNE)
    ds = ds.batch(c["batch_size"], drop_remainder=c["drop_remainder"])
    ds = ds.prefetch(tf.data.AUTOTUNE)
    return iter(ds.as_numpy_iterator())


class DetectionTFRecordLoader:
  """COCO-style detection TFRecords -> fixed-shape uint8 canvas batches.

  Host: decode, aspect-preserving resize onto [canvas, canvas] (content at
  top-left), scale boxes to canvas coords, pad gt to max_instances with
  class -1. Device does flip/jitter/crop + anchor labeling.
  """

  def __init__(self, file_pattern: str, is_training: bool, batch_size: int,
               canvas_size: int, max_instances: int = 100,
               skip_crowd_during_training: bool = True,
               shuffle_buffer: int = 4096, shard_index: int = 0,
               num_shards: int = 1):
    self.cfg = dict(locals())
    del self.cfg["self"]

  def __iter__(self):
    tf = _tf()
    c = self.cfg
    files = tf.data.Dataset.list_files(c["file_pattern"],
                                       shuffle=c["is_training"])
    if c["num_shards"] > 1:
      files = files.shard(c["num_shards"], c["shard_index"])
    ds = files.interleave(tf.data.TFRecordDataset, cycle_length=16,
                          num_parallel_calls=tf.data.AUTOTUNE,
                          deterministic=not c["is_training"])
    if c["is_training"]:
      ds = ds.shuffle(c["shuffle_buffer"]).repeat()

    size = c["canvas_size"]
    g = c["max_instances"]

    def parse(serialized):
      keys = {
          "image/encoded": tf.io.FixedLenFeature((), tf.string),
          "image/source_id": tf.io.FixedLenFeature((), tf.string, "0"),
          "image/object/bbox/ymin": tf.io.VarLenFeature(tf.float32),
          "image/object/bbox/xmin": tf.io.VarLenFeature(tf.float32),
          "image/object/bbox/ymax": tf.io.VarLenFeature(tf.float32),
          "image/object/bbox/xmax": tf.io.VarLenFeature(tf.float32),
          "image/object/class/label": tf.io.VarLenFeature(tf.int64),
          "image/object/is_crowd": tf.io.VarLenFeature(tf.int64),
      }
      feats = tf.io.parse_single_example(serialized, keys)
      image = tf.io.decode_image(feats["image/encoded"], channels=3,
                                 expand_animations=False)
      h = tf.cast(tf.shape(image)[0], tf.float32)
      w = tf.cast(tf.shape(image)[1], tf.float32)
      scale = size / tf.maximum(h, w)
      nh = tf.cast(tf.round(h * scale), tf.int32)
      nw = tf.cast(tf.round(w * scale), tf.int32)
      image = tf.image.resize(image, (nh, nw), method="bilinear")
      image = tf.image.pad_to_bounding_box(image, 0, 0, size, size)
      image = tf.cast(tf.round(image), tf.uint8)

      dense = lambda k: tf.sparse.to_dense(feats[k])
      ymin, xmin = dense("image/object/bbox/ymin"), dense("image/object/bbox/xmin")
      ymax, xmax = dense("image/object/bbox/ymax"), dense("image/object/bbox/xmax")
      # normalized [0,1] coords in the source -> canvas absolute
      boxes = tf.stack([ymin * h, xmin * w, ymax * h, xmax * w], axis=1) * scale
      labels = tf.cast(dense("image/object/class/label"), tf.int32)
      is_crowd = tf.cast(dense("image/object/is_crowd"), tf.bool)
      if c["is_training"] and c["skip_crowd_during_training"]:
        keep = tf.logical_not(is_crowd)
        boxes = tf.boolean_mask(boxes, keep)
        labels = tf.boolean_mask(labels, keep)
      n = tf.minimum(tf.shape(labels)[0], g)
      boxes = tf.pad(boxes[:n], [[0, g - n], [0, 0]])
      labels = tf.pad(labels[:n], [[0, g - n]], constant_values=-1)
      source_id = tf.strings.to_number(
          tf.where(tf.equal(feats["image/source_id"], ""), "0",
                   feats["image/source_id"]), tf.float32)
      return {"image": image, "true_hw": tf.stack([h * scale, w * scale]),
              "gt_boxes": boxes, "gt_classes": labels,
              "image_scale": 1.0 / scale, "source_id": source_id}

    ds = ds.map(parse, num_parallel_calls=tf.data.AUTOTUNE)
    ds = ds.batch(c["batch_size"], drop_remainder=c["is_training"])
    ds = ds.prefetch(tf.data.AUTOTUNE)
    return iter(ds.as_numpy_iterator())


# ---------------------------------------------------------------------------
# Device prefetcher: double-buffered host->device staging so infeed overlaps
# the running step (north star: infeed never stalls the MXU; replaces
# TPUEstimator's infeed queue).
# ---------------------------------------------------------------------------


class DevicePrefetcher:
  """Wrap a host batch iterator; stage batches to device on a background
  thread with a small buffer.

  sharding: optional jax.sharding.Sharding (or pytree of shardings) applied
  via device_put; defaults to the default device.
  """

  def __init__(self, host_iter, sharding=None, buffer_size: int = 2):
    import queue
    import threading
    self._q = queue.Queue(maxsize=buffer_size)
    self._stop = threading.Event()

    def stage():
      import jax
      try:
        for batch in host_iter:
          if self._stop.is_set():
            return
          if sharding is not None:
            staged = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, sharding), batch)
          else:
            staged = jax.tree_util.tree_map(jax.device_put, batch)
          self._q.put(staged)
      finally:
        self._q.put(None)  # sentinel: exhausted

    self._thread = threading.Thread(target=stage, daemon=True)
    self._thread.start()

  def __iter__(self):
    while True:
      item = self._q.get()
      if item is None:
        return
      yield item

  def close(self):
    self._stop.set()
    try:
      while True:
        self._q.get_nowait()
    except Exception:
      pass
