"""ctypes bindings for the native C++ TFRecord + JPEG loader, plus a
dependency-free TF-Example wire-format parser.

The native library (native/tfrecord_jpeg.cc) replaces tf.data's C++ pipeline
for the host path: record framing with CRC32C validation and libjpeg decode
with fused DCT-scaled nearest resize onto a fixed canvas. The Example proto is
parsed here with a ~60-line protobuf wire walker (no TF, no generated code).
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess
from typing import Iterator

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libtfrecord_jpeg.so"))
_SRC_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "tfrecord_jpeg.cc"))

_lib = None


def build_native(force: bool = False) -> str:
  """Compile the native library if needed; returns the .so path."""
  if force or not os.path.exists(_LIB_PATH) or (
      os.path.getmtime(_SRC_PATH) > os.path.getmtime(_LIB_PATH)):
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", _SRC_PATH, "-ljpeg",
         "-lpthread", "-o", _LIB_PATH],
        check=True, capture_output=True)
  return _LIB_PATH


def _load():
  global _lib
  if _lib is None:
    lib = ctypes.CDLL(build_native())
    lib.tfrecord_open.restype = ctypes.c_void_p
    lib.tfrecord_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.tfrecord_next.restype = ctypes.c_int64
    lib.tfrecord_next.argtypes = [ctypes.c_void_p,
                                  ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
    lib.tfrecord_rewind.argtypes = [ctypes.c_void_p]
    lib.tfrecord_close.argtypes = [ctypes.c_void_p]
    lib.jpeg_decode_resize.restype = ctypes.c_int
    lib.jpeg_decode_resize.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int)]
    lib.jpeg_decode_stretch.restype = ctypes.c_int
    lib.jpeg_decode_stretch.argtypes = lib.jpeg_decode_resize.argtypes
    lib.pipeline_create.restype = ctypes.c_void_p
    lib.pipeline_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.pipeline_next_batch.restype = ctypes.c_int
    lib.pipeline_next_batch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32)]
    lib.det_pipeline_create.restype = ctypes.c_void_p
    lib.det_pipeline_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int]
    lib.det_pipeline_next_batch.restype = ctypes.c_int
    lib.det_pipeline_next_batch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float)]
    lib.pipeline_dropped.restype = ctypes.c_int64
    lib.pipeline_dropped.argtypes = [ctypes.c_void_p]
    lib.pipeline_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
  return _lib


class TFRecordFile:
  """Iterate raw records of one TFRecord file via the native reader."""

  def __init__(self, path: str, check_crc: bool = True):
    self._lib = _load()
    self._handle = self._lib.tfrecord_open(path.encode(), int(check_crc))
    if not self._handle:
      raise FileNotFoundError(path)

  def __iter__(self) -> Iterator[bytes]:
    ptr = ctypes.POINTER(ctypes.c_uint8)()
    while True:
      n = self._lib.tfrecord_next(self._handle, ctypes.byref(ptr))
      if n == -2:
        return
      if n < 0:
        raise IOError("corrupt TFRecord (CRC mismatch)")
      yield ctypes.string_at(ptr, n)

  def rewind(self):
    self._lib.tfrecord_rewind(self._handle)

  def close(self):
    if self._handle:
      self._lib.tfrecord_close(self._handle)
      self._handle = None

  def __del__(self):
    try:
      self.close()
    except Exception:
      pass


def jpeg_decode_to_canvas(data: bytes, out_h: int, out_w: int,
                          stretch: bool = False):
  """-> (canvas uint8 [out_h, out_w, 3], (content_h, content_w)).

  stretch=False: aspect-preserving, content top-left, zero pad (detection
  canvas contract). stretch=True: fill the whole canvas with independent
  H/W scales (classification train contract — matches the tf.data
  branch's plain resize)."""
  lib = _load()
  out = np.zeros((out_h, out_w, 3), np.uint8)
  hw = (ctypes.c_int * 2)()
  buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
  fn = lib.jpeg_decode_stretch if stretch else lib.jpeg_decode_resize
  rc = fn(buf, len(data),
          out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
          out_h, out_w, hw)
  if rc != 0:
    raise ValueError("JPEG decode failed")
  return out, (hw[0], hw[1])


# ---------------------------------------------------------------------------
# Minimal protobuf wire parser for tf.train.Example.
# Example = { features: { feature map<string, Feature> } }
# Feature = oneof { BytesList(1), FloatList(2), Int64List(3) }
# ---------------------------------------------------------------------------


def _read_varint(buf: bytes, pos: int):
  result, shift = 0, 0
  while True:
    b = buf[pos]
    pos += 1
    result |= (b & 0x7F) << shift
    if not b & 0x80:
      return result, pos
    shift += 7


def _walk_fields(buf: bytes):
  """Yield (field_number, wire_type, value_bytes_or_int)."""
  pos = 0
  while pos < len(buf):
    tag, pos = _read_varint(buf, pos)
    field, wire = tag >> 3, tag & 7
    if wire == 0:  # varint
      val, pos = _read_varint(buf, pos)
    elif wire == 1:  # 64-bit
      val = buf[pos:pos + 8]
      pos += 8
    elif wire == 2:  # length-delimited
      n, pos = _read_varint(buf, pos)
      val = buf[pos:pos + n]
      pos += n
    elif wire == 5:  # 32-bit
      val = buf[pos:pos + 4]
      pos += 4
    else:
      raise ValueError(f"unsupported wire type {wire}")
    yield field, wire, val


def _parse_feature(buf: bytes):
  """Feature -> list of bytes / floats / ints."""
  for field, _, val in _walk_fields(buf):
    if field == 1:  # BytesList
      return [v for f, _, v in _walk_fields(val) if f == 1]
    if field == 2:  # FloatList
      out = []
      for f, w, v in _walk_fields(val):
        if f == 1 and w == 2:  # packed
          out.extend(struct.unpack(f"<{len(v) // 4}f", v))
        elif f == 1:
          out.append(struct.unpack("<f", v)[0])
      return out
    if field == 3:  # Int64List
      out = []
      for f, w, v in _walk_fields(val):
        if f == 1 and w == 0:
          out.append(v)
        elif f == 1 and w == 2:  # packed varints
          p = 0
          while p < len(v):
            x, p = _read_varint(v, p)
            out.append(x)
      return out
  return []


def parse_example(record: bytes) -> dict:
  """tf.train.Example bytes -> {key: list}."""
  out = {}
  for field, _, features_buf in _walk_fields(record):
    if field != 1:  # Example.features
      continue
    for f2, _, entry in _walk_fields(features_buf):
      if f2 != 1:  # Features.feature (map entry)
        continue
      key, feature = None, None
      for f3, _, v in _walk_fields(entry):
        if f3 == 1:
          key = v.decode()
        elif f3 == 2:
          feature = v
      if key is not None and feature is not None:
        out[key] = _parse_feature(feature)
  return out


class NativeClassificationLoader:
  """ImageNet TFRecords -> {'image': uint8 [B,S,S,3], 'label': one-hot} using
  only the native reader + wire parser (no TF)."""

  def __init__(self, files: list[str], batch_size: int, canvas_size: int,
               num_classes: int, repeat: bool = True):
    self.files = list(files)
    self.batch_size = batch_size
    self.canvas = canvas_size
    self.num_classes = num_classes
    self.repeat = repeat

  def __iter__(self):
    images, labels = [], []
    while True:
      for path in self.files:
        for record in TFRecordFile(path):
          ex = parse_example(record)
          jpeg = ex.get("image/encoded", [None])[0]
          label = int(ex.get("image/class/label", [-1])[0])
          if jpeg is None:
            continue
          canvas, _ = jpeg_decode_to_canvas(jpeg, self.canvas, self.canvas,
                                            stretch=True)
          images.append(canvas)
          onehot = np.zeros((self.num_classes,), np.float32)
          if 0 <= label < self.num_classes:
            onehot[label] = 1.0
          labels.append(onehot)
          if len(images) == self.batch_size:
            yield {"image": np.stack(images), "label": np.stack(labels)}
            images, labels = [], []
      if not self.repeat:
        return


class NativeParallelClassificationLoader:
  """Fully-native parallel input pipeline: C++ reader thread -> JPEG-decode
  worker pool -> bounded prefetch ring; Python only receives ready uint8
  canvas batches (proto parsing happens in C++ too).

  The framework-native answer to tf.data's interleave/parallel-map/prefetch
  runtime (SURVEY.md 2.6) — everything between file bytes and the device
  batch runs off the Python thread, so host decode overlaps device steps.
  Batch order is nondeterministic across workers (like tf.data with
  deterministic=False)."""

  def __init__(self, files: list[str], batch_size: int, canvas_size: int,
               num_classes: int, num_workers: int = 4,
               prefetch_batches: int = 4, repeat: bool = True):
    self.files = [f.encode() for f in files]
    self.batch_size = batch_size
    self.canvas = canvas_size
    self.num_classes = num_classes
    self.num_workers = num_workers
    self.prefetch_batches = prefetch_batches
    self.repeat = repeat

  def __iter__(self):
    if not self.files:
      raise ValueError("NativeParallelClassificationLoader: empty file list")
    lib = _load()
    arr = (ctypes.c_char_p * len(self.files))(*self.files)
    handle = lib.pipeline_create(arr, len(self.files), self.batch_size,
                                 self.canvas, self.canvas, self.num_workers,
                                 self.prefetch_batches, int(self.repeat))
    if not handle:
      raise RuntimeError("pipeline_create failed")
    b, s = self.batch_size, self.canvas
    try:
      while True:
        images = np.empty((b, s, s, 3), np.uint8)
        labels = np.empty((b,), np.int64)
        hw = np.empty((b, 2), np.int32)
        got = lib.pipeline_next_batch(
            handle, images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            hw.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        if got == 0:
          return
        onehot = np.zeros((got, self.num_classes), np.float32)
        valid = (labels[:got] >= 0) & (labels[:got] < self.num_classes)
        onehot[np.arange(got)[valid], labels[:got][valid]] = 1.0
        yield {"image": images[:got], "label": onehot,
               "content_hw": hw[:got]}
        if got < b:
          return
    finally:
      lib.pipeline_destroy(handle)


class NativeParallelDetectionLoader:
  """Fully-native parallel DETECTION pipeline: the C++ reader/worker pool
  also parses gt boxes/classes/is_crowd from the tf.Example wire format,
  converts normalized boxes to canvas coordinates, crowd-filters (train)
  and pads to max_instances — Python receives ready train/eval batches in
  the standard detection schema ({image, true_hw, gt_boxes, gt_classes,
  source_id})."""

  def __init__(self, files: list[str], batch_size: int, canvas_size: int,
               max_instances: int = 100, skip_crowd: bool = True,
               num_workers: int = 4, prefetch_batches: int = 4,
               repeat: bool = True):
    self.files = [f.encode() for f in files]
    self.batch_size = batch_size
    self.canvas = canvas_size
    self.max_instances = max_instances
    self.skip_crowd = skip_crowd
    self.num_workers = num_workers
    self.prefetch_batches = prefetch_batches
    self.repeat = repeat

  def __iter__(self):
    if not self.files:
      raise ValueError("NativeParallelDetectionLoader: empty file list")
    lib = _load()
    arr = (ctypes.c_char_p * len(self.files))(*self.files)
    handle = lib.det_pipeline_create(
        arr, len(self.files), self.batch_size, self.canvas,
        self.max_instances, int(self.skip_crowd), self.num_workers,
        self.prefetch_batches, int(self.repeat))
    if not handle:
      raise RuntimeError("det_pipeline_create failed")
    b, s, g = self.batch_size, self.canvas, self.max_instances
    f32p = ctypes.POINTER(ctypes.c_float)
    try:
      while True:
        images = np.empty((b, s, s, 3), np.uint8)
        true_hw = np.empty((b, 2), np.float32)
        boxes = np.empty((b, g, 4), np.float32)
        classes = np.empty((b, g), np.int32)
        source_id = np.empty((b,), np.float32)
        got = lib.det_pipeline_next_batch(
            handle, images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            true_hw.ctypes.data_as(f32p), boxes.ctypes.data_as(f32p),
            classes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            source_id.ctypes.data_as(f32p))
        if got == 0:
          return
        yield {"image": images[:got], "true_hw": true_hw[:got],
               "gt_boxes": boxes[:got], "gt_classes": classes[:got],
               "source_id": source_id[:got]}
        if got < b:
          return
    finally:
      lib.pipeline_destroy(handle)


# ---------------------------------------------------------------------------
# TFRecord writing + Example building (dataset converter tools).
# ---------------------------------------------------------------------------

_CRC_TABLE = None


def _crc32c_py(data: bytes) -> int:
  global _CRC_TABLE
  if _CRC_TABLE is None:
    table = []
    for i in range(256):
      c = i
      for _ in range(8):
        c = (0x82F63B78 ^ (c >> 1)) if c & 1 else c >> 1
      table.append(c)
    _CRC_TABLE = table
  c = 0xFFFFFFFF
  for b in data:
    c = _CRC_TABLE[(c ^ b) & 0xFF] ^ (c >> 8)
  return c ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
  crc = _crc32c_py(data)
  return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


class TFRecordWriter:
  """Write TFRecord framing (CRC32C-masked), interoperable with TF readers."""

  def __init__(self, path: str):
    self._f = open(path, "wb")

  def write(self, record: bytes):
    header = struct.pack("<Q", len(record))
    self._f.write(header)
    self._f.write(struct.pack("<I", _masked_crc(header)))
    self._f.write(record)
    self._f.write(struct.pack("<I", _masked_crc(record)))

  def close(self):
    self._f.close()

  def __enter__(self):
    return self

  def __exit__(self, *a):
    self.close()


def _write_varint(out: bytearray, value: int):
  while True:
    b = value & 0x7F
    value >>= 7
    if value:
      out.append(b | 0x80)
    else:
      out.append(b)
      return


def _field(out: bytearray, number: int, wire: int):
  _write_varint(out, (number << 3) | wire)


def _length_delimited(number: int, payload: bytes) -> bytes:
  out = bytearray()
  _field(out, number, 2)
  _write_varint(out, len(payload))
  out += payload
  return bytes(out)


def _encode_feature(values) -> bytes:
  inner = bytearray()
  if values and isinstance(values[0], (bytes, str)):
    lst = bytearray()
    for v in values:
      if isinstance(v, str):
        v = v.encode()
      lst += _length_delimited(1, v)
    inner += _length_delimited(1, bytes(lst))          # BytesList
  elif values and isinstance(values[0], float):
    packed = struct.pack(f"<{len(values)}f", *values)
    lst = _length_delimited(1, packed)                 # packed FloatList
    inner += _length_delimited(2, bytes(lst))
  else:
    lst = bytearray()
    for v in values:
      _field(lst, 1, 0)
      _write_varint(lst, int(v) & 0xFFFFFFFFFFFFFFFF)
    inner += _length_delimited(3, bytes(lst))          # Int64List
  return bytes(inner)


def build_example(features: dict) -> bytes:
  """{key: list of bytes/str | float | int} -> serialized tf.train.Example."""
  feats = bytearray()
  for key, values in features.items():
    if not isinstance(values, (list, tuple)):
      values = [values]
    entry = (_length_delimited(1, key.encode())
             + _length_delimited(2, _encode_feature(list(values))))
    feats += _length_delimited(1, entry)               # map entry
  return _length_delimited(1, bytes(feats))            # Example.features
