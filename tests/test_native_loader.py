"""Native C++ loader tests: TFRecord framing + CRC, JPEG decode vs PIL,
Example wire parser vs TF's writer, end-to-end loader."""

import io
import os
import struct

import numpy as np
import pytest

from automl_tpu.data import native_loader


@pytest.fixture(scope="module")
def lib():
  try:
    native_loader.build_native()
  except Exception as e:
    pytest.skip(f"native build failed: {e}")
  return True


def _crc32c(data: bytes) -> int:
  table = []
  for i in range(256):
    c = i
    for _ in range(8):
      c = (0x82F63B78 ^ (c >> 1)) if c & 1 else c >> 1
    table.append(c)
  c = 0xFFFFFFFF
  for b in data:
    c = table[(c ^ b) & 0xFF] ^ (c >> 8)
  return c ^ 0xFFFFFFFF


def _masked(data: bytes) -> int:
  crc = _crc32c(data)
  return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def write_tfrecord(path, records):
  with open(path, "wb") as f:
    for rec in records:
      header = struct.pack("<Q", len(rec))
      f.write(header)
      f.write(struct.pack("<I", _masked(header)))
      f.write(rec)
      f.write(struct.pack("<I", _masked(rec)))


def test_tfrecord_roundtrip(lib, tmp_path):
  path = str(tmp_path / "t.tfrecord")
  records = [b"hello", b"world" * 100, b""]
  write_tfrecord(path, records)
  got = list(native_loader.TFRecordFile(path))
  assert got == records


def test_tfrecord_crc_detects_corruption(lib, tmp_path):
  path = str(tmp_path / "bad.tfrecord")
  write_tfrecord(path, [b"payload"])
  raw = bytearray(open(path, "rb").read())
  raw[14] ^= 0xFF  # flip a data byte
  open(path, "wb").write(bytes(raw))
  with pytest.raises(IOError):
    list(native_loader.TFRecordFile(path))


def test_jpeg_decode_matches_pil(lib):
  from PIL import Image
  rng = np.random.RandomState(0)
  img = rng.randint(0, 255, (64, 48, 3), np.uint8)
  buf = io.BytesIO()
  Image.fromarray(img).save(buf, "JPEG", quality=95)
  data = buf.getvalue()

  canvas, (ch, cw) = native_loader.jpeg_decode_to_canvas(data, 64, 64)
  assert (ch, cw) == (64, 48)
  pil = np.asarray(Image.open(io.BytesIO(data)))
  # same size -> nearest resize is identity; JPEG decoders may differ slightly
  diff = np.abs(canvas[:64, :48].astype(int) - pil.astype(int))
  assert diff.mean() < 3.0, diff.mean()
  assert (canvas[:, 48:] == 0).all()  # padded region


def test_parse_example_vs_tf_writer(lib):
  tf = pytest.importorskip("tensorflow")
  ex = tf.train.Example(features=tf.train.Features(feature={
      "image/encoded": tf.train.Feature(
          bytes_list=tf.train.BytesList(value=[b"abc"])),
      "image/class/label": tf.train.Feature(
          int64_list=tf.train.Int64List(value=[42])),
      "bbox/xmin": tf.train.Feature(
          float_list=tf.train.FloatList(value=[0.5, 0.25])),
  }))
  parsed = native_loader.parse_example(ex.SerializeToString())
  assert parsed["image/encoded"] == [b"abc"]
  assert parsed["image/class/label"] == [42]
  np.testing.assert_allclose(parsed["bbox/xmin"], [0.5, 0.25])


def test_native_classification_loader_end_to_end(lib, tmp_path):
  from PIL import Image
  tf = pytest.importorskip("tensorflow")
  path = str(tmp_path / "imgs.tfrecord")
  records = []
  for i in range(3):
    buf = io.BytesIO()
    Image.fromarray(
        np.full((32, 32, 3), i * 40, np.uint8)).save(buf, "JPEG")
    ex = tf.train.Example(features=tf.train.Features(feature={
        "image/encoded": tf.train.Feature(
            bytes_list=tf.train.BytesList(value=[buf.getvalue()])),
        "image/class/label": tf.train.Feature(
            int64_list=tf.train.Int64List(value=[i])),
    }))
    records.append(ex.SerializeToString())
  write_tfrecord(path, records)

  loader = native_loader.NativeClassificationLoader(
      [path], batch_size=2, canvas_size=32, num_classes=5)
  batch = next(iter(loader))
  assert batch["image"].shape == (2, 32, 32, 3)
  assert batch["label"].shape == (2, 5)
  assert batch["label"][0, 0] == 1.0 and batch["label"][1, 1] == 1.0
  assert abs(int(batch["image"][1].mean()) - 40) < 5


def test_native_parallel_pipeline_matches_serial(tmp_path):
  """The C++ parallel pipeline (reader thread + decode worker pool +
  prefetch ring, proto parsing in C++) yields the same example SET as the
  serial native loader — order-free comparison (workers race, like
  tf.data deterministic=False)."""
  import io
  from PIL import Image
  from automl_tpu.data import native_loader as nl

  rng = np.random.RandomState(0)
  n, canvas = 10, 32
  path = str(tmp_path / "data.tfrecord")
  with nl.TFRecordWriter(path) as w:
    for i in range(n):
      img = np.full((24 + i, 20, 3), i * 20, np.uint8)
      buf = io.BytesIO()
      Image.fromarray(img).save(buf, "JPEG", quality=95)
      w.write(nl.build_example({
          "image/encoded": [buf.getvalue()],
          "image/class/label": [i % 4],
      }))

  serial = list(nl.NativeClassificationLoader(
      [path], batch_size=2, canvas_size=canvas, num_classes=4, repeat=False))
  parallel = list(nl.NativeParallelClassificationLoader(
      [path], batch_size=2, canvas_size=canvas, num_classes=4,
      num_workers=3, prefetch_batches=2, repeat=False))

  def example_set(batches, key):
    out = []
    for b in batches:
      for row in np.asarray(b[key]):
        out.append(row.tobytes())
    return sorted(out)

  assert sum(b["image"].shape[0] for b in parallel) == n
  assert example_set(serial, "image") == example_set(parallel, "image")
  assert example_set(serial, "label") == example_set(parallel, "label")
  # content dims reported per example
  hws = np.concatenate([b["content_hw"] for b in parallel])
  assert (hws[:, 0] > 0).all() and (hws[:, 1] > 0).all()


def test_native_parallel_pipeline_repeat_and_teardown(tmp_path):
  """repeat=True streams past one epoch; destroying mid-stream neither
  hangs nor leaks (teardown joins the reader + workers)."""
  import io
  from PIL import Image
  from automl_tpu.data import native_loader as nl
  path = str(tmp_path / "d.tfrecord")
  with nl.TFRecordWriter(path) as w:
    for i in range(3):
      buf = io.BytesIO()
      Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(buf, "JPEG")
      w.write(nl.build_example({"image/encoded": [buf.getvalue()],
                                "image/class/label": [i]}))
  it = iter(nl.NativeParallelClassificationLoader(
      [path], batch_size=4, canvas_size=16, num_classes=3,
      num_workers=2, repeat=True))
  for _ in range(5):  # > one epoch (3 examples, batch 4)
    b = next(it)
    assert b["image"].shape == (4, 16, 16, 3)
  it.close()  # generator close -> pipeline_destroy via finally


def test_native_parallel_detection_pipeline(tmp_path):
  """Detection mode: gt boxes parsed from the wire format in C++, scaled
  to canvas coords, crowd-filtered, padded to max_instances — compared
  against hand-computed expectations (and the tf.data loader's schema)."""
  import io
  from PIL import Image
  from automl_tpu.data import native_loader as nl

  canvas, g = 64, 5
  path = str(tmp_path / "det.tfrecord")
  # image 40x80 -> scale 64/80 = 0.8 -> content (32, 64)
  with nl.TFRecordWriter(path) as w:
    img = np.zeros((40, 80, 3), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG")
    w.write(nl.build_example({
        "image/encoded": [buf.getvalue()],
        "image/source_id": [b"1234"],
        "image/object/bbox/ymin": [0.0, 0.25, 0.5],
        "image/object/bbox/xmin": [0.0, 0.25, 0.5],
        "image/object/bbox/ymax": [0.5, 0.75, 1.0],
        "image/object/bbox/xmax": [0.5, 0.75, 1.0],
        "image/object/class/label": [3, 7, 9],
        "image/object/is_crowd": [0, 1, 0],  # middle box is crowd
    }))

  batches = list(nl.NativeParallelDetectionLoader(
      [path], batch_size=1, canvas_size=canvas, max_instances=g,
      skip_crowd=True, num_workers=2, repeat=False))
  assert len(batches) == 1
  b = batches[0]
  assert b["image"].shape == (1, canvas, canvas, 3)
  np.testing.assert_allclose(b["true_hw"][0], [32.0, 64.0])
  assert float(b["source_id"][0]) == 1234.0
  # crowd box dropped; boxes in canvas coords: norm * content dims
  np.testing.assert_allclose(
      b["gt_boxes"][0][:2],
      [[0.0, 0.0, 16.0, 32.0], [16.0, 32.0, 32.0, 64.0]], atol=1e-4)
  np.testing.assert_array_equal(b["gt_classes"][0], [3, 9, -1, -1, -1])

  # skip_crowd=False keeps all three
  (b2,) = list(nl.NativeParallelDetectionLoader(
      [path], batch_size=1, canvas_size=canvas, max_instances=g,
      skip_crowd=False, num_workers=1, repeat=False))
  np.testing.assert_array_equal(b2["gt_classes"][0], [3, 7, 9, -1, -1])


def test_native_parallel_pipeline_partial_tail_batch(tmp_path):
  """n not divisible by batch: the final partial batch arrives complete —
  exhaustion is declared only when reader is done AND no record is queued
  or mid-decode (exact in_flight accounting, no grace-period heuristics)."""
  import io
  from PIL import Image
  from automl_tpu.data import native_loader as nl
  path = str(tmp_path / "t.tfrecord")
  n = 11
  with nl.TFRecordWriter(path) as w:
    for i in range(n):
      buf = io.BytesIO()
      # larger images -> slower decode, stressing the tail race
      Image.fromarray(np.full((200, 300, 3), i, np.uint8)).save(buf, "JPEG")
      w.write(nl.build_example({"image/encoded": [buf.getvalue()],
                                "image/class/label": [i % 4]}))
  for workers in (1, 4):
    batches = list(nl.NativeParallelClassificationLoader(
        [path], batch_size=4, canvas_size=32, num_classes=4,
        num_workers=workers, repeat=False))
    counts = [b["image"].shape[0] for b in batches]
    assert sum(counts) == n, (workers, counts)
    assert counts[-1] == n % 4, (workers, counts)
