"""LM data pipeline: tokenize -> pack -> fixed-shape batches.

Capability parity with hero/data_lib.py (seqio packed LM feature conversion,
per-process batch slicing, loss-weight masks) without the seqio/TFDS
dependency stack. Default tokenizer is byte-level (vocab 256 + specials) —
self-contained; any {encode, decode, vocab_size} object can be swapped in.
"""

from __future__ import annotations

import itertools
from typing import Iterable, Iterator

import numpy as np

PAD_ID = 0
EOS_ID = 1
BOS_ID = 2
_NUM_SPECIALS = 3


class ByteTokenizer:
  """Byte-level tokenizer: vocab = 3 specials + 256 byte values."""

  vocab_size = _NUM_SPECIALS + 256

  def encode(self, text: str) -> list[int]:
    return [b + _NUM_SPECIALS for b in text.encode("utf-8")]

  def decode(self, ids) -> str:
    data = bytes(int(i) - _NUM_SPECIALS for i in ids
                 if int(i) >= _NUM_SPECIALS)
    return data.decode("utf-8", errors="replace")


def pack_documents(token_streams: Iterable[list[int]], seq_len: int,
                   add_bos: bool = True) -> Iterator[dict]:
  """Pack documents into [seq_len + 1] token rows with segment ids and loss
  weights (packed LM feature conversion, cf. hero/data_lib.py:174-247).

  Documents are concatenated with EOS separators; rows carry `segment_ids`
  so attention can be masked per document, and `loss_weights` zeroing pad.
  """
  width = seq_len + 1
  buf: list[int] = []
  seg: list[int] = []
  seg_id = 1
  for doc in token_streams:
    tokens = ([BOS_ID] if add_bos else []) + list(doc) + [EOS_ID]
    buf.extend(tokens)
    seg.extend([seg_id] * len(tokens))
    seg_id += 1
    while len(buf) >= width:
      row, buf = buf[:width], buf[width:]
      row_seg, seg = seg[:width], seg[width:]
      yield {
          "tokens": np.asarray(row, np.int32),
          "segment_ids": np.asarray(row_seg, np.int32),
          "loss_weights": (np.asarray(row, np.int32) != PAD_ID).astype(
              np.float32),
      }
  if buf:
    pad = width - len(buf)
    row = np.asarray(buf + [PAD_ID] * pad, np.int32)
    row_seg = np.asarray(seg + [0] * pad, np.int32)
    yield {"tokens": row, "segment_ids": row_seg,
           "loss_weights": (row != PAD_ID).astype(np.float32)}


class PackedLMLoader:
  """Text documents -> packed {tokens, segment_ids, loss_weights} batches.

  Per-process slicing for multi-host training mirrors
  hero/data_lib.py:250-270 (`shard_index` / `num_shards`)."""

  def __init__(self, documents: Iterable[str], batch_size: int, seq_len: int,
               tokenizer=None, repeat: bool = True,
               shard_index: int = 0, num_shards: int = 1):
    self.documents = list(documents)
    self.batch_size = batch_size
    self.seq_len = seq_len
    self.tokenizer = tokenizer or ByteTokenizer()
    self.repeat = repeat
    self.shard_index = shard_index
    self.num_shards = num_shards

  @classmethod
  def from_text_file(cls, path: str, batch_size: int, seq_len: int,
                     separator: str = "\n\n", **kw):
    with open(path) as f:
      docs = [d for d in f.read().split(separator) if d.strip()]
    return cls(docs, batch_size, seq_len, **kw)

  def __iter__(self):
    def doc_tokens():
      docs = self.documents[self.shard_index::self.num_shards]
      epoch = itertools.cycle(docs) if self.repeat else iter(docs)
      for doc in epoch:
        yield self.tokenizer.encode(doc)

    rows = pack_documents(doc_tokens(), self.seq_len)
    while True:
      batch = list(itertools.islice(rows, self.batch_size))
      if len(batch) < self.batch_size:
        return
      yield {k: np.stack([r[k] for r in batch]) for k in batch[0]}
