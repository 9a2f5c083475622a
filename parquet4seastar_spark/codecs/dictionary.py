"""RLE_DICTIONARY codec: insertion-ordered dictionary + RLE/bit-packed codes.

Wire parity with the reference:
- dict_builder (src/encoding.cc:710-761): dictionary entries in first-seen
  order, dictionary page itself PLAIN-encoded.
- dict_encoder::flush (encoding.cc:763-799): data page = 1 byte bit width +
  RLE/bit-packed code stream; **index bit width = bit_width(cardinality)**
  (not cardinality-1): 5 entries => width 3
  (tests/dictionary_encoder_test.cc:69).
- dict_decoder (encoding.cc:117-131, 468-508): [width byte][RLE codes] ->
  gather from dictionary.  The reference's bound check is `> dict_size`
  (an off-by-one, encoding.cc:489); we validate with `>=` instead.
- The 16 KiB fallback decision (dict_or_plain_encoder, encoding.cc:801-845)
  is chunk-level and lives in pages.py.

The dictionary build is `pyarrow.Array.dictionary_encode`, which preserves
first-occurrence order -- one vectorized call replaces the reference's
per-value hash-map inserts.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .bitpack import bit_width
from .rle import rle_decode, rle_encode

__all__ = ["build_dict", "encode_dict_indices", "decode_dict_indices"]


def build_dict(values: pa.Array) -> tuple[np.ndarray, pa.Array]:
    """Return (codes int32[n], dictionary array in first-seen order)."""
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    encoded = values.dictionary_encode()
    codes = encoded.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return codes, encoded.dictionary


def encode_dict_indices(codes: np.ndarray, cardinality: int) -> bytes:
    """Data-page payload: [1-byte bit width][RLE/bit-packed codes]."""
    width = bit_width(cardinality)
    return bytes([width]) + rle_encode(np.asarray(codes, dtype=np.uint64), width)


def decode_dict_indices(buf: bytes, n: int, dict_size: int) -> np.ndarray:
    if len(buf) < 1:
        raise ValueError("dictionary-encoded page too short")
    width = buf[0]
    if width > 32:
        raise ValueError(f"dictionary index bit width too large ({width})")
    codes = rle_decode(buf[1:], width, n)
    if len(codes) != n:
        raise ValueError(f"dictionary page truncated: {len(codes)} of {n} codes")
    if len(codes) and int(codes.max()) >= dict_size:
        raise ValueError("dictionary index out of range")
    return codes.astype(np.int64)
