"""Definition/repetition level encoding.

Reference semantics:
- levels are RLE/bit-packed hybrid at width = bit_width(max_level)
  (rle_builder over RleEncoder, encoding.hh:206-244; level_decoder
  encoding.hh:42-82, src/encoding.cc:26-79).
- V1 data pages prefix the level stream with a u32-LE byte length
  (level_decoder::reset_v1, encoding.cc:34-50; page assembly
  column_chunk_writer.hh:98-113).
- width 0 (max_level == 0) encodes nothing and decodes as all-zero
  (encoding.hh read_batch width-0 path).

Our engine's flat 5-column input table has max_def = 1 (nullable columns),
max_rep = 0; nested max-level cases are exercised in unit tests to preserve
the reference's level semantics (tests/column_chunk_writer_test.cc:41-108,
reader_schema.cc:79-93).
"""

from __future__ import annotations

import struct

import numpy as np

from .bitpack import bit_width
from .rle import rle_decode, rle_encode

__all__ = ["encode_levels_v1", "decode_levels_v1", "level_bit_width"]


def level_bit_width(max_level: int) -> int:
    return bit_width(max_level)


def encode_levels_v1(levels: np.ndarray, max_level: int) -> bytes:
    """[u32-LE length][RLE hybrid levels]; empty for max_level == 0."""
    width = bit_width(max_level)
    if width == 0:
        return b""
    payload = rle_encode(np.asarray(levels, dtype=np.uint64), width)
    return struct.pack("<I", len(payload)) + payload


def decode_levels_v1(buf, max_level: int, num_values: int) -> tuple[np.ndarray, int]:
    """Returns (levels int32[num_values], bytes consumed)."""
    width = bit_width(max_level)
    if width == 0:
        return np.zeros(num_values, dtype=np.int32), 0
    if len(buf) < 4:
        raise ValueError("end of page while reading levels")
    (length,) = struct.unpack_from("<i", buf, 0)
    if length < 0:
        raise ValueError(f"negative RLE levels length ({length})")
    if 4 + length > len(buf):
        raise ValueError("end of page while reading levels")
    levels = rle_decode(bytes(buf[4 : 4 + length]), width, num_values)
    if len(levels) != num_values:
        raise ValueError(f"level stream truncated: {len(levels)} of {num_values}")
    out = levels.astype(np.int32)
    if len(out) and int(out.max()) > max_level:
        raise ValueError("level value out of range")
    return out, 4 + length


def encode_levels_v2(levels: np.ndarray, max_level: int) -> bytes:
    """V2 level stream: RLE hybrid without the u32 length prefix
    (level_decoder::reset_v2, src/encoding.cc:68-79)."""
    width = bit_width(max_level)
    if width == 0:
        return b""
    return rle_encode(np.asarray(levels, dtype=np.uint64), width)


def decode_levels_v2(buf, max_level: int, num_values: int) -> np.ndarray:
    width = bit_width(max_level)
    if width == 0:
        return np.zeros(num_values, dtype=np.int32)
    levels = rle_decode(bytes(buf), width, num_values)
    if len(levels) != num_values:
        raise ValueError(f"level stream truncated: {len(levels)} of {num_values}")
    return levels.astype(np.int32)


def decode_levels_bit_packed(buf, max_level: int, num_values: int) -> np.ndarray:
    """Deprecated BIT_PACKED level encoding (LSB-first bit-packed, no RLE)
    -- decode-only, like the reference (encoding.cc:51-63)."""
    from .bitpack import unpack_bits

    width = bit_width(max_level)
    if width == 0:
        return np.zeros(num_values, dtype=np.int32)
    byte_len = (num_values * width + 7) // 8
    if byte_len > len(buf):
        raise ValueError("end of page while reading BIT_PACKED levels")
    return unpack_bits(bytes(buf[:byte_len]), width, num_values).astype(np.int32)
