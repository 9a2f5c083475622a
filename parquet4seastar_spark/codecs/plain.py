"""PLAIN encoding for all physical types.

Wire parity with the reference:
- fixed-width types: raw little-endian values back-to-back
  (plain_encoder<T>, src/encoding.cc:618-643; decoder :81-88).
- BOOLEAN: LSB-first bit-packed (plain_decoder_boolean, encoding.cc:90-96).
  The reference writes booleans via the generic fixed path on its bool io
  type; we use the parquet-standard bit-packed form for both directions.
- BYTE_ARRAY: u32-LE length prefix + bytes per value
  (plain_encoder<BYTE_ARRAY>, encoding.cc:645-676; decoder :98-104, 430-450).
- FIXED_LEN_BYTE_ARRAY: raw bytes, no prefix (encoding.cc:678-708).

Byte-array columns are carried as ``(lengths: np.int32[n], payload: bytes)``
pairs -- the same offsets+data layout Arrow uses, so conversion from a
``pyarrow.Array`` is zero-copy on the payload.
"""

from __future__ import annotations

import numpy as np

from .chain import chain_visit

__all__ = [
    "plain_encode_fixed",
    "plain_decode_fixed",
    "plain_encode_bool",
    "plain_decode_bool",
    "plain_encode_byte_array",
    "plain_decode_byte_array",
    "plain_encode_flba",
    "plain_decode_flba",
]


def plain_encode_fixed(values: np.ndarray) -> bytes:
    """INT32/INT64/FLOAT/DOUBLE: memcpy semantics, little-endian."""
    return np.ascontiguousarray(values).astype(values.dtype.newbyteorder("<"), copy=False).tobytes()


def plain_decode_fixed(buf: bytes, dtype: np.dtype, n: int) -> np.ndarray:
    dtype = np.dtype(dtype).newbyteorder("<")
    need = dtype.itemsize * n
    if len(buf) < need:
        raise ValueError(f"PLAIN buffer too short: need {need}B, have {len(buf)}B")
    return np.frombuffer(buf, dtype=dtype, count=n).copy()


def plain_encode_bool(values: np.ndarray) -> bytes:
    return np.packbits(np.asarray(values, dtype=bool), bitorder="little").tobytes()


def plain_decode_bool(buf: bytes, n: int) -> np.ndarray:
    if len(buf) * 8 < n:
        raise ValueError("PLAIN boolean buffer too short")
    return np.unpackbits(np.frombuffer(buf, dtype=np.uint8), bitorder="little")[:n].astype(bool)


def plain_encode_byte_array(lengths: np.ndarray, payload: bytes) -> bytes:
    """Interleave u32-LE lengths with value bytes.

    C kernel (one memcpy per value) when available; the numpy fallback
    scatters through per-byte fancy indices (byte-identical output)."""
    n = len(lengths)
    if n == 0:
        return b""
    lengths = np.ascontiguousarray(lengths, dtype=np.int64)
    payload_arr = np.frombuffer(payload, dtype=np.uint8)
    total_payload = int(lengths.sum())
    if len(payload_arr) != total_payload:
        raise ValueError("payload size does not match lengths")
    from . import _native

    lib = _native.get_kernel()
    if lib is not None:
        import ctypes

        payload_arr = np.ascontiguousarray(payload_arr)
        out = np.empty(4 * n + total_payload, dtype=np.uint8)
        wrote = lib.p4s_plain_ba_encode(
            ctypes.c_void_p(lengths.ctypes.data), n,
            ctypes.c_void_p(payload_arr.ctypes.data),
            ctypes.c_void_p(out.ctypes.data),
        )
        return out[:wrote].tobytes()
    out = np.empty(4 * n + total_payload, dtype=np.uint8)
    # value start offsets in the output (after each 4-byte prefix)
    starts = np.zeros(n, dtype=np.int64)
    starts[1:] = np.cumsum(lengths)[:-1]
    out_starts = starts + 4 * (np.arange(n, dtype=np.int64) + 1)
    # scatter the 4 length bytes
    len_le = lengths.astype("<u4").view(np.uint8).reshape(n, 4)
    len_targets = (out_starts - 4)[:, None] + np.arange(4, dtype=np.int64)
    out[len_targets.reshape(-1)] = len_le.reshape(-1)
    # scatter payload bytes
    if total_payload:
        owner = np.repeat(np.arange(n, dtype=np.int64), lengths)
        targets = np.arange(total_payload, dtype=np.int64) + 4 * (owner + 1)
        out[targets] = payload_arr
    return out.tobytes()


def plain_decode_byte_array(buf: bytes, n: int) -> tuple[np.ndarray, bytes]:
    """Walk the length-prefix chain with pointer doubling (no per-value loop).

    Returns (lengths int32[n], payload bytes).
    """
    if n == 0:
        return np.zeros(0, dtype=np.int32), b""
    raw = np.frombuffer(buf, dtype=np.uint8)
    size = len(raw)
    if size < 4:
        raise ValueError("PLAIN byte-array buffer too short")
    # u32 at every byte offset (sliding window)
    padded = np.zeros(size + 3, dtype=np.uint8)
    padded[:size] = raw
    win = np.lib.stride_tricks.sliding_window_view(padded, 4)[:size]
    u32_at = (win.astype(np.uint32) * np.array([1, 1 << 8, 1 << 16, 1 << 24], dtype=np.uint32)).sum(
        axis=1, dtype=np.uint32
    )
    nxt = np.empty(size + 1, dtype=np.int64)
    nxt[:size] = np.arange(size, dtype=np.int64) + 4 + u32_at.astype(np.int64)
    nxt[size] = size
    positions = chain_visit(nxt, 0)
    if len(positions) < n:
        raise ValueError(f"PLAIN byte-array buffer truncated: {len(positions)} of {n} values")
    positions = positions[:n]
    lengths = u32_at[positions].astype(np.int64)
    ends = positions + 4 + lengths
    if len(positions) and ends[-1] > size:
        raise ValueError("PLAIN byte-array value overruns buffer")
    total = int(lengths.sum())
    owner_start = positions + 4
    idx = np.repeat(owner_start, lengths) + (
        np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(lengths) - lengths, lengths)
    )
    payload = raw[idx].tobytes() if total else b""
    return lengths.astype(np.int32), payload


def plain_encode_flba(payload: bytes) -> bytes:
    """FIXED_LEN_BYTE_ARRAY: raw concatenation."""
    return bytes(payload)


def plain_decode_flba(buf: bytes, type_length: int, n: int) -> bytes:
    need = type_length * n
    if len(buf) < need:
        raise ValueError("PLAIN FLBA buffer too short")
    return bytes(buf[:need])
