"""Column-chunk encode/decode: pages, dictionary fallback, codec selection.

This is the Spark-facing equivalent of the reference's
``column_chunk_writer``/``column_chunk_reader`` pair re-architected for
columnar batches:

- A *chunk* is the slice of one column held by one Spark partition (or a
  bounded sub-slice of it).  Pages are produced per ~page_target_bytes of
  value data (caller-driven page sizing, like the reference's manual
  ``flush_page`` -- column_chunk_writer.hh:91-96, examples/example.cc:188-210).
- V1 page layout: [u32-LE def-level length][RLE def levels][value bytes]
  (column_chunk_writer.hh:98-139; max_rep = 0 for our flat table so no rep
  section).  Values are encoded only for def == max_def rows (nulls skipped,
  column_chunk_writer.hh:75-89).
- Dictionary fallback: pages are dictionary-encoded until, at a page flush,
  the accumulated dictionary exceeds 16 KiB; subsequent pages are PLAIN and
  the dictionary page (entries first seen up to the overflow page) is still
  written (dict_or_plain_encoder, src/encoding.cc:801-845, threshold :814,
  check :833).
- Codec auto-selection (our generalization of that fallback heuristic):
  candidate codecs are *actually encoded* (cheap ones) or sample-estimated
  (FSST) and the smallest wins; the reference's static policy is always a
  candidate, so the selected total never exceeds the reference-policy size.

Whole-page compression: UNCOMPRESSED or GZIP (zlib).  The reference also
supports SNAPPY (src/compression.cc:29-158); no snappy binding is available
in this environment, so SNAPPY raises -- the primary metric is encoded
bytes, compression is an orthogonal layer.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from . import delta, dictionary, fsst, plain
from .levels import decode_levels_v1, encode_levels_v1
from .rle import rle_decode, rle_encode

__all__ = ["encode_chunk", "decode_chunk", "ba_components", "EncodedChunk", "Page"]

DICT_FALLBACK_THRESHOLD = 16 * 1024  # dict_or_plain_encoder::fallback_threshold

_FIXED_DTYPES = {
    "INT32": np.dtype("<i4"),
    "INT64": np.dtype("<i8"),
    "FLOAT": np.dtype("<f4"),
    "DOUBLE": np.dtype("<f8"),
}

_PA_TO_PTYPE = {
    pa.int32(): "INT32",
    pa.int64(): "INT64",
    pa.float32(): "FLOAT",
    pa.float64(): "DOUBLE",
    pa.bool_(): "BOOLEAN",
    pa.string(): "BYTE_ARRAY",
    pa.binary(): "BYTE_ARRAY",
    pa.large_string(): "BYTE_ARRAY",
    pa.large_binary(): "BYTE_ARRAY",
}


@dataclass
class Page:
    kind: str  # 'dict' | 'data'
    encoding: str  # PLAIN | RLE_DICTIONARY | DELTA_BINARY_PACKED | DELTA_LENGTH_BYTE_ARRAY | FSST | RLE
    num_values: int  # level count (rows) for data pages; entries for dict page
    num_non_null: int
    uncompressed_size: int
    compressed_size: int
    data: bytes


@dataclass
class EncodedChunk:
    ptype: str  # physical type of the LEAF values
    logical: str  # flat: 'string'|'binary'|'int32'|...; nested: 'list<elem>'
    nullable: bool
    num_rows: int
    num_nulls: int
    cardinality: int
    encodings: list[str]
    compression: str
    type_length: int = 0
    pages: list[Page] = field(default_factory=list)
    input_bytes: int = 0  # uncompressed logical bytes (PLAIN-equivalent size)
    encoded_bytes: int = 0  # sum of page uncompressed sizes (post-encoding)
    compressed_bytes: int = 0
    sha256: str = ""
    # Dremel level geometry (reader_schema.cc:79-93 / file_writer.hh:50-81):
    # flat optional column -> (1, 0); list column -> max_rep = 1 and
    # max_def = outer_optional + 1 (repeated) + elem_optional
    max_def: int = -1  # -1: derive from `nullable` (flat back-compat)
    max_rep: int = 0
    elem_nullable: bool = False
    # chunk statistics for scan pruning (beyond the reference: it never
    # writes ColumnMetaData statistics).  Numeric bounds are ulp-widened so
    # double storage stays conservative; byte bounds are 16-byte prefixes
    # with the upper bound truncate-and-incremented (parquet-style).
    stat_min_num: float | None = None
    stat_max_num: float | None = None
    stat_min_bin: bytes | None = None
    stat_max_bin: bytes | None = None
    # equality-pruning bloom filter (int64[bloom.BLOOM_WORDS] or None):
    # min/max stats cannot prune point lookups on unsorted data; the bloom
    # proves ABSENCE of a literal, so prune_chunks(eq=...) can drop chunks
    # the range test keeps.  Built for flat key-like columns only (see
    # codecs/bloom.py caps).
    bloom: np.ndarray | None = None

    @property
    def total_size(self) -> int:
        return self.compressed_bytes


def pa_ptype(arr: pa.Array) -> tuple[str, str]:
    t = arr.type
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        # up to TWO levels of repetition (standard parquet 3-level LIST,
        # writer_schema.cc:30-134); ptype reports the LEAF physical type
        elem = t.value_type
        if pa.types.is_list(elem) or pa.types.is_large_list(elem):
            inner = elem.value_type
            if pa.types.is_nested(inner):
                raise TypeError(
                    f"encode_chunk caps at list<list<primitive>> (standard "
                    f"single-spec geometry); use encode_dremel_column for {t}"
                )
            elem_ptype, elem_logical = pa_ptype_scalar(inner)
            return elem_ptype, f"list<list<{elem_logical}>>"
        if pa.types.is_nested(elem):
            raise TypeError(
                f"encode_chunk handles primitive list elements; use "
                f"encode_dremel_column for {t}"
            )
        elem_ptype, elem_logical = pa_ptype_scalar(elem)
        return elem_ptype, f"list<{elem_logical}>"
    return pa_ptype_scalar(t)


def _decimal_byte_width(precision: int) -> int:
    """Minimal FLBA width holding 10^p - 1 in two's complement (the
    reference's DECIMAL/FLBA validation rule, logical_type.cc:94-115)."""
    w = 1
    while (1 << (8 * w - 1)) <= 10**precision - 1:
        w += 1
    return w


def pa_ptype_scalar(t: pa.DataType) -> tuple[str, str]:
    if pa.types.is_decimal(t):
        # DECIMAL annotates INT32 (p<=9), INT64 (p<=18) or FLBA, mirroring
        # the reference's logical->physical validation (logical_type.cc:94-115)
        p, s = t.precision, t.scale
        if p <= 9:
            return "INT32", f"decimal({p},{s})"
        if p <= 18:
            return "INT64", f"decimal({p},{s})"
        return "FIXED_LEN_BYTE_ARRAY", f"decimal({p},{s})"
    if pa.types.is_fixed_size_binary(t):
        return "FIXED_LEN_BYTE_ARRAY", "flba"
    # logical types layered on INT32/INT64 physical storage, mirroring the
    # reference's logical_type validation rules ("TIMESTAMP must annotate
    # INT64", logical_type.cc:47; DATE annotates INT32)
    if pa.types.is_timestamp(t):
        if t.unit != "us":
            raise TypeError(f"timestamp unit {t.unit} unsupported (use us)")
        return "INT64", "timestamp_us"
    if pa.types.is_date32(t):
        return "INT32", "date"
    if t in _PA_TO_PTYPE:
        ptype = _PA_TO_PTYPE[t]
        logical = {
            "INT32": "int32",
            "INT64": "int64",
            "FLOAT": "float",
            "DOUBLE": "double",
            "BOOLEAN": "bool",
        }.get(ptype)
        if logical is None:
            logical = "string" if pa.types.is_string(t) or pa.types.is_large_string(t) else "binary"
        return ptype, logical
    raise TypeError(f"unsupported arrow type for chunk encoding: {t}")


def ba_components(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(lengths int64[n], payload uint8[]) for a null-free binary/string array."""
    if len(arr) == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.uint8)
    if pa.types.is_string(arr.type) or pa.types.is_binary(arr.type):
        arr = arr.cast(pa.large_binary())
    elif pa.types.is_large_string(arr.type):
        arr = arr.cast(pa.large_binary())
    buffers = arr.buffers()
    offsets = np.frombuffer(buffers[1], dtype=np.int64, count=len(arr) + 1, offset=arr.offset * 8)
    data = np.frombuffer(buffers[2], dtype=np.uint8) if buffers[2] is not None else np.zeros(0, dtype=np.uint8)
    lengths = np.diff(offsets)
    payload = data[offsets[0] : offsets[-1]]
    return lengths.astype(np.int64), payload


def _parse_decimal(logical: str) -> tuple[int, int]:
    p, s = logical[8:-1].split(",")
    return int(p), int(s)


def _decimal_to_physical(arr: pa.Array, ptype: str) -> pa.Array:
    """decimal128 -> unscaled INT32/INT64 values, or big-endian
    two's-complement FLBA (the parquet wire form for DECIMAL on FLBA)."""
    n = len(arr)
    if arr.offset:
        arr = arr.take(np.arange(n, dtype=np.int64))  # rebase sliced input
    p = arr.type.precision
    validity = arr.buffers()[0]
    raw = np.frombuffer(arr.buffers()[1], dtype=np.int64, count=2 * n).reshape(n, 2)
    if ptype == "INT32":
        # |unscaled| < 10^9 < 2^31: the low word reinterpreted signed IS it
        vals = raw[:, 0].astype(np.int32)
        return pa.Array.from_buffers(pa.int32(), n, [validity, pa.py_buffer(vals.tobytes())])
    if ptype == "INT64":
        return pa.Array.from_buffers(
            pa.int64(), n, [validity, pa.py_buffer(np.ascontiguousarray(raw[:, 0]).tobytes())]
        )
    w = _decimal_byte_width(p)
    le16 = np.frombuffer(arr.buffers()[1], dtype=np.uint8, count=16 * n).reshape(n, 16)
    be = le16[:, ::-1][:, 16 - w :]  # big-endian two's complement, w bytes
    return pa.Array.from_buffers(
        pa.binary(w), n, [validity, pa.py_buffer(np.ascontiguousarray(be).tobytes())]
    )


def _int_to_decimal(full: np.ndarray, valid: np.ndarray, has_nulls: bool, p: int, s: int) -> pa.Array:
    n = len(full)
    pairs = np.empty((n, 2), dtype=np.int64)
    pairs[:, 0] = full.astype(np.int64)
    pairs[:, 1] = np.where(pairs[:, 0] < 0, np.int64(-1), np.int64(0))
    validity = pa.py_buffer(np.packbits(valid, bitorder="little").tobytes()) if has_nulls else None
    return pa.Array.from_buffers(
        pa.decimal128(p, s), n, [validity, pa.py_buffer(pairs.tobytes())]
    )


def _varbin_to_decimal(
    full_lens: np.ndarray, payload: np.ndarray, valid: np.ndarray, has_nulls: bool, p: int, s: int
) -> pa.Array:
    """DECIMAL on BYTE_ARRAY physical (4th mapping, logical_type.cc:94-115):
    variable-length big-endian two's complement -> decimal128."""
    n = len(full_lens)
    if (full_lens > 16).any():
        raise ValueError("BYTE_ARRAY decimal wider than 16 bytes")
    be16 = np.zeros((n, 16), dtype=np.uint8)
    total = int(full_lens.sum())
    if total:
        starts = np.zeros(n, dtype=np.int64)
        starts[1:] = np.cumsum(full_lens)[:-1]
        rows = np.repeat(np.arange(n, dtype=np.int64), full_lens)
        rel = np.arange(total, dtype=np.int64) - np.repeat(starts, full_lens)
        cols = rel + np.repeat(16 - full_lens, full_lens)
        be16[rows, cols] = payload
        neg = np.zeros(n, dtype=bool)
        nz = full_lens > 0
        neg[nz] = payload[starts[nz]] >= 128
        pad = np.arange(16)[None, :] < (16 - full_lens)[:, None]
        be16[pad & neg[:, None]] = 255
    le16 = be16[:, ::-1]
    validity = pa.py_buffer(np.packbits(valid, bitorder="little").tobytes()) if has_nulls else None
    return pa.Array.from_buffers(
        pa.decimal128(p, s), n, [validity, pa.py_buffer(np.ascontiguousarray(le16).tobytes())]
    )


def _flba_to_decimal(full: np.ndarray, valid: np.ndarray, has_nulls: bool, p: int, s: int) -> pa.Array:
    n, w = full.shape
    be16 = np.empty((n, 16), dtype=np.uint8)
    sign = full[:, 0] >= 128
    be16[:, : 16 - w] = np.where(sign, 255, 0).astype(np.uint8)[:, None]
    be16[:, 16 - w :] = full
    le16 = be16[:, ::-1]
    validity = pa.py_buffer(np.packbits(valid, bitorder="little").tobytes()) if has_nulls else None
    return pa.Array.from_buffers(
        pa.decimal128(p, s), n, [validity, pa.py_buffer(np.ascontiguousarray(le16).tobytes())]
    )


def _compress(data: bytes, compression: str) -> bytes:
    if compression == "uncompressed":
        return data
    if compression == "gzip":
        # gzip FRAMING (wbits=31), the parquet GZIP codec's wire format --
        # our pages and real .parquet files share one representation
        co = zlib.compressobj(6, zlib.DEFLATED, 31)
        return co.compress(bytes(data)) + co.flush()
    if compression == "snappy":
        from .snappy_py import snappy_compress

        return snappy_compress(bytes(data))
    raise ValueError(f"unsupported compression: {compression}")


def _decompress(data: bytes, compression: str) -> bytes:
    if compression == "uncompressed":
        return data
    if compression == "gzip":
        # wbits=47 auto-detects gzip or zlib frames (reads both the current
        # format and pages written before the framing switch)
        return zlib.decompress(bytes(data), 47)
    if compression == "snappy":
        from .snappy_py import snappy_decompress

        return snappy_decompress(data)
    raise ValueError(f"unsupported compression: {compression}")


# ---------------------------------------------------------------------------
# value payload encode/decode per codec


def _encode_values(encoding: str, ptype: str, values, lengths=None, payload=None, fsst_table=None) -> bytes:
    """Encode the non-null values of one page."""
    if encoding == "PLAIN":
        if ptype == "BOOLEAN":
            return plain.plain_encode_bool(values)
        if ptype == "BYTE_ARRAY":
            return plain.plain_encode_byte_array(lengths, payload.tobytes())
        if ptype == "FIXED_LEN_BYTE_ARRAY":
            return plain.plain_encode_flba(values.tobytes())
        return plain.plain_encode_fixed(values)
    if encoding == "DELTA_BINARY_PACKED":
        nbytes = 4 if ptype == "INT32" else 8
        return delta.dbp_encode(values, nbytes)
    if encoding == "DELTA_LENGTH_BYTE_ARRAY":
        return delta.dlba_encode(lengths.astype(np.int32), payload.tobytes())
    if encoding == "DELTA_BYTE_ARRAY":
        return delta.delta_byte_array_encode(lengths, payload)
    if encoding == "FSST":
        # symbol table trained once per chunk and shared across pages
        # (training costs ~60-90ms; per-page training caps throughput)
        table = fsst_table if fsst_table is not None else fsst.train_symbol_table(payload[: 1 << 16])
        blob = fsst.fsst_encode(payload, table)
        return delta.dbp_encode(lengths.astype(np.int32), 4) + blob
    if encoding == "RLE":  # boolean RLE
        # the spec prefixes RLE-encoded DATA values (booleans) with their
        # byte length as u32-LE (Encodings.md; levels carry the prefix only
        # in V1 pages).  Interop-fuzz finding: pyarrow V2 boolean pages use
        # exactly this layout, and pyarrow equally expects it when reading
        # our exports.
        body = rle_encode(np.asarray(values, dtype=np.uint64), 1)
        return struct.pack("<I", len(body)) + body
    if encoding == "BYTE_STREAM_SPLIT":
        return delta.byte_stream_split_encode(values)
    raise ValueError(f"unknown value encoding {encoding}")


def _decode_values(encoding: str, ptype: str, buf, n: int, dict_ctx=None, type_length: int = 0):
    """Decode n non-null values; returns np array or (lengths, payload)."""
    if encoding == "PLAIN":
        if ptype == "BOOLEAN":
            return plain.plain_decode_bool(buf, n)
        if ptype == "BYTE_ARRAY":
            lengths, payload = plain.plain_decode_byte_array(buf, n)
            return lengths.astype(np.int64), np.frombuffer(payload, dtype=np.uint8)
        if ptype == "FIXED_LEN_BYTE_ARRAY":
            raw = plain.plain_decode_flba(bytes(buf), type_length, n)
            return np.frombuffer(raw, dtype=np.uint8).reshape(n, type_length)
        return plain.plain_decode_fixed(bytes(buf), _FIXED_DTYPES[ptype], n)
    if encoding == "DELTA_BINARY_PACKED":
        nbytes = 4 if ptype == "INT32" else 8
        vals, _ = delta.dbp_decode(buf, nbytes)
        if len(vals) != n:
            raise ValueError("DELTA_BINARY_PACKED count mismatch")
        return vals
    if encoding == "DELTA_LENGTH_BYTE_ARRAY":
        lengths, payload = delta.dlba_decode(buf, n)
        return lengths.astype(np.int64), np.frombuffer(payload, dtype=np.uint8)
    if encoding == "DELTA_BYTE_ARRAY":
        lengths, payload = delta.delta_byte_array_decode_components(buf, n)
        return lengths.astype(np.int64), np.frombuffer(payload, dtype=np.uint8)
    if encoding == "FSST":
        lengths, pos = delta.dbp_decode(buf, 4)
        if len(lengths) != n:
            raise ValueError("FSST count mismatch")
        payload = fsst.fsst_decode(memoryview(buf)[pos:])
        if len(payload) != int(lengths.astype(np.int64).sum()):
            raise ValueError("FSST payload length mismatch")
        return lengths.astype(np.int64), np.frombuffer(payload, dtype=np.uint8)
    if encoding == "RLE":
        if len(buf) < 4:
            raise ValueError("RLE boolean truncated")
        (ln,) = struct.unpack_from("<I", buf, 0)
        if 4 + ln > len(buf):
            raise ValueError("RLE boolean truncated")
        vals = rle_decode(bytes(memoryview(buf)[4 : 4 + ln]), 1, n)
        if len(vals) != n:
            raise ValueError("RLE boolean truncated")
        return vals.astype(bool)
    if encoding == "BYTE_STREAM_SPLIT":
        return delta.byte_stream_split_decode(bytes(buf), _FIXED_DTYPES[ptype], n)
    if encoding == "RLE_DICTIONARY":
        codes = dictionary.decode_dict_indices(bytes(buf), n, dict_ctx)
        return codes
    raise ValueError(f"unknown value encoding {encoding}")


# ---------------------------------------------------------------------------


def _page_boundaries(row_bytes: np.ndarray, target: int) -> np.ndarray:
    """Row indices where pages end (always ends with n)."""
    n = len(row_bytes)
    if n == 0:
        return np.array([0], dtype=np.int64)
    cum = np.cumsum(row_bytes, dtype=np.int64)
    ends = []
    start = 0
    base = 0
    while start < n:
        # first row where page exceeds target
        end = int(np.searchsorted(cum, base + target, side="left")) + 1
        end = max(end, start + 1)
        end = min(end, n)
        ends.append(end)
        base = int(cum[end - 1])
        start = end
    return np.array(ends, dtype=np.int64)


def _train_chunk_table(payload):
    return fsst.train_symbol_table(np.ascontiguousarray(payload[: 1 << 16]))


def _chunk_bloom(chunk: EncodedChunk, ptype: str, values, lengths, payload) -> None:
    """Fill the equality-pruning bloom from the non-null flat values."""
    from . import bloom as _bloom

    if ptype in ("INT32", "INT64") and values is not None and 0 < len(values) <= _bloom.MAX_BLOOM_VALUES:
        h1, h2 = _bloom.int_hashes(values)
    elif (
        ptype == "BYTE_ARRAY"
        and lengths is not None
        and 0 < len(lengths) <= _bloom.MAX_BLOOM_VALUES
        and int(lengths.max()) <= _bloom.MAX_BLOOM_VALUE_LEN
    ):
        h1, h2 = _bloom.bytes_hashes(lengths, payload)
    else:
        return
    chunk.bloom = _bloom.build_bloom(h1, h2)


def _chunk_stats(chunk: EncodedChunk, ptype: str, values, lengths, payload) -> None:
    """Fill conservative min/max stats from the non-null flat values."""
    if ptype in _FIXED_DTYPES and values is not None and len(values):
        # NaN would poison min/max (and NaN bounds make every range test
        # false -> wrong pruning): skip stats when any value is NaN
        if values.dtype.kind == "f" and bool(np.isnan(values).any()):
            return
        lo = float(values.min())
        hi = float(values.max())
        # double can't represent every int64: widen one ulp each way so the
        # stored bounds always contain the true range
        chunk.stat_min_num = float(np.nextafter(lo, -np.inf))
        chunk.stat_max_num = float(np.nextafter(hi, np.inf))
    elif ptype == "BYTE_ARRAY" and lengths is not None and len(lengths):
        offs = np.zeros(len(lengths) + 1, dtype=np.int64)
        np.cumsum(lengths, out=offs[1:])
        k = min(16, int(lengths.max()))
        if k == 0:  # every value is the empty string: exact degenerate bounds
            chunk.stat_min_bin = b""
            chunk.stat_max_bin = b""
            return
        from . import _native

        lib = _native.get_kernel()
        if lib is not None:
            # C scan with the numpy path's exact tie rules (min keeps the
            # first tied row, max the last, shortest tied min prefix)
            import ctypes

            pl = np.ascontiguousarray(payload[: int(offs[-1])])
            ln = np.ascontiguousarray(lengths, dtype=np.int64)
            out3 = np.empty(3, dtype=np.int64)
            lib.p4s_ba_stats(
                ctypes.c_void_p(pl.ctypes.data), ctypes.c_void_p(ln.ctypes.data),
                len(ln), k, ctypes.c_void_p(out3.ctypes.data),
            )
            lo_i, hi_i, min_len = int(out3[0]), int(out3[1]), int(out3[2])
            chunk.stat_min_bin = pl[offs[lo_i] : offs[lo_i] + min_len].tobytes()
            hi_prefix = bytearray(
                pl[offs[hi_i] : offs[hi_i] + min(k, int(lengths[hi_i]))]
            )
            for j in range(len(hi_prefix) - 1, -1, -1):
                if hi_prefix[j] != 0xFF:
                    hi_prefix[j] += 1
                    chunk.stat_max_bin = bytes(hi_prefix[: j + 1])
                    break
            return
        # width padded to a multiple of 8 so rows view as big-endian uint64
        # words: comparing those words IS byte-lexicographic comparison of
        # the zero-padded prefixes (the extra zero columns never affect
        # order), so the stable lexsort runs over 1-2 uint64 keys instead
        # of 16 byte columns -- same order, same tie rows, 8x fewer key
        # passes
        kpad = ((k + 7) // 8) * 8
        mat = np.zeros((len(lengths), kpad), dtype=np.uint8)
        take = np.minimum(lengths, k)
        tot = int(take.sum())
        if tot:
            rows = np.repeat(np.arange(len(lengths), dtype=np.int64), take)
            rel = np.arange(tot, dtype=np.int64) - np.repeat(np.cumsum(take) - take, take)
            mat[rows, rel] = payload[np.repeat(offs[:-1], take) + rel]
        words = mat.view(np.uint64).reshape(len(lengths), kpad // 8).byteswap()
        order = np.lexsort(tuple(words[:, j] for j in reversed(range(kpad // 8))))
        lo_i = int(order[0])
        hi_i = int(order[-1])
        mat = mat[:, :k]
        # lower bound: a prefix of some value is <= that value <= the rest.
        # Zero padding can TIE a longer value containing NUL bytes with a
        # shorter one (b'a\x00' vs b'a'); take the shortest tied length so
        # the stored prefix is <= every tied value too.
        ties = (mat == mat[lo_i]).all(axis=1)
        min_len = int(np.minimum(lengths[ties], k).min())
        chunk.stat_min_bin = mat[lo_i, :min_len].tobytes()
        # upper bound: ALWAYS truncate-and-increment (strictly greater than
        # every value sharing the prefix -- covers embedded-NUL ties and
        # >16-byte values alike); an all-0xFF prefix can't increment -> no
        # upper stat, never prune on that side
        hi_prefix = bytearray(mat[hi_i, : min(k, int(lengths[hi_i]))])
        for j in range(len(hi_prefix) - 1, -1, -1):
            if hi_prefix[j] != 0xFF:
                hi_prefix[j] += 1
                chunk.stat_max_bin = bytes(hi_prefix[: j + 1])
                break


def _plain_size(ptype: str, n: int, lengths=None, type_length: int = 0) -> int:
    if ptype == "BYTE_ARRAY":
        return int(lengths.sum()) + 4 * n
    if ptype == "BOOLEAN":
        return (n + 7) // 8
    if ptype == "FIXED_LEN_BYTE_ARRAY":
        return type_length * n
    return _FIXED_DTYPES[ptype].itemsize * n


def _leaf_components(nn_arr: pa.Array, ptype: str):
    """Null-free leaf array -> (values, lengths, payload, per-value bytes,
    type_length) in the flat form the codec kernels consume."""
    lengths = payload = values = None
    type_length = 0
    if ptype == "BYTE_ARRAY":
        lengths, payload = ba_components(nn_arr)
        nn_row_bytes = lengths + 4
    elif ptype == "FIXED_LEN_BYTE_ARRAY":
        type_length = nn_arr.type.byte_width
        buf = nn_arr.buffers()[1]
        values = np.frombuffer(buf, dtype=np.uint8, count=len(nn_arr) * type_length,
                               offset=nn_arr.offset * type_length).reshape(-1, type_length)
        nn_row_bytes = np.full(len(nn_arr), type_length, dtype=np.int64)
    elif ptype == "BOOLEAN":
        values = nn_arr.to_numpy(zero_copy_only=False).astype(bool)
        nn_row_bytes = np.full(len(values), 1, dtype=np.int64)
    else:
        values = np.ascontiguousarray(nn_arr.to_numpy(zero_copy_only=False), dtype=_FIXED_DTYPES[ptype])
        nn_row_bytes = np.full(len(values), _FIXED_DTYPES[ptype].itemsize, dtype=np.int64)
    return values, lengths, payload, nn_row_bytes, type_length


def encode_chunk(
    arr: pa.Array,
    *,
    policy: str = "auto",
    page_target_bytes: int = 1 << 20,
    compression: str = "uncompressed",
    nullable: bool | None = None,
    elem_nullable: bool | None = None,
    _def_levels: np.ndarray | None = None,
    _max_def: int | None = None,
    fsst_cache: dict | None = None,
    fsst_cache_key: str | None = None,
) -> EncodedChunk:
    """Encode one column chunk into pages.

    policy: 'auto' (codec auto-selection, never worse than 'reference'),
            'reference' (the reference's static policy: RLE_DICTIONARY with
            16 KiB fallback for all types except INT32/INT64 -> PLAIN is the
            baseline; see BASELINE.md), 'plain', or an explicit codec name.

    List columns (one nesting level) are routed to the Dremel level path
    (_encode_list_chunk); flat columns keep max_def <= 1, max_rep = 0.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type):
        inner_t = arr.type.value_type
        if pa.types.is_list(inner_t) or pa.types.is_large_list(inner_t):
            return _encode_list2_chunk(
                arr,
                policy=policy,
                page_target_bytes=page_target_bytes,
                compression=compression,
                nullable=nullable,
            )
        return _encode_list_chunk(
            arr,
            policy=policy,
            page_target_bytes=page_target_bytes,
            compression=compression,
            nullable=nullable,
            elem_nullable=elem_nullable,
        )
    ptype, logical = pa_ptype(arr)
    if logical == "timestamp_us":
        arr = arr.cast(pa.int64())
    elif logical == "date":
        arr = arr.cast(pa.int32())
    elif logical.startswith("decimal("):
        arr = _decimal_to_physical(arr, ptype)
    n = len(arr)
    if _def_levels is not None:
        # struct-field mode: caller supplies the merged Dremel def stream
        # (e.g. {0: struct NULL, 1: field NULL, 2: value}); values exist
        # only at def == max_def (column_chunk_writer.hh:75-89)
        max_def = int(_max_def)
        def_arr = np.ascontiguousarray(_def_levels, dtype=np.uint64)
        valid = def_arr == max_def
        num_nulls = int(n - valid.sum())
        nullable = True
        nn_arr = arr.filter(pa.array(valid)) if num_nulls else arr
    else:
        num_nulls = arr.null_count
        if nullable is None:
            nullable = num_nulls > 0
        max_def = 1 if nullable else 0
        valid = (
            np.ones(n, dtype=bool)
            if num_nulls == 0
            else np.asarray(arr.is_valid())
        )
        def_arr = valid.astype(np.uint64)
        nn_arr = arr.drop_null() if num_nulls else arr

    # non-null values in flat form
    values, lengths, payload, nn_row_bytes, type_length = _leaf_components(nn_arr, ptype)

    # map to row domain (nulls occupy a row with 0 value bytes)
    row_bytes = np.zeros(n, dtype=np.int64)
    row_bytes[valid] = nn_row_bytes
    page_ends = _page_boundaries(row_bytes, page_target_bytes)
    nn_before = np.cumsum(valid, dtype=np.int64)  # non-null count up to row (inclusive)
    nn_page_ends = nn_before[page_ends - 1] if n else np.array([0], dtype=np.int64)

    input_bytes = _plain_size(ptype, int(valid.sum()), lengths, type_length)
    chunk = EncodedChunk(
        ptype=ptype,
        logical=logical,
        nullable=nullable,
        num_rows=n,
        num_nulls=num_nulls,
        cardinality=0,
        encodings=[],
        compression=compression,
        type_length=type_length,
        input_bytes=input_bytes,
        max_def=max_def,
        max_rep=0,
    )
    chunk.sha256 = chunk_sha256(ptype, valid, values, lengths, payload)
    _chunk_stats(chunk, ptype, values, lengths, payload)
    _chunk_bloom(chunk, ptype, values, lengths, payload)

    plan = _plan_codecs(
        policy, ptype, n, valid, values, lengths, payload, page_ends, nn_page_ends,
        compression=compression, fsst_cache=fsst_cache, fsst_cache_key=fsst_cache_key,
    )
    # plan: (per_page_encodings, dict_page_bytes|None, dict_codes|None,
    #        dict_cardinality, per-page cardinality-at-flush)
    per_page_enc, dict_page_bytes, codes, cardinality, card_by_page, cached_bodies = plan
    chunk.cardinality = cardinality

    if dict_page_bytes is not None:
        comp = _compress(dict_page_bytes, compression)
        chunk.pages.append(
            Page("dict", "PLAIN", cardinality, cardinality, len(dict_page_bytes), len(comp), comp)
        )

    nn_start = 0
    row_start = 0
    len_start = 0
    chunk_fsst_table = None
    for pi, row_end in enumerate(page_ends.tolist()):
        if n == 0:
            break
        enc = per_page_enc[pi]
        nn_end = int(nn_page_ends[pi])
        if cached_bodies is not None:
            body = cached_bodies[pi]
        elif enc == "RLE_DICTIONARY":
            # index bit width = bit_width(cardinality at this page's flush)
            # (dict_encoder::index_bit_width, encoding.cc:769-771)
            body = dictionary.encode_dict_indices(codes[nn_start:nn_end], int(card_by_page[pi]))
        elif ptype == "BYTE_ARRAY":
            pl = lengths[nn_start:nn_end]
            seg = payload[len_start : len_start + int(pl.sum())]
            if enc == "FSST" and chunk_fsst_table is None:
                chunk_fsst_table = _train_chunk_table(payload)
            body = _encode_values(enc, ptype, None, pl, seg, chunk_fsst_table)
        else:
            body = _encode_values(enc, ptype, values[nn_start:nn_end])
        head = encode_levels_v1(def_arr[row_start:row_end], max_def)
        page_raw = head + body
        comp = _compress(page_raw, compression)
        chunk.pages.append(
            Page("data", enc, row_end - row_start, nn_end - nn_start, len(page_raw), len(comp), comp)
        )
        if ptype == "BYTE_ARRAY":
            len_start += int(lengths[nn_start:nn_end].sum())
        nn_start = nn_end
        row_start = row_end

    chunk.encodings = sorted({p.encoding for p in chunk.pages if p.kind == "data"})
    chunk.encoded_bytes = sum(p.uncompressed_size for p in chunk.pages)
    chunk.compressed_bytes = sum(p.compressed_size for p in chunk.pages)
    return chunk


def chunk_sha256(ptype, valid, values, lengths, payload) -> str:
    h = hashlib.sha256()
    h.update(np.packbits(valid, bitorder="little").tobytes())
    _sha_update_values(h, ptype, values, lengths, payload)
    return h.hexdigest()


# ---------------------------------------------------------------------------
# list columns: Dremel rep/def levels over one repetition level
#
# Semantics match the reference's level computation (REPEATED => ++def,++rep;
# OPTIONAL => ++def -- reader_schema.cc:79-93, file_writer.hh:50-81) and its
# record assembly contract (record_reader.hh:469-505): for the standard
# 3-level LIST with an optional outer field,
#   def 0            = list is NULL
#   def d_empty      = list present but empty          (d_empty = outer opt)
#   def max_def - 1  = element slot, element NULL      (iff elem optional)
#   def max_def      = element value present
#   rep 0 starts a new row; rep 1 continues the current list.



def _check_field_name(name: str) -> None:
    """Leaf paths are dot-joined and '#list'/'#key'/'#value' are reserved
    markers: a struct field name containing either would silently
    restructure or misroute on decode (review findings: 'a.b' became
    struct a{b}; 'x#list' hit the list-reassembly branch via endswith) —
    fail fast instead."""
    if "." in name or "#" in name:
        raise ValueError(
            f"struct field name {name!r} collides with the dot-joined leaf "
            "path scheme ('.' and '#' are reserved); rename the field "
            "before encoding"
        )


def _list_level_geometry(nullable: bool, elem_nullable: bool) -> tuple[int, int]:
    """(max_def, d_empty) for a single-level list."""
    d_empty = 1 if nullable else 0
    return d_empty + 1 + (1 if elem_nullable else 0), d_empty


def _encode_list_chunk(
    arr: pa.Array,
    *,
    policy: str,
    page_target_bytes: int,
    compression: str,
    nullable: bool | None,
    elem_nullable: bool | None = None,
) -> EncodedChunk:
    """Single-repetition list<primitive> chunk with the STANDARD parquet
    3-level geometry (file_writer.hh:50-81 level rule) -- the container
    interop codec path.  Deeper/mixed nesting goes through the recursive
    walker (encode_dremel_column)."""
    ptype, logical = pa_ptype(arr)
    n = len(arr)
    num_nulls = arr.null_count
    if nullable is None:
        nullable = num_nulls > 0
    leaf = arr.flatten()  # elements of non-null lists, row order
    elem_logical = logical[5:-1]
    if elem_logical == "timestamp_us":
        leaf = leaf.cast(pa.int64())
    elif elem_logical == "date":
        leaf = leaf.cast(pa.int32())
    elif elem_logical.startswith("decimal("):
        leaf = _decimal_to_physical(leaf, ptype)
    if elem_nullable is None:
        elem_nullable = leaf.null_count > 0
    max_def, d_empty = _list_level_geometry(nullable, elem_nullable)
    max_rep = 1

    row_valid = np.ones(n, dtype=bool) if num_nulls == 0 else np.asarray(arr.is_valid())
    lvl = pa.compute.list_value_length(arr)
    lengths_per_row = np.asarray(lvl.fill_null(0) if num_nulls else lvl).astype(np.int64)
    elem_valid = (
        np.ones(len(leaf), dtype=bool) if leaf.null_count == 0 else np.asarray(leaf.is_valid())
    )
    nn_leaf = leaf.drop_null() if leaf.null_count else leaf
    values, lengths, payload, nn_val_bytes, type_length = _leaf_components(nn_leaf, ptype)

    # ---- level streams (one entry per element; null/empty rows get one)
    counts = np.maximum(lengths_per_row, 1)
    n_levels = int(counts.sum())
    level_starts = np.zeros(n, dtype=np.int64)
    level_starts[1:] = np.cumsum(counts)[:-1]
    rep = np.ones(n_levels, dtype=np.uint64)
    rep[level_starts] = 0
    def_ = np.zeros(n_levels, dtype=np.uint64)
    has = lengths_per_row > 0
    if has.any():
        g = lengths_per_row[has]
        dst = np.repeat(level_starts[has], g) + (
            np.arange(int(g.sum()), dtype=np.int64) - np.repeat(np.cumsum(g) - g, g)
        )
        elem_def = np.where(elem_valid, max_def, max_def - 1)
        def_[dst] = elem_def.astype(np.uint64)
    empty_rows = ~has
    if empty_rows.any():
        def_[level_starts[empty_rows]] = np.where(
            row_valid[empty_rows], d_empty, 0
        ).astype(np.uint64)

    # ---- paginate in ROW space by estimated bytes (elements + level entry)
    row_bytes = np.zeros(n, dtype=np.int64)
    if has.any():
        # per-row sum of element byte sizes: sizes of VALID elements only
        elem_sizes = np.zeros(len(leaf), dtype=np.int64)
        elem_sizes[elem_valid] = nn_val_bytes
        cs = np.zeros(len(leaf) + 1, dtype=np.int64)
        np.cumsum(elem_sizes, out=cs[1:])
        leaf_starts = np.zeros(n, dtype=np.int64)
        leaf_starts[1:] = np.cumsum(lengths_per_row)[:-1]
        row_bytes = cs[leaf_starts + lengths_per_row] - cs[leaf_starts]
    row_bytes = row_bytes + counts  # ~1B/level entry
    page_ends = _page_boundaries(row_bytes, page_target_bytes)
    n_pages = len(page_ends) if n else 0

    # per-page end positions in level space and encoded-value space
    level_ends = np.cumsum(counts)[page_ends - 1] if n else np.array([0], dtype=np.int64)
    enc_mask = def_ == max_def  # entries carrying an encoded value
    enc_before = np.cumsum(enc_mask, dtype=np.int64)
    nn_page_ends = enc_before[level_ends - 1] if n else np.array([0], dtype=np.int64)

    input_bytes = _plain_size(ptype, int(elem_valid.sum()), lengths, type_length)
    chunk = EncodedChunk(
        ptype=ptype,
        logical=logical,
        nullable=nullable,
        num_rows=n,
        num_nulls=num_nulls,
        cardinality=0,
        encodings=[],
        compression=compression,
        type_length=type_length,
        input_bytes=input_bytes,
        max_def=max_def,
        max_rep=max_rep,
        elem_nullable=elem_nullable,
    )
    chunk.sha256 = list_chunk_sha256(ptype, row_valid, lengths_per_row, elem_valid, values, lengths, payload)
    _chunk_stats(chunk, ptype, values, lengths, payload)  # leaf-element stats

    plan = _plan_codecs(policy, ptype, n, None, values, lengths, payload, page_ends, nn_page_ends, compression=compression)
    per_page_enc, dict_page_bytes, codes, cardinality, card_by_page, cached_bodies = plan
    chunk.cardinality = cardinality
    if dict_page_bytes is not None:
        comp = _compress(dict_page_bytes, compression)
        chunk.pages.append(
            Page("dict", "PLAIN", cardinality, cardinality, len(dict_page_bytes), len(comp), comp)
        )

    nn_start = 0
    lvl_start = 0
    len_start = 0
    chunk_fsst_table = None
    for pi in range(n_pages):
        lvl_end = int(level_ends[pi])
        nn_end = int(nn_page_ends[pi])
        enc = per_page_enc[pi]
        if cached_bodies is not None:
            body = cached_bodies[pi]
        elif enc == "RLE_DICTIONARY":
            body = dictionary.encode_dict_indices(codes[nn_start:nn_end], int(card_by_page[pi]))
        elif ptype == "BYTE_ARRAY":
            pl = lengths[nn_start:nn_end]
            seg = payload[len_start : len_start + int(pl.sum())]
            if enc == "FSST" and chunk_fsst_table is None:
                chunk_fsst_table = _train_chunk_table(payload)
            body = _encode_values(enc, ptype, None, pl, seg, chunk_fsst_table)
        else:
            body = _encode_values(enc, ptype, values[nn_start:nn_end])
        # V1 page: [u32+rep][u32+def][values] (column_chunk_writer.hh:98-139)
        head = encode_levels_v1(rep[lvl_start:lvl_end], max_rep) + encode_levels_v1(
            def_[lvl_start:lvl_end], max_def
        )
        page_raw = head + body
        comp = _compress(page_raw, compression)
        chunk.pages.append(
            Page("data", enc, lvl_end - lvl_start, nn_end - nn_start, len(page_raw), len(comp), comp)
        )
        if ptype == "BYTE_ARRAY":
            len_start += int(lengths[nn_start:nn_end].sum())
        nn_start = nn_end
        lvl_start = lvl_end

    chunk.encodings = sorted({p.encoding for p in chunk.pages if p.kind == "data"})
    chunk.encoded_bytes = sum(p.uncompressed_size for p in chunk.pages)
    chunk.compressed_bytes = sum(p.compressed_size for p in chunk.pages)
    return chunk


def list_chunk_sha256(ptype, row_valid, lengths_per_row, elem_valid, values, lengths, payload) -> str:
    h = hashlib.sha256()
    h.update(np.packbits(row_valid, bitorder="little").tobytes())
    h.update(np.ascontiguousarray(lengths_per_row, dtype=np.int64).tobytes())
    h.update(np.packbits(elem_valid, bitorder="little").tobytes())
    _sha_update_values(h, ptype, values, lengths, payload)
    return h.hexdigest()


def list2_chunk_sha256(
    ptype, row_valid, outer_len, inner_valid, inner_len, elem_valid, values, lengths, payload
) -> str:
    """Content sha for a list<list<T>> chunk: every structural stream
    (validity + lengths at both repetition levels) AND the element values —
    so value-byte corruption is detectable, same guarantee as
    list_chunk_sha256 / chunk_sha256 give flat and single-list chunks."""
    h = hashlib.sha256()
    h.update(np.packbits(row_valid, bitorder="little").tobytes())
    h.update(np.ascontiguousarray(outer_len, dtype=np.int64).tobytes())
    h.update(np.packbits(inner_valid, bitorder="little").tobytes())
    h.update(np.ascontiguousarray(inner_len, dtype=np.int64).tobytes())
    h.update(np.packbits(elem_valid, bitorder="little").tobytes())
    _sha_update_values(h, ptype, values, lengths, payload)
    return h.hexdigest()


def _sha_update_values(h, ptype, values, lengths, payload) -> None:
    if ptype == "BYTE_ARRAY":
        h.update(np.ascontiguousarray(lengths, dtype=np.int64).tobytes())
        h.update(np.ascontiguousarray(payload).tobytes())
    elif ptype == "BOOLEAN":
        h.update(np.packbits(values, bitorder="little").tobytes())
    else:
        h.update(np.ascontiguousarray(values).tobytes())


# ---------------------------------------------------------------------------
# codec planning


def _dict_plan(ptype, values, lengths, payload, page_ends, nn_page_ends, *, fallback: bool):
    """Build dictionary state and (optionally) the 16 KiB fallback split.

    Returns (per_page_encodings, dict_page_bytes, codes, cardinality,
    total_size_estimate_exact).
    """
    if ptype == "BYTE_ARRAY":
        offsets = np.zeros(len(lengths) + 1, dtype=np.int64)
        np.cumsum(lengths, out=offsets[1:])
        nn_arr = pa.Array.from_buffers(
            pa.large_binary(),
            len(lengths),
            [
                None,
                pa.py_buffer(offsets.tobytes()),
                pa.py_buffer(np.ascontiguousarray(payload).tobytes()),
            ],
        )
    elif ptype == "BOOLEAN":
        nn_arr = pa.array(values, type=pa.bool_())
    elif ptype == "FIXED_LEN_BYTE_ARRAY":
        k = values.shape[1] if values.ndim == 2 else 1
        nn_arr = pa.Array.from_buffers(
            pa.binary(k), len(values), [None, pa.py_buffer(values.tobytes())]
        )
    else:
        nn_arr = pa.array(values)
    codes, dict_arr = dictionary.build_dict(nn_arr)
    card = len(dict_arr)
    n_pages = len(page_ends)
    if card == 0:
        return ["PLAIN"] * n_pages, None, codes, 0, np.zeros(n_pages, dtype=np.int64)

    # per-entry plain size and first-occurrence position
    if ptype == "BYTE_ARRAY":
        d_lengths, _ = ba_components(dict_arr)
        entry_sizes = d_lengths + 4
    elif ptype == "BOOLEAN":
        entry_sizes = np.full(card, 1, dtype=np.int64)
    elif ptype == "FIXED_LEN_BYTE_ARRAY":
        entry_sizes = np.full(card, values.shape[1], dtype=np.int64)
    else:
        entry_sizes = np.full(card, _FIXED_DTYPES[ptype].itemsize, dtype=np.int64)

    # first-occurrence position of each entry; entries sorted by code ARE
    # sorted by first_pos (insertion order), so searchsorted gives the number
    # of entries seen by each page flush.
    first_pos = np.full(card, len(codes), dtype=np.int64)
    np.minimum.at(first_pos, codes, np.arange(len(codes), dtype=np.int64))
    entries_by_page = np.searchsorted(first_pos, nn_page_ends, side="left")

    if not fallback:
        dict_bytes = _encode_dict_page(ptype, dict_arr)
        return ["RLE_DICTIONARY"] * n_pages, dict_bytes, codes, card, entries_by_page

    cum_entry_sizes = np.cumsum(entry_sizes, dtype=np.int64)
    # dict size after each page flush = bytes of entries first seen by then
    dict_size_at_page = np.where(entries_by_page > 0, cum_entry_sizes[entries_by_page - 1], 0)
    over = np.flatnonzero(dict_size_at_page > DICT_FALLBACK_THRESHOLD)
    if len(over) == 0:
        dict_bytes = _encode_dict_page(ptype, dict_arr)
        return ["RLE_DICTIONARY"] * n_pages, dict_bytes, codes, card, entries_by_page
    fb = int(over[0])  # page at whose flush the overflow is detected
    per_page = ["RLE_DICTIONARY" if i <= fb else "PLAIN" for i in range(n_pages)]
    kept_entries = int(entries_by_page[fb])
    dict_bytes = _encode_dict_page(ptype, dict_arr.slice(0, kept_entries))
    return per_page, dict_bytes, codes, kept_entries, entries_by_page


def _encode_dict_page(ptype: str, dict_arr: pa.Array) -> bytes:
    if ptype == "BYTE_ARRAY":
        d_lengths, d_payload = ba_components(dict_arr)
        return plain.plain_encode_byte_array(d_lengths, d_payload.tobytes())
    if ptype == "FIXED_LEN_BYTE_ARRAY":
        return bytes(dict_arr.buffers()[1])[: len(dict_arr) * dict_arr.type.byte_width]
    if ptype == "BOOLEAN":
        return plain.plain_encode_bool(dict_arr.to_numpy(zero_copy_only=False).astype(bool))
    vals = np.ascontiguousarray(dict_arr.to_numpy(zero_copy_only=False), dtype=_FIXED_DTYPES[ptype])
    return plain.plain_encode_fixed(vals)


def _plan_codecs(policy, ptype, n, valid, values, lengths, payload, page_ends, nn_page_ends, compression="uncompressed", fsst_cache=None, fsst_cache_key=None):
    """Resolve the policy into per-page encodings (+ dict state)."""
    n_pages = len(page_ends) if n else 0
    no_dict = (None, None, 0, np.zeros(n_pages, dtype=np.int64), None)

    if policy == "plain":
        return (["PLAIN"] * n_pages, *no_dict)

    if policy in ("PLAIN", "DELTA_BINARY_PACKED", "DELTA_LENGTH_BYTE_ARRAY", "DELTA_BYTE_ARRAY", "FSST", "RLE", "BYTE_STREAM_SPLIT"):
        return ([policy] * n_pages, *no_dict)

    if policy in ("dict", "RLE_DICTIONARY"):
        return (*_dict_plan(ptype, values, lengths, payload, page_ends, nn_page_ends, fallback=False), None)

    if policy == "reference":
        # static schema policy: RLE_DICTIONARY with fallback for strings &
        # low-card columns; DELTA_BINARY_PACKED for ints; PLAIN baseline.
        if ptype in ("INT32", "INT64"):
            return (["DELTA_BINARY_PACKED"] * n_pages, *no_dict)
        return (*_dict_plan(ptype, values, lengths, payload, page_ends, nn_page_ends, fallback=True), None)

    if policy not in ("auto", "auto_fast"):
        raise ValueError(f"unknown policy {policy}")

    return _auto_plan(
        ptype, n, values, lengths, payload, page_ends, nn_page_ends,
        allow_fsst=policy == "auto", compression=compression,
        fsst_cache=fsst_cache, fsst_cache_key=fsst_cache_key,
    )


def _ragged_take(lengths: np.ndarray, payload: np.ndarray, idx: np.ndarray) -> pa.Array:
    """Gather entries ``idx`` of a ragged (lengths, payload) column into a
    large_binary arrow array (vectorized, no per-row Python)."""
    offsets = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    s_lens = lengths[idx]
    s_starts = offsets[:-1][idx]
    total = int(s_lens.sum())
    base = np.repeat(s_starts, s_lens)
    off = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(s_lens) - s_lens, s_lens)
    s_payload = payload[base + off] if total else np.zeros(0, dtype=np.uint8)
    s_offsets = np.zeros(len(idx) + 1, dtype=np.int64)
    np.cumsum(s_lens, out=s_offsets[1:])
    return pa.Array.from_buffers(
        pa.large_binary(),
        len(idx),
        [None, pa.py_buffer(s_offsets.tobytes()), pa.py_buffer(s_payload.tobytes())],
    )


def _candidate_bodies(enc, ptype, values, lengths, payload, page_ends_nn, fsst_table=None) -> list[bytes]:
    """Actually encode a whole-chunk single-codec candidate; returns the
    per-page value bodies (level bytes are identical across candidates, so
    sizes compare on bodies alone).  The winner's bodies are reused by
    encode_chunk -- candidates are never encoded twice."""
    bodies = []
    start = 0
    off = 0
    for end in page_ends_nn:
        end = int(end)
        if ptype == "BYTE_ARRAY":
            pl = lengths[start:end]
            seg = payload[off : off + int(pl.sum())]
            bodies.append(_encode_values(enc, ptype, None, pl, seg, fsst_table))
            off += int(pl.sum())
        else:
            bodies.append(_encode_values(enc, ptype, values[start:end]))
        start = end
    return bodies


def _auto_plan(ptype, n, values, lengths, payload, page_ends, nn_page_ends, allow_fsst=True, compression="uncompressed", fsst_cache=None, fsst_cache_key=None):
    """Pick the cheapest codec per chunk from actual/estimated sizes.

    The reference static policy is always a candidate, so the auto-selected
    total never exceeds it (BASELINE.md compression target).
    ``allow_fsst=False`` is the 'auto_fast' profile: dict/DLBA/DBP/plain only
    (~10-20x higher encode throughput, weaker ratio on natural text).
    """
    n_pages = len(page_ends) if n else 0
    no_dict = (None, None, 0, np.zeros(n_pages, dtype=np.int64), None)
    if n_pages == 0:
        return ([], *no_dict)

    nn = int(nn_page_ends[-1])
    candidates: dict[str, int] = {}
    plans: dict[str, tuple] = {}

    type_length = (
        int(values.shape[1]) if ptype == "FIXED_LEN_BYTE_ARRAY" and values is not None and values.ndim == 2 else 0
    )
    plain_size = _plain_size(ptype, nn, lengths, type_length)
    candidates["PLAIN"] = plain_size
    plans["PLAIN"] = (["PLAIN"] * n_pages, *no_dict[:-1], None)

    # dictionary candidate (with fallback = reference policy for this column).
    # Sampled uniformly across the chunk (not the prefix) so a unique head
    # followed by a repetitive tail still admits the dict candidate.
    sample_card_ratio = 1.0
    if nn:
        if ptype == "BYTE_ARRAY":
            k = min(nn, 512)
            idx = np.linspace(0, nn - 1, num=k, dtype=np.int64)
            sample_arr = _ragged_take(lengths, payload, idx)
            sample_card_ratio = len(sample_arr.unique()) / max(k, 1)
        elif ptype == "FIXED_LEN_BYTE_ARRAY":
            k = min(nn, 2048)
            idx = np.linspace(0, nn - 1, num=k, dtype=np.int64)
            sample_card_ratio = len(np.unique(values[idx], axis=0)) / k
        else:
            k = min(nn, 4096)
            idx = np.linspace(0, nn - 1, num=k, dtype=np.int64)
            sample_card_ratio = len(np.unique(values[idx])) / k
    # BOOLEAN never takes the dict candidate: RLE-bool matches it within
    # bytes (2-entry dictionary, 1-bit indices) and major standard readers
    # don't implement dictionary-encoded booleans (pyarrow raises), which
    # would poison container export for ~zero ratio gain
    if nn and sample_card_ratio < 0.98 and ptype != "BOOLEAN":
        per_page, dict_bytes, codes, card, card_by_page = _dict_plan(
            ptype, values, lengths, payload, page_ends, nn_page_ends, fallback=True
        )
        size = len(dict_bytes) if dict_bytes else 0
        bodies = []
        start = 0
        off = 0
        for pi, end in enumerate(nn_page_ends.tolist()):
            end = int(end)
            if per_page[pi] == "RLE_DICTIONARY":
                body = dictionary.encode_dict_indices(codes[start:end], int(card_by_page[pi]))
            elif ptype == "BYTE_ARRAY":
                pl = lengths[start:end]
                seg = payload[off : off + int(pl.sum())]
                body = _encode_values(per_page[pi], ptype, None, pl, seg)
            else:
                body = _encode_values(per_page[pi], ptype, values[start:end])
            size += len(body)
            bodies.append(body)
            if ptype == "BYTE_ARRAY":
                off += int(lengths[start:end].sum())
            start = end
        candidates["DICT"] = size
        plans["DICT"] = (per_page, dict_bytes, codes, card, card_by_page, bodies)

    if ptype in ("INT32", "INT64"):
        bodies = _candidate_bodies("DELTA_BINARY_PACKED", ptype, values, lengths, payload, nn_page_ends)
        candidates["DELTA_BINARY_PACKED"] = sum(map(len, bodies))
        plans["DELTA_BINARY_PACKED"] = (["DELTA_BINARY_PACKED"] * n_pages, *no_dict[:-1], bodies)

    if ptype == "BOOLEAN":
        bodies = _candidate_bodies("RLE", ptype, values, lengths, payload, nn_page_ends)
        candidates["RLE"] = sum(map(len, bodies))
        plans["RLE"] = (["RLE"] * n_pages, *no_dict[:-1], bodies)

    if ptype == "BYTE_ARRAY" and nn:
        # DLBA size is exact without encoding: DBP(lengths) + payload
        size = 0
        start = 0
        for end in nn_page_ends.tolist():
            end = int(end)
            size += len(delta.dbp_encode(lengths[start:end].astype(np.int32), 4)) + int(
                lengths[start:end].sum()
            )
            start = end
        candidates["DELTA_LENGTH_BYTE_ARRAY"] = size
        plans["DELTA_LENGTH_BYTE_ARRAY"] = (["DELTA_LENGTH_BYTE_ARRAY"] * n_pages, *no_dict[:-1], None)
        # DELTA_BYTE_ARRAY (front coding): wins on sorted/shared-prefix data
        # (paths, URLs, sorted keys).  Gate on a cheap consecutive-pair
        # prefix sample so random text skips the extra encode pass.
        if allow_fsst and nn >= 8:
            k = min(nn - 1, 256)
            idx = np.linspace(0, nn - 2, num=k, dtype=np.int64)
            offs = np.zeros(nn + 1, dtype=np.int64)
            np.cumsum(lengths, out=offs[1:])
            cmp_len = np.minimum(np.minimum(lengths[idx], lengths[idx + 1]), 64)
            tot = int(cmp_len.sum())
            if tot:
                rel = np.arange(tot, dtype=np.int64) - np.repeat(np.cumsum(cmp_len) - cmp_len, cmp_len)
                a = payload[np.repeat(offs[:-1][idx], cmp_len) + rel]
                b = payload[np.repeat(offs[:-1][idx + 1], cmp_len) + rel]
                eq = a == b
                # mean leading-equality run per sampled pair, vectorized:
                # the run ends at the segment's first mismatch, located
                # with one searchsorted over the flat mismatch positions
                # (the former per-segment np.split + cumprod was ~0.5 s
                # per 256 MB of fixed overhead at bench chunk counts)
                seg_starts = np.zeros(k, dtype=np.int64)
                seg_starts[1:] = np.cumsum(cmp_len)[:-1]
                seg_ends = seg_starts + cmp_len
                falses = np.flatnonzero(~eq)
                first_false = falses[
                    np.searchsorted(falses, seg_starts).clip(0, max(len(falses) - 1, 0))
                ] if len(falses) else np.full(k, tot, dtype=np.int64)
                # a segment with no mismatch runs to its end
                run_end = np.where(
                    (len(falses) > 0) & (first_false >= seg_starts) & (first_false < seg_ends),
                    first_false,
                    seg_ends,
                )
                mean_prefix = float(np.mean(run_end - seg_starts))
                mean_len = float(np.mean(lengths[idx])) or 1.0
                # front coding must promise real savings: long values with a
                # short shared header (e.g. source text) skip the extra pass
                if mean_prefix >= 4.0 and mean_prefix >= 0.25 * mean_len:
                    bodies = _candidate_bodies(
                        "DELTA_BYTE_ARRAY", ptype, values, lengths, payload, nn_page_ends
                    )
                    candidates["DELTA_BYTE_ARRAY"] = sum(map(len, bodies))
                    plans["DELTA_BYTE_ARRAY"] = (
                        ["DELTA_BYTE_ARRAY"] * n_pages, *no_dict[:-1], bodies
                    )
        # FSST: estimate from a sample; the full encode pass runs only when
        # the estimate beats the best cheap candidate.  The demanded margin
        # depends on which kernel is loaded: under the numpy fallback FSST
        # encode is ~15x slower than dict/DLBA, so the estimate must win by
        # >10% ("sample gain per CPU second"); with the C kernel
        # (codecs/_native.py, ~12x faster) the pass costs about as much as
        # the cheap codecs and any estimated win takes it.
        sample = payload[: 1 << 15]
        if allow_fsst and len(sample) >= 1024:
            from . import _native

            margin = 1.0 if _native.get_kernel() is not None else 0.9
            # per-task symbol-table cache (encode_job wires one dict per
            # partition, keyed by (column, part_key)): training is a fixed
            # ~9 ms per chunk, which dominated auto encode on
            # many-small-chunk layouts (the bench corpus has ~2,200
            # content chunks of ~1 MB).  The part_key in the cache key
            # scopes every reuse to one key's vocabulary, so caching is
            # safe at any sample size; the selection estimate below still
            # runs against THIS chunk's sample, so a poorly-matching
            # cached table simply loses the candidate race.
            table = fsst_cache.get(fsst_cache_key) if fsst_cache else None
            if table is None:
                table = fsst.train_symbol_table(sample)
                if fsst_cache is not None:
                    if len(fsst_cache) >= 4096:  # bound per-task memory
                        fsst_cache.clear()
                    fsst_cache[fsst_cache_key] = table
            est_ratio = len(fsst.fsst_encode(sample, table)) / len(sample)
            payload_len = int(lengths.sum())
            # FSST body = DBP(lengths) + symbol table + token payload; the
            # DBP part equals DLBA's non-payload bytes (computed exactly
            # above), tables are ~300 B per page
            est_fsst = (
                candidates["DELTA_LENGTH_BYTE_ARRAY"]
                - payload_len
                + 300 * n_pages
                + est_ratio * payload_len
            )
            run_fsst = est_fsst < margin * min(candidates.values())
            if run_fsst and compression == "gzip":
                # the pages gzip AFTER encoding, and deflate recovers much
                # of what FSST would have squeezed (both are entropy
                # reductions of the same redundancy; measured on bench
                # content the post-gzip FSST gain is ~8% vs ~55% without
                # gzip): demand >=10% POST-GZIP gain over the raw byte
                # stream before paying the ~15x-slower full encode pass.
                # The probe uses a 128 KiB slice — a 32 KiB one understates
                # the converged gain (deflate's window covers the whole
                # sample there; 2.4% vs the true 8.3% on bench content).
                # Margin as above: >=10% post-gzip gain under the numpy
                # fallback, any gain with the C kernel.
                gz_sample = payload[: 1 << 17]
                enc_blob = fsst.fsst_encode(gz_sample, table)
                run_fsst = len(zlib.compress(bytes(enc_blob), 6)) < margin * len(
                    zlib.compress(gz_sample.tobytes(), 6)
                )
            if run_fsst:
                bodies = _candidate_bodies(
                    "FSST", ptype, values, lengths, payload, nn_page_ends, fsst_table=table
                )
                candidates["FSST"] = sum(map(len, bodies))
                plans["FSST"] = (["FSST"] * n_pages, *no_dict[:-1], bodies)

    best = min(candidates, key=lambda k: candidates[k])
    return plans[best]


# ---------------------------------------------------------------------------
# decode


def _load_dict_page(raw, ptype: str, type_length: int, num_values: int):
    """Decode a PLAIN dictionary page into flat entry form."""
    if ptype == "BYTE_ARRAY":
        lengths, payload = plain.plain_decode_byte_array(raw, num_values)
        return (lengths.astype(np.int64), np.frombuffer(payload, dtype=np.uint8))
    if ptype == "BOOLEAN":
        return plain.plain_decode_bool(raw, num_values)
    if ptype == "FIXED_LEN_BYTE_ARRAY":
        flat = plain.plain_decode_flba(raw, type_length, num_values)
        return np.frombuffer(flat, dtype=np.uint8).reshape(num_values, type_length)
    return plain.plain_decode_fixed(raw, _FIXED_DTYPES[ptype], num_values)


def _gather_dict_values(ptype: str, dict_entries, codes, len_parts, payload_parts, fixed_parts):
    """Append dictionary lookups for one page into the value accumulators."""
    if ptype == "BYTE_ARRAY":
        d_lengths, d_payload = dict_entries
        d_offsets = np.zeros(len(d_lengths) + 1, dtype=np.int64)
        np.cumsum(d_lengths, out=d_offsets[1:])
        lens = d_lengths[codes]
        total = int(lens.sum())
        idx = np.repeat(d_offsets[codes], lens) + (
            np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(lens) - lens, lens)
        )
        len_parts.append(lens)
        payload_parts.append(d_payload[idx])
    else:
        fixed_parts.append(np.asarray(dict_entries)[codes])


def decode_chunk(
    chunk: EncodedChunk,
) -> pa.Array:
    """Decode pages back into a (nullable) arrow array.

    Mirrors column_chunk_reader::read_batch (column_chunk_reader.hh:101-157):
    a DICTIONARY page loads the dictionary, DATA pages decode def levels then
    values; values exist only where def == max_def.  List chunks
    (max_rep > 0) go through Dremel record reassembly (_decode_list_chunk).
    """
    if chunk.max_rep == 2:
        return _decode_list2_chunk(chunk)
    if chunk.max_rep > 0:
        return _decode_list_chunk(chunk)
    ptype = chunk.ptype
    max_def = chunk.max_def if chunk.max_def >= 0 else (1 if chunk.nullable else 0)
    dict_entries = None  # decoded dictionary in flat form
    dict_size = 0

    masks: list[np.ndarray] = []
    fixed_parts: list[np.ndarray] = []
    len_parts: list[np.ndarray] = []
    payload_parts: list[np.ndarray] = []

    for page in chunk.pages:
        raw = _decompress(page.data, chunk.compression)
        if page.kind == "dict":
            dict_entries = _load_dict_page(raw, ptype, chunk.type_length, page.num_values)
            dict_size = page.num_values
            continue
        levels, consumed = decode_levels_v1(raw, max_def, page.num_values)
        mask = levels == max_def if max_def else np.ones(page.num_values, dtype=bool)
        nn = int(mask.sum())
        body = memoryview(raw)[consumed:]
        if page.encoding == "RLE_DICTIONARY":
            codes = _decode_values("RLE_DICTIONARY", ptype, bytes(body), nn, dict_size)
            _gather_dict_values(ptype, dict_entries, codes, len_parts, payload_parts, fixed_parts)
        else:
            out = _decode_values(
                page.encoding, ptype, bytes(body), nn, type_length=chunk.type_length
            )
            if ptype == "BYTE_ARRAY":
                lens, pl = out
                len_parts.append(lens)
                payload_parts.append(pl)
            else:
                fixed_parts.append(out)
        masks.append(mask)

    valid = np.concatenate(masks) if masks else np.zeros(0, dtype=bool)
    n = len(valid)
    if n != chunk.num_rows:
        raise ValueError(f"decoded row count mismatch: {n} != {chunk.num_rows}")

    if ptype == "BYTE_ARRAY":
        lens = np.concatenate(len_parts) if len_parts else np.zeros(0, dtype=np.int64)
        payload = np.concatenate(payload_parts) if payload_parts else np.zeros(0, dtype=np.uint8)
        full_lens = np.zeros(n, dtype=np.int64)
        full_lens[valid] = lens
        if chunk.logical.startswith("decimal("):
            p, s = _parse_decimal(chunk.logical)
            return _varbin_to_decimal(full_lens, payload, valid, bool(chunk.num_nulls), p, s)
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(full_lens, out=offsets[1:])
        validity = pa.py_buffer(np.packbits(valid, bitorder="little").tobytes()) if chunk.num_nulls else None
        arr = pa.Array.from_buffers(
            pa.large_binary(),
            n,
            [validity, pa.py_buffer(offsets.tobytes()), pa.py_buffer(payload.tobytes())],
        )
        if chunk.logical == "string":
            return arr.cast(pa.large_string()).cast(pa.string())
        return arr.cast(pa.binary())
    if ptype == "BOOLEAN":
        vals = np.concatenate([np.asarray(p, dtype=bool) for p in fixed_parts]) if fixed_parts else np.zeros(0, dtype=bool)
        full = np.zeros(n, dtype=bool)
        full[valid] = vals
        return pa.array(full, type=pa.bool_(), mask=~valid if chunk.num_nulls else None)
    if ptype == "FIXED_LEN_BYTE_ARRAY":
        k = chunk.type_length
        vals = (
            np.concatenate(fixed_parts).reshape(-1, k)
            if fixed_parts
            else np.zeros((0, k), dtype=np.uint8)
        )
        full = np.zeros((n, k), dtype=np.uint8)
        full[valid] = vals
        if chunk.logical.startswith("decimal("):
            p, s = _parse_decimal(chunk.logical)
            return _flba_to_decimal(full, valid, bool(chunk.num_nulls), p, s)
        validity = (
            pa.py_buffer(np.packbits(valid, bitorder="little").tobytes())
            if chunk.num_nulls
            else None
        )
        return pa.Array.from_buffers(pa.binary(k), n, [validity, pa.py_buffer(full.tobytes())])
    vals = np.concatenate(fixed_parts) if fixed_parts else np.zeros(0, dtype=_FIXED_DTYPES[ptype])
    full = np.zeros(n, dtype=_FIXED_DTYPES[ptype])
    full[valid] = vals
    if chunk.logical.startswith("decimal("):
        p, s = _parse_decimal(chunk.logical)
        return _int_to_decimal(full, valid, bool(chunk.num_nulls), p, s)
    out = pa.array(full, mask=~valid if chunk.num_nulls else None)
    if chunk.logical == "timestamp_us":
        return out.cast(pa.timestamp("us"))
    if chunk.logical == "date":
        return out.cast(pa.date32())
    return out


_ELEM_PA_TYPES = {
    "int32": pa.int32(),
    "int64": pa.int64(),
    "float": pa.float32(),
    "double": pa.float64(),
    "bool": pa.bool_(),
    "string": pa.string(),
    "binary": pa.binary(),
    "timestamp_us": pa.timestamp("us"),
    "date": pa.date32(),
}


def _elem_pa_type(elem_logical: str, type_length: int) -> pa.DataType:
    if elem_logical.startswith("decimal("):
        p, s = _parse_decimal(elem_logical)
        return pa.decimal128(p, s)
    if elem_logical == "flba":
        return pa.binary(type_length)
    return _ELEM_PA_TYPES[elem_logical]


def _build_leaf_array(
    ptype: str,
    elem_logical: str,
    type_length: int,
    elem_nullable: bool,
    elem_valid: np.ndarray,
    n_elems: int,
    len_parts: list,
    payload_parts: list,
    fixed_parts: list,
) -> pa.Array:
    """Scatter decoded non-null values into element slots and build the
    typed leaf arrow array (shared by the 1- and 2-rep-level decoders)."""
    elem_validity = (
        pa.py_buffer(np.packbits(elem_valid, bitorder="little").tobytes())
        if elem_nullable
        else None
    )
    if ptype == "BYTE_ARRAY":
        lens = np.concatenate(len_parts) if len_parts else np.zeros(0, dtype=np.int64)
        payload = np.concatenate(payload_parts) if payload_parts else np.zeros(0, dtype=np.uint8)
        full_lens = np.zeros(n_elems, dtype=np.int64)
        full_lens[elem_valid] = lens
        if elem_logical.startswith("decimal("):
            p, s = _parse_decimal(elem_logical)
            leaf = _varbin_to_decimal(full_lens, payload, elem_valid, elem_nullable, p, s)
        else:
            offsets = np.zeros(n_elems + 1, dtype=np.int64)
            np.cumsum(full_lens, out=offsets[1:])
            leaf = pa.Array.from_buffers(
                pa.large_binary(),
                n_elems,
                [elem_validity, pa.py_buffer(offsets.tobytes()), pa.py_buffer(payload.tobytes())],
            )
            leaf = leaf.cast(pa.large_string()).cast(pa.string()) if elem_logical == "string" else leaf.cast(pa.binary())
    elif ptype == "FIXED_LEN_BYTE_ARRAY":
        k = type_length
        vals = (
            np.concatenate(fixed_parts).reshape(-1, k)
            if fixed_parts
            else np.zeros((0, k), dtype=np.uint8)
        )
        full = np.zeros((n_elems, k), dtype=np.uint8)
        full[elem_valid] = vals
        if elem_logical.startswith("decimal("):
            p, s = _parse_decimal(elem_logical)
            leaf = _flba_to_decimal(full, elem_valid, elem_nullable, p, s)
        else:
            leaf = pa.Array.from_buffers(
                pa.binary(k), n_elems, [elem_validity, pa.py_buffer(full.tobytes())]
            )
    elif ptype == "BOOLEAN":
        vals = (
            np.concatenate([np.asarray(p, dtype=bool) for p in fixed_parts])
            if fixed_parts
            else np.zeros(0, dtype=bool)
        )
        full = np.zeros(n_elems, dtype=bool)
        full[elem_valid] = vals
        leaf = pa.array(full, type=pa.bool_(), mask=~elem_valid if elem_nullable else None)
    else:
        vals = np.concatenate(fixed_parts) if fixed_parts else np.zeros(0, dtype=_FIXED_DTYPES[ptype])
        full = np.zeros(n_elems, dtype=_FIXED_DTYPES[ptype])
        full[elem_valid] = vals
        if elem_logical.startswith("decimal("):
            p, s = _parse_decimal(elem_logical)
            leaf = _int_to_decimal(full, elem_valid, elem_nullable, p, s)
        else:
            leaf = pa.array(full, mask=~elem_valid if elem_nullable else None)
    target = _elem_pa_type(elem_logical, type_length)
    if leaf.type != target:
        leaf = leaf.cast(target)
    return leaf


def _decode_list_chunk(
    chunk: EncodedChunk,
) -> pa.Array:
    """Dremel record reassembly for one list column chunk (standard
    single-repetition geometry -- the container interop path; the engine's
    nested columns reassemble via dremel.assemble instead).

    Mirrors record_reader list logic (record_reader.hh:272-297, 469-505):
    rep == 0 starts a row; def tells NULL list / empty list / NULL element /
    value.  Values decode through the same codec dispatch as flat chunks.
    """
    ptype = chunk.ptype
    max_def = chunk.max_def
    max_rep = chunk.max_rep
    _, d_empty = _list_level_geometry(chunk.nullable, chunk.elem_nullable)
    dict_entries = None
    dict_size = 0

    rep_parts: list[np.ndarray] = []
    def_parts: list[np.ndarray] = []
    fixed_parts: list[np.ndarray] = []
    len_parts: list[np.ndarray] = []
    payload_parts: list[np.ndarray] = []

    for page in chunk.pages:
        raw = _decompress(page.data, chunk.compression)
        if page.kind == "dict":
            dict_entries = _load_dict_page(raw, ptype, chunk.type_length, page.num_values)
            dict_size = page.num_values
            continue
        rep, c1 = decode_levels_v1(raw, max_rep, page.num_values)
        def_, c2 = decode_levels_v1(memoryview(raw)[c1:], max_def, page.num_values)
        body = memoryview(raw)[c1 + c2 :]
        nn = int((def_ == max_def).sum())
        # num_non_null == -1: unknown (pages from a standard parquet file,
        # whose DataPageHeader carries only the level count)
        if page.num_non_null >= 0 and nn != page.num_non_null:
            raise ValueError(
                f"list page value count mismatch: {nn} != {page.num_non_null}"
            )
        if page.encoding == "RLE_DICTIONARY":
            codes = _decode_values("RLE_DICTIONARY", ptype, bytes(body), nn, dict_size)
            _gather_dict_values(ptype, dict_entries, codes, len_parts, payload_parts, fixed_parts)
        else:
            out = _decode_values(page.encoding, ptype, bytes(body), nn, type_length=chunk.type_length)
            if ptype == "BYTE_ARRAY":
                lens, pl = out
                len_parts.append(lens)
                payload_parts.append(pl)
            else:
                fixed_parts.append(out)
        rep_parts.append(rep)
        def_parts.append(def_)

    rep_all = np.concatenate(rep_parts) if rep_parts else np.zeros(0, dtype=np.int32)
    def_all = np.concatenate(def_parts) if def_parts else np.zeros(0, dtype=np.int32)
    row_start = rep_all == 0
    n_rows = int(row_start.sum())
    if n_rows != chunk.num_rows:
        raise ValueError(f"decoded row count mismatch: {n_rows} != {chunk.num_rows}")

    is_elem = def_all > d_empty
    row_ids = np.cumsum(row_start) - 1
    row_lengths = np.bincount(row_ids[is_elem], minlength=n_rows).astype(np.int64)
    if chunk.nullable:
        # the list is PRESENT (possibly empty) where the row's def reaches
        # d_empty; below it some outer level (or the list itself) is null
        row_valid = def_all[row_start] >= d_empty if d_empty else def_all[row_start] > 0
    else:
        row_valid = np.ones(n_rows, dtype=bool)
    elem_valid = def_all[is_elem] == max_def
    n_elems = int(is_elem.sum())

    elem_logical = chunk.logical[5:-1] if chunk.logical.startswith("list<") else chunk.logical
    leaf = _build_leaf_array(
        ptype, elem_logical, chunk.type_length, chunk.elem_nullable, elem_valid, n_elems,
        len_parts, payload_parts, fixed_parts,
    )

    list_offsets = np.zeros(n_rows + 1, dtype=np.int32)
    np.cumsum(row_lengths, out=list_offsets[1:])
    mask = None
    if chunk.num_nulls:
        mask = pa.array(~row_valid)
    return pa.ListArray.from_arrays(pa.array(list_offsets, type=pa.int32()), leaf, mask=mask)


# ---------------------------------------------------------------------------
# struct columns (struct-of-primitives): one leaf chunk per field with the
# merged Dremel def stream (struct optional +1, field optional +1 --
# file_writer.hh:50-81; assembly record_reader.hh:234-247): def 0 = struct
# NULL, def 1 = struct present / field NULL, def 2 = value.  Reuses the flat
# chunk machinery via encode_chunk(_def_levels=...).






# ---------------------------------------------------------------------------
# map columns: the standard 3-level MAP group (writer_schema.cc map path;
# assembly record_reader.hh:311-336).  A map<k,v> column is stored as TWO
# list chunks sharing the map's offsets: keys (elements REQUIRED, so
# max_def = outer_opt + 1) and values (elements OPTIONAL, max_def =
# outer_opt + 2) -- exactly the level geometry parquet gives MAP leaves.
# STRUCT values decompose further into per-field leaves ('value.<field>')
# through the struct-list machinery, one def level per struct level.




def chunk_content_sha(arr: pa.Array) -> str:
    """Canonical content sha256 of an arrow array -- byte-identical to the
    sha256 encode_chunk records in lineage for the same values.  Used by the
    lineage audit (decode -> recompute -> compare) to detect bit rot or
    page corruption without the source table."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if (pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type)) and (
        pa.types.is_list(arr.type.value_type) or pa.types.is_large_list(arr.type.value_type)
    ):
        # list<list<T>>: flatten TWICE, mirroring _encode_list2_chunk's
        # stream decomposition exactly (same logical casts on the leaf)
        ptype, logical = pa_ptype(arr)
        n = len(arr)
        row_valid = np.ones(n, dtype=bool) if arr.null_count == 0 else np.asarray(arr.is_valid())
        olen = pa.compute.list_value_length(arr)
        outer_len = np.asarray(olen.fill_null(0) if arr.null_count else olen).astype(np.int64)
        inner = arr.flatten()
        inner_valid = (
            np.ones(len(inner), dtype=bool) if inner.null_count == 0 else np.asarray(inner.is_valid())
        )
        ilen = pa.compute.list_value_length(inner)
        inner_len = np.asarray(ilen.fill_null(0) if inner.null_count else ilen).astype(np.int64)
        leaf = inner.flatten()
        elem_logical2 = logical[10:-2]
        if elem_logical2 == "timestamp_us":
            leaf = leaf.cast(pa.int64())
        elif elem_logical2 == "date":
            leaf = leaf.cast(pa.int32())
        elif elem_logical2.startswith("decimal("):
            leaf = _decimal_to_physical(leaf, ptype)
        elem_valid = (
            np.ones(len(leaf), dtype=bool) if leaf.null_count == 0 else np.asarray(leaf.is_valid())
        )
        nn_leaf = leaf.drop_null() if leaf.null_count else leaf
        values, lengths, payload, _, _ = _leaf_components(nn_leaf, ptype)
        return list2_chunk_sha256(
            ptype, row_valid, outer_len, inner_valid, inner_len, elem_valid, values, lengths, payload
        )
    if pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type):
        ptype, _ = pa_ptype(arr)
        n = len(arr)
        row_valid = np.ones(n, dtype=bool) if arr.null_count == 0 else np.asarray(arr.is_valid())
        lvl = pa.compute.list_value_length(arr)
        lengths_per_row = np.asarray(lvl.fill_null(0) if arr.null_count else lvl).astype(np.int64)
        leaf = arr.flatten()
        elem_valid = (
            np.ones(len(leaf), dtype=bool) if leaf.null_count == 0 else np.asarray(leaf.is_valid())
        )
        nn_leaf = leaf.drop_null() if leaf.null_count else leaf
        values, lengths, payload, _, _ = _leaf_components(nn_leaf, ptype)
        return list_chunk_sha256(ptype, row_valid, lengths_per_row, elem_valid, values, lengths, payload)
    ptype, logical = pa_ptype(arr)
    if logical == "timestamp_us":
        arr = arr.cast(pa.int64())
    elif logical == "date":
        arr = arr.cast(pa.int32())
    elif logical.startswith("decimal("):
        arr = _decimal_to_physical(arr, ptype)
    n = len(arr)
    valid = np.ones(n, dtype=bool) if arr.null_count == 0 else np.asarray(arr.is_valid())
    nn_arr = arr.drop_null() if arr.null_count else arr
    values, lengths, payload, _, _ = _leaf_components(nn_arr, ptype)
    return chunk_sha256(ptype, valid, values, lengths, payload)






# ---------------------------------------------------------------------------
# list<list<T>> columns: TWO repetition levels (max_rep = 2), the deepest
# shape in the reference's record assembly tests.  Level semantics
# (reader_schema.cc:79-93 applied twice):
#   def 0 outer null | 1 outer empty | 2 inner null | 3 inner empty |
#   def max-1 element null (iff elem optional) | max element value
#   rep 0 new row | 1 new inner list | 2 next element
# Geometry: max_def = outer_opt + 1 + inner_opt + 1 + elem_opt; the middle
# flags derive from max_def so no extra chunk metadata is needed.


def _list2_geometry(nullable: bool, inner_nullable: bool, elem_nullable: bool):
    d_outer_empty = 1 if nullable else 0
    d_inner_null = d_outer_empty + 1  # valid only if inner_nullable
    d_inner_empty = d_outer_empty + 1 + (1 if inner_nullable else 0)
    max_def = d_inner_empty + 1 + (1 if elem_nullable else 0)
    return max_def, d_outer_empty, d_inner_null, d_inner_empty


def _encode_list2_chunk(
    arr: pa.Array,
    *,
    policy: str,
    page_target_bytes: int,
    compression: str,
    nullable: bool | None,
) -> EncodedChunk:
    ptype, logical = pa_ptype(arr)  # logical = "list<list<elem>>"
    n = len(arr)
    if nullable is None:
        nullable = arr.null_count > 0
    inner = arr.flatten()  # inner lists of non-null outer rows
    inner_nullable = inner.null_count > 0
    leaf = inner.flatten()  # elements of non-null inner lists
    elem_logical2 = logical[10:-2]
    if elem_logical2 == "timestamp_us":
        leaf = leaf.cast(pa.int64())
    elif elem_logical2 == "date":
        leaf = leaf.cast(pa.int32())
    elif elem_logical2.startswith("decimal("):
        leaf = _decimal_to_physical(leaf, ptype)
    elem_nullable = leaf.null_count > 0
    max_def, d_oe, d_in, d_ie = _list2_geometry(nullable, inner_nullable, elem_nullable)

    row_valid = np.ones(n, dtype=bool) if arr.null_count == 0 else np.asarray(arr.is_valid())
    olen = pa.compute.list_value_length(arr)
    outer_len = np.asarray(olen.fill_null(0) if arr.null_count else olen).astype(np.int64)
    inner_valid = (
        np.ones(len(inner), dtype=bool) if inner.null_count == 0 else np.asarray(inner.is_valid())
    )
    ilen = pa.compute.list_value_length(inner)
    inner_len = np.asarray(ilen.fill_null(0) if inner.null_count else ilen).astype(np.int64)
    elem_valid = (
        np.ones(len(leaf), dtype=bool) if leaf.null_count == 0 else np.asarray(leaf.is_valid())
    )
    nn_leaf = leaf.drop_null() if leaf.null_count else leaf
    values, lengths, payload, nn_val_bytes, type_length = _leaf_components(nn_leaf, ptype)

    # ---- level streams: per inner slot, entries = max(len, 1); per row,
    # entries = sum(slot entries) or 1 when the row has no slots
    slot_entries = np.maximum(inner_len, 1)
    m = len(inner)
    # per-row entry counts via reduceat over slot ranges
    row_slot_start = np.zeros(n, dtype=np.int64)
    row_slot_start[1:] = np.cumsum(outer_len)[:-1]
    row_entries = np.ones(n, dtype=np.int64)
    has_slots = outer_len > 0
    if m and has_slots.any():
        cs = np.zeros(m + 1, dtype=np.int64)
        np.cumsum(slot_entries, out=cs[1:])
        row_entries[has_slots] = (
            cs[row_slot_start[has_slots] + outer_len[has_slots]] - cs[row_slot_start[has_slots]]
        )
    n_levels = int(row_entries.sum())
    def_ = np.zeros(n_levels, dtype=np.uint64)
    rep = np.full(n_levels, 2, dtype=np.uint64)
    row_starts = np.zeros(n, dtype=np.int64)
    row_starts[1:] = np.cumsum(row_entries)[:-1]
    # slot starts: absolute level position of each inner slot's first entry
    if m:
        cs0 = np.zeros(m + 1, dtype=np.int64)
        np.cumsum(slot_entries, out=cs0[1:])
        row_of_slot = np.repeat(np.arange(n, dtype=np.int64), outer_len)
        slot_starts = row_starts[row_of_slot] + (cs0[:m] - cs0[row_slot_start[row_of_slot]])
        rep[slot_starts] = 1
    else:
        slot_starts = np.zeros(0, dtype=np.int64)
    rep[row_starts] = 0  # row start wins over slot start
    # def values
    empty_rows = ~has_slots
    if empty_rows.any():
        def_[row_starts[empty_rows]] = np.where(row_valid[empty_rows], d_oe, 0).astype(np.uint64)
    if m:
        has_elems = inner_len > 0
        # slots without elements: single entry, null or empty inner
        se = ~has_elems
        if se.any():
            def_[slot_starts[se]] = np.where(inner_valid[se], d_ie, d_in).astype(np.uint64)
        # element entries
        if has_elems.any():
            g = inner_len[has_elems]
            dst = np.repeat(slot_starts[has_elems], g) + (
                np.arange(int(g.sum()), dtype=np.int64) - np.repeat(np.cumsum(g) - g, g)
            )
            def_[dst] = np.where(elem_valid, max_def, max_def - 1).astype(np.uint64)

    # ---- paginate on rows by element bytes + level overhead
    elem_sizes = np.zeros(len(leaf), dtype=np.int64)
    elem_sizes[elem_valid] = nn_val_bytes
    cse = np.zeros(len(leaf) + 1, dtype=np.int64)
    np.cumsum(elem_sizes, out=cse[1:])
    row_elem_count = np.zeros(n, dtype=np.int64)
    if m:
        ce = np.zeros(m + 1, dtype=np.int64)
        np.cumsum(inner_len, out=ce[1:])
        row_elem_count[has_slots] = (
            ce[row_slot_start[has_slots] + outer_len[has_slots]] - ce[row_slot_start[has_slots]]
        )
    row_elem_start = np.zeros(n, dtype=np.int64)
    row_elem_start[1:] = np.cumsum(row_elem_count)[:-1]
    row_bytes = cse[row_elem_start + row_elem_count] - cse[row_elem_start]
    row_bytes = row_bytes + row_entries
    page_ends = _page_boundaries(row_bytes, page_target_bytes)
    n_pages = len(page_ends) if n else 0
    level_ends = np.cumsum(row_entries)[page_ends - 1] if n else np.array([0], dtype=np.int64)
    enc_mask = def_ == max_def
    enc_before = np.cumsum(enc_mask, dtype=np.int64)
    nn_page_ends = enc_before[level_ends - 1] if n else np.array([0], dtype=np.int64)

    chunk = EncodedChunk(
        ptype=ptype,
        logical=logical,
        nullable=nullable,
        num_rows=n,
        num_nulls=arr.null_count,
        cardinality=0,
        encodings=[],
        compression=compression,
        type_length=type_length,
        input_bytes=_plain_size(ptype, int(elem_valid.sum()), lengths, type_length),
        max_def=max_def,
        max_rep=2,
        elem_nullable=elem_nullable,
    )
    chunk.sha256 = list2_chunk_sha256(
        ptype, row_valid, outer_len, inner_valid, inner_len, elem_valid, values, lengths, payload
    )
    _chunk_stats(chunk, ptype, values, lengths, payload)

    plan = _plan_codecs(policy, ptype, n, None, values, lengths, payload, page_ends, nn_page_ends, compression=compression)
    per_page_enc, dict_page_bytes, codes, cardinality, card_by_page, cached_bodies = plan
    chunk.cardinality = cardinality
    if dict_page_bytes is not None:
        comp = _compress(dict_page_bytes, compression)
        chunk.pages.append(
            Page("dict", "PLAIN", cardinality, cardinality, len(dict_page_bytes), len(comp), comp)
        )
    nn_start = lvl_start = len_start = 0
    chunk_fsst_table = None
    for pi in range(n_pages):
        lvl_end = int(level_ends[pi])
        nn_end = int(nn_page_ends[pi])
        enc = per_page_enc[pi]
        if cached_bodies is not None:
            body = cached_bodies[pi]
        elif enc == "RLE_DICTIONARY":
            body = dictionary.encode_dict_indices(codes[nn_start:nn_end], int(card_by_page[pi]))
        elif ptype == "BYTE_ARRAY":
            pl = lengths[nn_start:nn_end]
            seg = payload[len_start : len_start + int(pl.sum())]
            if enc == "FSST" and chunk_fsst_table is None:
                chunk_fsst_table = _train_chunk_table(payload)
            body = _encode_values(enc, ptype, None, pl, seg, chunk_fsst_table)
        else:
            body = _encode_values(enc, ptype, values[nn_start:nn_end])
        head = encode_levels_v1(rep[lvl_start:lvl_end], 2) + encode_levels_v1(
            def_[lvl_start:lvl_end], max_def
        )
        page_raw = head + body
        comp = _compress(page_raw, compression)
        chunk.pages.append(
            Page("data", enc, lvl_end - lvl_start, nn_end - nn_start, len(page_raw), len(comp), comp)
        )
        if ptype == "BYTE_ARRAY":
            len_start += int(lengths[nn_start:nn_end].sum())
        nn_start = nn_end
        lvl_start = lvl_end
    chunk.encodings = sorted({p.encoding for p in chunk.pages if p.kind == "data"})
    chunk.encoded_bytes = sum(p.uncompressed_size for p in chunk.pages)
    chunk.compressed_bytes = sum(p.compressed_size for p in chunk.pages)
    return chunk


def _decode_list2_chunk(chunk: EncodedChunk) -> pa.Array:
    """Dremel reassembly for list<list<T>> (max_rep = 2)."""
    ptype = chunk.ptype
    max_def = chunk.max_def
    nullable = chunk.nullable
    elem_nullable = chunk.elem_nullable
    inner_nullable = (max_def - (1 if nullable else 0) - (1 if elem_nullable else 0) - 2) >= 1
    _, d_oe, d_in, d_ie = _list2_geometry(nullable, inner_nullable, elem_nullable)

    dict_entries = None
    dict_size = 0
    rep_parts, def_parts = [], []
    fixed_parts, len_parts, payload_parts = [], [], []
    for page in chunk.pages:
        raw = _decompress(page.data, chunk.compression)
        if page.kind == "dict":
            dict_entries = _load_dict_page(raw, ptype, chunk.type_length, page.num_values)
            dict_size = page.num_values
            continue
        rep, c1 = decode_levels_v1(raw, 2, page.num_values)
        def_, c2 = decode_levels_v1(memoryview(raw)[c1:], max_def, page.num_values)
        body = memoryview(raw)[c1 + c2 :]
        nn = int((def_ == max_def).sum())
        if page.num_non_null >= 0 and nn != page.num_non_null:
            raise ValueError("list2 page value count mismatch")
        if page.encoding == "RLE_DICTIONARY":
            codes = _decode_values("RLE_DICTIONARY", ptype, bytes(body), nn, dict_size)
            _gather_dict_values(ptype, dict_entries, codes, len_parts, payload_parts, fixed_parts)
        else:
            out = _decode_values(page.encoding, ptype, bytes(body), nn, type_length=chunk.type_length)
            if ptype == "BYTE_ARRAY":
                len_parts.append(out[0])
                payload_parts.append(out[1])
            else:
                fixed_parts.append(out)
        rep_parts.append(rep)
        def_parts.append(def_)

    rep_all = np.concatenate(rep_parts) if rep_parts else np.zeros(0, dtype=np.int32)
    def_all = np.concatenate(def_parts) if def_parts else np.zeros(0, dtype=np.int32)
    row_start = rep_all == 0
    n_rows = int(row_start.sum())
    if n_rows != chunk.num_rows:
        raise ValueError(f"decoded row count mismatch: {n_rows} != {chunk.num_rows}")
    row_ids = np.cumsum(row_start) - 1
    is_slot_begin = (rep_all <= 1) & (def_all >= d_oe + 1)
    slots_per_row = (
        np.bincount(row_ids[is_slot_begin], minlength=n_rows).astype(np.int64)
        if n_rows
        else np.zeros(0, dtype=np.int64)
    )
    m = int(is_slot_begin.sum())
    slot_ids = np.cumsum(is_slot_begin) - 1  # entry -> slot (valid where >= 0)
    is_elem = def_all >= d_ie + 1
    inner_len = np.bincount(slot_ids[is_elem], minlength=m).astype(np.int64) if m else np.zeros(0, np.int64)
    slot_begin_def = def_all[is_slot_begin]
    inner_valid = (slot_begin_def != d_in) if inner_nullable else np.ones(m, dtype=bool)
    row_valid = (def_all[row_start] > 0) if nullable else np.ones(n_rows, dtype=bool)
    elem_valid = def_all[is_elem] == max_def
    n_elems = int(is_elem.sum())

    elem_logical = chunk.logical[10:-2]  # strip 'list<list<' ... '>>'
    leaf = _build_leaf_array(
        ptype, elem_logical, chunk.type_length, elem_nullable, elem_valid, n_elems,
        len_parts, payload_parts, fixed_parts,
    )
    inner_offsets = np.zeros(m + 1, dtype=np.int32)
    np.cumsum(inner_len, out=inner_offsets[1:])
    inner_arr = pa.ListArray.from_arrays(
        pa.array(inner_offsets, type=pa.int32()),
        leaf,
        mask=pa.array(~inner_valid) if not inner_valid.all() else None,
    )
    outer_offsets = np.zeros(n_rows + 1, dtype=np.int32)
    np.cumsum(slots_per_row, out=outer_offsets[1:])
    return pa.ListArray.from_arrays(
        pa.array(outer_offsets, type=pa.int32()),
        inner_arr,
        mask=pa.array(~row_valid) if chunk.num_nulls else None,
    )


# ---------------------------------------------------------------------------
# generic nested columns: ONE recursive Dremel walker (codecs/dremel.py)
# subsumes the shape-enumerated struct/map/list<struct>/list<list>/list3
# paths (reference: the single recursive record_reader,
# record_reader.hh:469-505; level rule reader_schema.cc:79-93).  The engine
# names these leaf chunks '<col>#g<i>'; chunk.logical carries
# 'g:<node path>|<leaf logical>' so decode rebuilds the tree with no
# shape-specific naming conventions.  Every node is OPTIONAL in this
# geometry (type-determined, stable across chunks; constant def runs are
# ~free under RLE).


def dremel_leaf_sha(def_, rep, ptype, values, lengths, payload) -> str:
    """Canonical per-leaf content sha: level streams + non-null values."""
    h = hashlib.sha256()
    h.update(np.ascontiguousarray(def_, dtype="<u4").tobytes())
    h.update(np.ascontiguousarray(rep, dtype="<u4").tobytes())
    _sha_update_values(h, ptype, values, lengths, payload)
    return h.hexdigest()


def encode_dremel_column(
    arr: pa.Array,
    *,
    policy: str = "auto",
    page_target_bytes: int = 1 << 20,
    compression: str = "uncompressed",
) -> dict[str, "EncodedChunk"]:
    """Encode ANY nested arrow column -> {'#g<i>': leaf chunk}."""
    from .dremel import shred

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    out: dict[str, EncodedChunk] = {}
    for i, leaf in enumerate(shred(arr)):
        out[f"#g{i}"] = _encode_dremel_leaf(
            leaf, policy=policy, page_target_bytes=page_target_bytes,
            compression=compression,
        )
    return out


def _encode_dremel_leaf(leaf, *, policy, page_target_bytes, compression) -> "EncodedChunk":
    vals = leaf.values
    ptype, leaf_logical = pa_ptype_scalar(vals.type)
    if leaf_logical == "timestamp_us":
        vals = vals.cast(pa.int64())
    elif leaf_logical == "date":
        vals = vals.cast(pa.int32())
    elif leaf_logical.startswith("decimal("):
        vals = _decimal_to_physical(vals, ptype)
    values, lengths, payload, nn_val_bytes, type_length = _leaf_components(vals, ptype)
    def_ = np.ascontiguousarray(leaf.def_, dtype=np.uint64)
    rep = np.ascontiguousarray(leaf.rep, dtype=np.uint64)
    max_def, max_rep = leaf.max_def, leaf.max_rep
    n_entries = len(def_)
    enc_mask = def_ == max_def

    # record-aligned paging (pages start at rep == 0 -- a parquet invariant,
    # so these pages stay export-grade); sized by value bytes + ~1B/level
    rec_starts = np.flatnonzero(rep == 0)
    n_rows = len(rec_starts)
    entry_bytes = np.ones(n_entries, dtype=np.int64)
    entry_bytes[enc_mask] += nn_val_bytes
    cs = np.zeros(n_entries + 1, dtype=np.int64)
    np.cumsum(entry_bytes, out=cs[1:])
    rec_ends = np.append(rec_starts[1:], n_entries)
    rec_bytes = cs[rec_ends] - cs[rec_starts]
    page_ends = _page_boundaries(rec_bytes, page_target_bytes)
    n_pages = len(page_ends) if n_rows else 0
    level_ends = rec_ends[page_ends - 1] if n_rows else np.array([0], dtype=np.int64)
    enc_before = np.cumsum(enc_mask, dtype=np.int64)
    nn_page_ends = enc_before[level_ends - 1] if n_rows else np.array([0], dtype=np.int64)

    input_bytes = _plain_size(ptype, int(enc_mask.sum()), lengths, type_length)
    chunk = EncodedChunk(
        ptype=ptype,
        logical=f"g:{leaf.path}|{leaf_logical}",
        nullable=True,
        num_rows=n_rows,
        num_nulls=int(n_entries - enc_mask.sum()),
        cardinality=0,
        encodings=[],
        compression=compression,
        type_length=type_length,
        input_bytes=input_bytes,
        max_def=max_def,
        max_rep=max_rep,
        elem_nullable=True,
    )
    chunk.sha256 = dremel_leaf_sha(def_, rep, ptype, values, lengths, payload)
    _chunk_stats(chunk, ptype, values, lengths, payload)

    plan = _plan_codecs(policy, ptype, n_rows, None, values, lengths, payload, page_ends, nn_page_ends, compression=compression)
    per_page_enc, dict_page_bytes, codes, cardinality, card_by_page, cached_bodies = plan
    chunk.cardinality = cardinality
    if dict_page_bytes is not None:
        comp = _compress(dict_page_bytes, compression)
        chunk.pages.append(
            Page("dict", "PLAIN", cardinality, cardinality, len(dict_page_bytes), len(comp), comp)
        )

    nn_start = 0
    lvl_start = 0
    len_start = 0
    chunk_fsst_table = None
    for pi in range(n_pages):
        lvl_end = int(level_ends[pi])
        nn_end = int(nn_page_ends[pi])
        enc = per_page_enc[pi]
        if cached_bodies is not None:
            body = cached_bodies[pi]
        elif enc == "RLE_DICTIONARY":
            body = dictionary.encode_dict_indices(codes[nn_start:nn_end], int(card_by_page[pi]))
        elif ptype == "BYTE_ARRAY":
            pl = lengths[nn_start:nn_end]
            seg = payload[len_start : len_start + int(pl.sum())]
            if enc == "FSST" and chunk_fsst_table is None:
                chunk_fsst_table = _train_chunk_table(payload)
            body = _encode_values(enc, ptype, None, pl, seg, chunk_fsst_table)
        else:
            body = _encode_values(enc, ptype, values[nn_start:nn_end])
        # V1 page: [u32+rep (iff max_rep>0)][u32+def][values]
        head = b""
        if max_rep > 0:
            head = encode_levels_v1(rep[lvl_start:lvl_end], max_rep)
        head += encode_levels_v1(def_[lvl_start:lvl_end], max_def)
        page_raw = head + body
        comp = _compress(page_raw, compression)
        chunk.pages.append(
            Page("data", enc, lvl_end - lvl_start, nn_end - nn_start, len(page_raw), len(comp), comp)
        )
        if ptype == "BYTE_ARRAY":
            len_start += int(lengths[nn_start:nn_end].sum())
        nn_start = nn_end
        lvl_start = lvl_end

    chunk.encodings = sorted({p.encoding for p in chunk.pages if p.kind == "data"})
    chunk.encoded_bytes = sum(p.uncompressed_size for p in chunk.pages)
    chunk.compressed_bytes = sum(p.compressed_size for p in chunk.pages)
    return chunk


def _decode_dremel_leaf(chunk: "EncodedChunk", leaf_logical: str):
    """Leaf chunk pages -> (def levels, rep levels, non-null typed values)."""
    ptype = chunk.ptype
    max_def, max_rep = chunk.max_def, chunk.max_rep
    dict_entries = None
    dict_size = 0
    rep_parts: list[np.ndarray] = []
    def_parts: list[np.ndarray] = []
    fixed_parts: list[np.ndarray] = []
    len_parts: list[np.ndarray] = []
    payload_parts: list[np.ndarray] = []
    for page in chunk.pages:
        raw = _decompress(page.data, chunk.compression)
        if page.kind == "dict":
            dict_entries = _load_dict_page(raw, ptype, chunk.type_length, page.num_values)
            dict_size = page.num_values
            continue
        off = 0
        if max_rep > 0:
            rep, off = decode_levels_v1(raw, max_rep, page.num_values)
        else:
            rep = np.zeros(page.num_values, dtype=np.int64)
        def_, c2 = decode_levels_v1(memoryview(raw)[off:], max_def, page.num_values)
        body = memoryview(raw)[off + c2 :]
        nn = int((def_ == max_def).sum())
        if page.num_non_null >= 0 and nn != page.num_non_null:
            raise ValueError(f"dremel page value count mismatch: {nn} != {page.num_non_null}")
        if page.encoding == "RLE_DICTIONARY":
            codes = _decode_values("RLE_DICTIONARY", ptype, bytes(body), nn, dict_size)
            _gather_dict_values(ptype, dict_entries, codes, len_parts, payload_parts, fixed_parts)
        else:
            out = _decode_values(page.encoding, ptype, bytes(body), nn, type_length=chunk.type_length)
            if ptype == "BYTE_ARRAY":
                lens, pl = out
                len_parts.append(lens)
                payload_parts.append(pl)
            else:
                fixed_parts.append(out)
        rep_parts.append(np.asarray(rep))
        def_parts.append(np.asarray(def_))
    def_all = np.concatenate(def_parts) if def_parts else np.zeros(0, dtype=np.int64)
    rep_all = np.concatenate(rep_parts) if rep_parts else np.zeros(0, dtype=np.int64)
    nn_total = int((def_all == max_def).sum())
    vals = _build_leaf_array(
        ptype, leaf_logical, chunk.type_length, False,
        np.ones(nn_total, dtype=bool), nn_total,
        len_parts, payload_parts, fixed_parts,
    )
    return def_all.astype(np.uint32), rep_all.astype(np.uint32), vals


def decode_dremel_column(chunks: dict[str, "EncodedChunk"]) -> pa.Array:
    """{leaf name ending '#g<i>': chunk} -> reassembled arrow column."""
    from .dremel import Leaf, assemble

    leaves: dict[str, Leaf] = {}
    n_rows = 0
    for name in sorted(chunks, key=lambda s: int(s.rsplit("#g", 1)[1])):
        c = chunks[name]
        if not c.logical.startswith("g:"):
            raise ValueError(f"not a dremel leaf chunk: {name} ({c.logical})")
        path, leaf_logical = c.logical[2:].rsplit("|", 1)
        def_, rep, vals = _decode_dremel_leaf(c, leaf_logical)
        leaves[path] = Leaf(path, vals, def_, rep, c.max_def, c.max_rep)
        n_rows = c.num_rows
    return assemble(leaves, n_rows)


def dremel_recompute_sha(chunk: "EncodedChunk") -> str:
    """Decode a dremel leaf chunk and recompute its content sha (lineage
    audit: detects page corruption without the source table)."""
    leaf_logical = chunk.logical[2:].rsplit("|", 1)[1]
    def_, rep, vals = _decode_dremel_leaf(chunk, leaf_logical)
    if leaf_logical == "timestamp_us":
        vals = vals.cast(pa.int64())
    elif leaf_logical == "date":
        vals = vals.cast(pa.int32())
    elif leaf_logical.startswith("decimal("):
        vals = _decimal_to_physical(vals, chunk.ptype)
    values, lengths, payload, _, _ = _leaf_components(vals, chunk.ptype)
    return dremel_leaf_sha(def_, rep, chunk.ptype, values, lengths, payload)
