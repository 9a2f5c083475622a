"""Pure-Python Snappy raw-block codec (no external binding in this env).

The reference links real snappy (src/compression.cc:29-158); this module
implements the public Snappy format spec (format_description.txt) so the
engine can exchange SNAPPY-compressed parquet pages with other tools:

- ``snappy_decompress``: full decoder -- literals plus all three copy tag
  forms, including overlapping copies (RLE-style back-references).  The
  per-TAG Python loop is interop-path only; hot-path page compression
  stays UNCOMPRESSED/GZIP.
- ``snappy_compress``: emits a valid stream using literal tags only (any
  snappy reader accepts it).  No matching pass: entropy removal is the
  codec layer's job (dict/FSST/DBP) -- this is a compatibility container,
  not a compressor.
"""

from __future__ import annotations

__all__ = ["snappy_compress", "snappy_decompress"]


def _uvarint(out: bytearray, v: int) -> None:
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def snappy_compress(data: bytes) -> bytes:
    out = bytearray()
    _uvarint(out, len(data))
    pos = 0
    n = len(data)
    while pos < n:
        length = min(n - pos, 1 << 24)  # 3-byte literal length cap per chunk
        lm1 = length - 1
        if lm1 < 60:
            out.append(lm1 << 2)
        elif lm1 < (1 << 8):
            out.append(60 << 2)
            out.append(lm1)
        elif lm1 < (1 << 16):
            out.append(61 << 2)
            out += lm1.to_bytes(2, "little")
        else:
            out.append(62 << 2)
            out += lm1.to_bytes(3, "little")
        out += data[pos : pos + length]
        pos += length
    return bytes(out)


def snappy_decompress(buf) -> bytes:
    buf = bytes(buf)
    # preamble: uncompressed length as ULEB128
    n = 0
    shift = 0
    pos = 0
    while True:
        if pos >= len(buf):
            raise ValueError("snappy: truncated length preamble")
        b = buf[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    out = bytearray(n)
    opos = 0
    blen = len(buf)
    while pos < blen:
        tag = buf[pos]
        pos += 1
        t = tag & 3
        if t == 0:  # literal
            lm1 = tag >> 2
            if lm1 >= 60:
                nb = lm1 - 59
                if pos + nb > blen:
                    raise ValueError("snappy: truncated literal length")
                lm1 = int.from_bytes(buf[pos : pos + nb], "little")
                pos += nb
            length = lm1 + 1
            if pos + length > blen or opos + length > n:
                raise ValueError("snappy: literal overruns input or output")
            out[opos : opos + length] = buf[pos : pos + length]
            pos += length
            opos += length
            continue
        nb = 1 if t == 1 else (2 if t == 2 else 4)
        if pos + nb > blen:  # consistent error on truncated copy tags
            raise ValueError("snappy: truncated copy offset")
        if t == 1:  # copy with 1-byte offset
            length = ((tag >> 2) & 0x7) + 4
            offset = ((tag >> 5) << 8) | buf[pos]
            pos += 1
        elif t == 2:  # copy with 2-byte offset
            length = (tag >> 2) + 1
            offset = int.from_bytes(buf[pos : pos + 2], "little")
            pos += 2
        else:  # copy with 4-byte offset
            length = (tag >> 2) + 1
            offset = int.from_bytes(buf[pos : pos + 4], "little")
            pos += 4
        if offset == 0 or offset > opos:
            raise ValueError("snappy: copy offset out of range")
        if opos + length > n:
            raise ValueError("snappy: copy overruns output")
        start = opos - offset
        if offset >= length:
            out[opos : opos + length] = out[start : start + length]
        else:
            # overlapping copy: the spec requires byte-at-a-time semantics
            # (this is how snappy expresses runs)
            for i in range(length):
                out[opos + i] = out[start + i]
        opos += length
    if opos != n:
        raise ValueError(f"snappy: decompressed {opos} bytes, header said {n}")
    return bytes(out)
