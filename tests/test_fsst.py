"""FSST symbol-table compression round-trips (implemented from the FSST
paper; not in the reference -- mandated by BASELINE.json north_star)."""

import numpy as np
import pytest

from parquet4seastar_spark.codecs.fsst import (
    SymbolTable,
    fsst_decode,
    fsst_encode,
    train_symbol_table,
)


def _roundtrip(data: bytes) -> bytes:
    table = train_symbol_table(data[: 1 << 16])
    return fsst_decode(fsst_encode(data, table))


def test_empty():
    assert _roundtrip(b"") == b""


def test_tiny():
    assert _roundtrip(b"a") == b"a"
    assert _roundtrip(b"\xff") == b"\xff"


def test_all_escape_bytes():
    # runs of 0xff stress the escape/literal parity parsing
    for n in range(1, 20):
        data = b"\xff" * n
        assert _roundtrip(data) == data


def test_mixed_escapes():
    data = b"a\xffb\xff\xffc\xff\xff\xffd"
    assert _roundtrip(data) == data


def test_text_roundtrip_and_gain():
    base = (
        b"def encode(self, values):\n    return self.table.lookup(values)\n"
        b"import numpy as np\nfrom typing import Optional\n"
    )
    data = base * 200
    table = train_symbol_table(data[: 1 << 16])
    enc = fsst_encode(data, table)
    assert fsst_decode(enc) == data
    # repetitive source text must compress well below 60%
    assert len(enc) < 0.6 * len(data)


def test_random_bytes_roundtrip():
    rng = np.random.default_rng(7)
    data = rng.integers(0, 256, 10_000, dtype=np.uint8).tobytes()
    assert _roundtrip(data) == data


def test_serialize_deserialize():
    table = train_symbol_table(b"hello world, hello there, hello hello" * 50)
    blob = table.serialize()
    table2, pos = SymbolTable.deserialize(blob)
    assert pos == len(blob)
    data = b"hello world and hello again"
    assert fsst_decode(fsst_encode(data, table2)) == data


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_structured_roundtrip(seed):
    rng = np.random.default_rng(seed)
    words = [b"the", b"quick", b"brown", b"fox", b"jumps", b"over", b"lazy", b"dog", b"\xff\xfe", b""]
    data = b" ".join(words[rng.integers(0, len(words))] for _ in range(2000))
    assert _roundtrip(data) == data


def test_native_numpy_parity_cross_segment():
    """The C kernel (codecs/_native.py) and the numpy path must produce
    BYTE-IDENTICAL encodings — same greedy rule, same 256 KiB segment
    boundary behavior — and decode each other's output.  Skips silently to
    a numpy-vs-numpy self-check when no compiler is available."""
    import os

    from parquet4seastar_spark.codecs import _native, fsst

    rng = np.random.default_rng(11)
    words = [b"request", b"response", b"the", b"href=", b"<div>", b"\x00\x01", b"error"]
    data = b" ".join(words[rng.integers(0, len(words))] for _ in range(90_000))
    assert len(data) > (1 << 18) + 1000  # crosses a segment boundary
    table = train_symbol_table(data[: 1 << 16])

    def with_numpy(f):
        os.environ["P4S_NO_NATIVE"] = "1"
        _native._tried, _native._lib = False, None
        try:
            return f()
        finally:
            del os.environ["P4S_NO_NATIVE"]
            _native._tried, _native._lib = False, None

    enc_native = fsst_encode(data, table)
    enc_numpy = with_numpy(lambda: fsst_encode(data, table))
    assert enc_native == enc_numpy
    assert fsst_decode(enc_native) == data
    assert with_numpy(lambda: fsst_decode(enc_native)) == data
    tok_n = fsst._tokenize(np.frombuffer(data, dtype=np.uint8), table)
    tok_p = with_numpy(
        lambda: fsst._tokenize(np.frombuffer(data, dtype=np.uint8), table)
    )
    assert all((a == b).all() for a, b in zip(tok_n, tok_p))
