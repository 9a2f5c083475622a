"""Legacy (pre-LogicalTypes) list shapes in the container reader
(reader_schema.cc:120-144): old Hive/Impala writers emitted

  2-level: optional group xs (LIST) { repeated int32 element; }
  1-level: repeated int32 xs;           (top-level repeated leaf)

instead of the standard 3-level LIST group.  ParquetFileReader derives the
Dremel level geometry from the schema TREE (repetition codes), not from the
list/element naming convention, so both decode with the same machinery.
The files are hand-built with CompactWriter (no modern writer produces
them) and cross-validated against pyarrow's reader.
"""

import struct

import pyarrow as pa
import pyarrow.parquet as pq

from parquet4seastar_spark.codecs.pages import _encode_list_chunk
from parquet4seastar_spark.codecs.parquet_file import (
    ENCODINGS,
    MAGIC,
    PHYS_ID,
    CompactWriter,
    ParquetFileReader,
    _emit_element,
    _page_header,
)
from parquet4seastar_spark.codecs.thrift_compact import CT_BINARY, CT_I32, CT_STRUCT


def _legacy_file(path, chunk, n_rows, schema_emit, path_in_schema):
    """Minimal single-chunk file with a caller-supplied schema shape."""
    out = bytearray(MAGIC)
    data_off = len(out)
    for p in chunk.pages:
        out += _page_header(p, chunk.max_rep)
        out += p.data
    total = len(out) - data_off

    f = CompactWriter()
    f.field_i32(1, 1)
    n_elems = schema_emit(CompactWriter())
    f.begin_field_list(2, CT_STRUCT, 1 + n_elems)
    f.elem_struct_begin()
    f.field_string(4, "schema")
    f.field_i32(5, 1)
    f.end_struct()
    schema_emit(f)
    f.field_i64(3, n_rows)
    f.begin_field_list(4, CT_STRUCT, 1)
    f.elem_struct_begin()
    f.begin_field_list(1, CT_STRUCT, 1)
    f.elem_struct_begin()
    f.field_i64(2, data_off)
    f.begin_field_struct(3)
    f.field_i32(1, PHYS_ID["INT32"])
    f.begin_field_list(2, CT_I32, 2)
    f.elem_i32(ENCODINGS["PLAIN"])
    f.elem_i32(ENCODINGS["RLE"])
    f.begin_field_list(3, CT_BINARY, len(path_in_schema))
    for part in path_in_schema:
        f.elem_binary(part.encode())
    f.field_i32(4, 0)
    f.field_i64(5, sum(p.num_values for p in chunk.pages if p.kind == "data"))
    f.field_i64(6, total)
    f.field_i64(7, total)
    f.field_i64(9, data_off)
    f.end_struct()
    f.end_struct()
    f.field_i64(2, total)
    f.field_i64(3, n_rows)
    f.end_struct()
    meta = f.finish()
    out += meta
    out += struct.pack("<I", len(meta))
    out += MAGIC
    with open(path, "wb") as fh:
        fh.write(bytes(out))


def test_legacy_two_level_list(tmp_path):
    vals = [[1, 2, 3], None, [], [4], [5, 6]] * 20
    arr = pa.array(vals, type=pa.list_(pa.int32()))
    chunk = _encode_list_chunk(
        arr, policy="plain", page_target_bytes=1 << 20,
        compression="uncompressed", nullable=True, elem_nullable=False,
    )
    assert (chunk.max_def, chunk.max_rep) == (2, 1)

    def emit(w):
        _emit_element(w, "xs", repetition=1, num_children=1, converted=3)
        _emit_element(w, "element", ptype="INT32", repetition=2)
        return 2

    path = str(tmp_path / "legacy2.parquet")
    _legacy_file(path, chunk, len(arr), emit, ("xs", "element"))
    r = ParquetFileReader(path)
    leaf = r.column("xs")
    assert (leaf.max_def, leaf.max_rep, leaf.outer_optional) == (2, 1, True)
    assert r.read_column("xs").to_pylist() == vals
    # independent reader agrees on the legacy shape
    assert pq.read_table(path).column("xs").to_pylist() == vals


def test_legacy_one_level_repeated_leaf(tmp_path):
    # `repeated int32 xs;` straight at the root: no nulls expressible,
    # absent == empty (max_def = 1, d_empty = 0)
    vals = [[1, 2], [], [3], [4, 5, 6], []] * 20
    arr = pa.array(vals, type=pa.list_(pa.int32()))
    chunk = _encode_list_chunk(
        arr, policy="plain", page_target_bytes=1 << 20,
        compression="uncompressed", nullable=False, elem_nullable=False,
    )
    assert (chunk.max_def, chunk.max_rep) == (1, 1)

    def emit(w):
        _emit_element(w, "xs", ptype="INT32", repetition=2)
        return 1

    path = str(tmp_path / "legacy1.parquet")
    _legacy_file(path, chunk, len(arr), emit, ("xs",))
    r = ParquetFileReader(path)
    leaf = r.column("xs")
    assert (leaf.max_def, leaf.max_rep, leaf.outer_optional) == (1, 1, False)
    assert r.read_column("xs").to_pylist() == vals
    assert pq.read_table(path).column("xs").to_pylist() == vals
