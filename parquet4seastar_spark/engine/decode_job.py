"""Distributed decode: pages DataFrame -> reconstructed column values.

Mirrors the reference read path (SURVEY.md §3.2): pages grouped per chunk,
dictionary page loaded first, values reassembled with nulls from def levels.
Spark shape: groupBy(part_key, chunk_seq) -> applyInArrow over the page
rows of the row_id chunk + the requested column chunks; output is
(row_id, <column values>) rows, joinable back to the source for the
round-trip sha256 verification (BASELINE.json per-row invariant).

Arrow end-to-end: page payloads arrive as arrow binary, decoded values
leave as arrow arrays -- the decoded strings never materialize as Python
objects.
"""

from __future__ import annotations

import pyarrow as pa
from pyspark.sql import DataFrame, functions as F

from ..codecs.pages import EncodedChunk, Page, decode_chunk

_SPARK_TYPES = {
    "string": "string",
    "binary": "binary",
    "flba": "binary",
    "int32": "int",
    "int64": "long",
    "timestamp_us": "timestamp_ntz",
    "date": "date",
    "float": "float",
    "double": "double",
    "bool": "boolean",
}

_PA_TYPES = {
    "string": pa.string(),
    "binary": pa.binary(),
    "flba": pa.binary(),
    "int32": pa.int32(),
    "int64": pa.int64(),
    "timestamp_us": pa.timestamp("us"),
    "date": pa.date32(),
    "float": pa.float32(),
    "double": pa.float64(),
    "bool": pa.bool_(),
}


def _rebuild_chunk(rows: list[dict]) -> EncodedChunk:
    rows = sorted(rows, key=lambda r: r["page_idx"])
    first = rows[0]
    chunk = EncodedChunk(
        ptype=first["ptype"],
        logical=first["logical"],
        nullable=bool(first["nullable"]),
        num_rows=int(first["num_rows"]),
        num_nulls=int(first["num_nulls"]),
        cardinality=int(first["cardinality"]),
        encodings=(first["encodings"] or "").split(","),
        compression=first["compression"],
        type_length=int(first.get("type_length") or 0),
    )
    for r in rows:
        chunk.pages.append(
            Page(
                kind=r["page_kind"],
                encoding=r["encoding"],
                num_values=int(r["num_values"]),
                num_non_null=int(r["num_non_null"]),
                uncompressed_size=int(r["uncompressed_size"]),
                compressed_size=int(r["compressed_size"]),
                data=r["data"],
            )
        )
    return chunk


def decode_table(encoded: DataFrame, columns: list[str]) -> DataFrame:
    """Decode the given columns from a pages DataFrame.

    Returns a DataFrame (row_id, *columns).  Output types follow the chunk
    metadata (logical types).
    """
    pages = encoded.filter((F.col("kind") == "page") & F.col("column").isin(["row_id", *columns]))

    # column -> spark type comes from chunk metadata; collect one row per
    # column (tiny, driver-side is fine: it's schema discovery, not data)
    meta = {
        r["column"]: r["logical"]
        for r in pages.select("column", "logical").distinct().collect()
    }
    missing = [c for c in ["row_id", *columns] if c not in meta]
    if missing:
        raise ValueError(f"columns not present in encoded table: {missing}")
    out_schema = ", ".join(
        ["row_id long"] + [f"`{c}` {_SPARK_TYPES[meta[c]]}" for c in columns]
    )
    cols = columns
    logicals = meta

    def decode_group(tbl: pa.Table) -> pa.Table:
        from parquet4seastar_spark import _alloc

        _alloc.tune_allocator()
        # page metadata is small (tens of rows); data stays as py bytes only
        # for the page payloads themselves
        recs = tbl.to_pylist()
        by_col: dict[str, list[dict]] = {}
        for r in recs:
            by_col.setdefault(r["column"], []).append(r)
        out_arrays = [decode_chunk(_rebuild_chunk(by_col["row_id"])).cast(pa.int64())]
        names = ["row_id"]
        for c in cols:
            arr = decode_chunk(_rebuild_chunk(by_col[c]))
            target = _PA_TYPES[logicals[c]]
            if arr.type != target:
                arr = arr.cast(target)
            out_arrays.append(arr)
            names.append(c)
        return pa.table(dict(zip(names, out_arrays)))

    return pages.groupBy("part_key", "chunk_seq").applyInArrow(decode_group, schema=out_schema)
