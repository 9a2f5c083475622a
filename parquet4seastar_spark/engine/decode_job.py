"""Distributed decode: pages DataFrame -> reconstructed column values.

Mirrors the reference read path (SURVEY.md §3.2): pages grouped per chunk,
dictionary page loaded first, values reassembled with nulls from def levels.
Spark shape: groupBy(part_key, chunk_seq) -> applyInPandas over the page
rows of the row_id chunk + the requested column chunks; output is
(row_id, <column values>) rows, joinable back to the source for the
round-trip sha256 verification (BASELINE.json per-row invariant).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame, functions as F

from ..codecs.pages import EncodedChunk, Page, decode_chunk

_SPARK_TYPES = {
    "string": "string",
    "binary": "binary",
    "int32": "int",
    "int64": "long",
    "float": "float",
    "double": "double",
    "bool": "boolean",
}


def _rebuild_chunk(rows: pd.DataFrame) -> EncodedChunk:
    rows = rows.sort_values("page_idx")
    first = rows.iloc[0]
    chunk = EncodedChunk(
        ptype=first["ptype"],
        logical=first["logical"],
        nullable=bool(first["nullable"]),
        num_rows=int(first["num_rows"]),
        num_nulls=int(first["num_nulls"]),
        cardinality=int(first["cardinality"]),
        encodings=(first["encodings"] or "").split(","),
        compression=first["compression"],
    )
    for _, r in rows.iterrows():
        chunk.pages.append(
            Page(
                kind=r["page_kind"],
                encoding=r["encoding"],
                num_values=int(r["num_values"]),
                num_non_null=int(r["num_non_null"]),
                uncompressed_size=int(r["uncompressed_size"]),
                compressed_size=int(r["compressed_size"]),
                data=bytes(r["data"]),
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

    def decode_group(pdf: pd.DataFrame) -> pd.DataFrame:
        from parquet4seastar_spark import _alloc

        _alloc.tune_allocator()
        by_col = dict(tuple(pdf.groupby("column")))
        row_ids = decode_chunk(_rebuild_chunk(by_col["row_id"])).to_pandas()
        out = {"row_id": row_ids}
        for c in cols:
            arr = decode_chunk(_rebuild_chunk(by_col[c]))
            out[c] = arr.to_pandas()
        return pd.DataFrame(out)

    return pages.groupBy("part_key", "chunk_seq").applyInPandas(decode_group, schema=out_schema)
