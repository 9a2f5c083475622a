"""Standard-parquet export sink: pages+lineage DataFrame -> real .parquet
files, one per (part_key, chunk_seq) group, written distributively.

This is the bridge from the engine's page store to ANY parquet consumer:
chunks encoded with standard encodings (auto_fast / reference / plain /
dict / DBP / DLBA / DBA / BSS, uncompressed or snappy) serialize through
codecs/parquet_file.py with Thrift metadata; Spark's built-in parquet
reader (and pyarrow, DuckDB, ...) reads the output directly.  FSST chunks
are rejected with guidance -- FSST is not a standard parquet encoding, so
export from the 'auto' profile requires re-encoding.

Scale shape: one applyInArrow pass over the page groups (the same shuffle
the decoder uses); each task writes its own file to the (shared) output
directory -- no driver-side collection of data.
"""

from __future__ import annotations

import os

import pyarrow as pa
from pyspark.sql import DataFrame, functions as F

from ..codecs.parquet_file import DremelColumn, write_parquet_file
from .decode_job import _rebuild_chunk


def export_parquet_files(
    encoded: DataFrame, columns: list[str], out_dir: str
) -> DataFrame:
    """Write each (part_key, chunk_seq) chunk group as a standard .parquet
    file under ``out_dir``; returns (part_key, chunk_seq, file, num_rows)."""
    os.makedirs(out_dir, exist_ok=True)
    name_filter = F.col("column").isin(["row_id", *columns])
    for c in columns:
        # nested columns are '<col>#g<i>' dremel leaf chunks
        name_filter = name_filter | F.col("column").startswith(f"{c}#g")
    pages = encoded.filter((F.col("kind") == "page") & name_filter)
    cols = ["row_id", *columns]

    def write_group(tbl: pa.Table) -> pa.Table:
        from parquet4seastar_spark import _alloc

        _alloc.tune_allocator()
        tbl = tbl.combine_chunks()
        by_col: dict[str, list[int]] = {}
        for i, c in enumerate(tbl.column("column").to_pylist()):
            by_col.setdefault(c, []).append(i)
        part_key = tbl.column("part_key")[0].as_py()
        chunk_seq = int(tbl.column("chunk_seq")[0].as_py())
        chunks = {}
        for c in cols:
            if c in by_col:
                chunks[c] = _rebuild_chunk(tbl, by_col[c])
            else:
                leaves = {
                    name: _rebuild_chunk(tbl, idxs)
                    for name, idxs in by_col.items()
                    if name.startswith(f"{c}#g")
                }
                if not leaves:
                    raise ValueError(f"column not present in encoded table: {c}")
                chunks[c] = DremelColumn(leaves)
        num_rows = next(
            c.num_rows if not isinstance(c, DremelColumn)
            else next(iter(c.leaves.values())).num_rows
            for c in chunks.values()
        )
        safe_key = "".join(ch if ch.isalnum() else "_" for ch in part_key)
        path = os.path.join(out_dir, f"part-{safe_key}-{chunk_seq:05d}.parquet")
        write_parquet_file(path, chunks, num_rows)
        return pa.table(
            {
                "part_key": pa.array([part_key], type=pa.string()),
                "chunk_seq": pa.array([chunk_seq], type=pa.int32()),
                "file": pa.array([path], type=pa.string()),
                "num_rows": pa.array([num_rows], type=pa.int64()),
            }
        )

    return pages.groupBy("part_key", "chunk_seq").applyInArrow(
        write_group, schema="part_key string, chunk_seq int, file string, num_rows long"
    )
