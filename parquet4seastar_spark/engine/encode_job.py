"""Distributed per-column chunk encoding.

Spark-first architecture (SURVEY.md §3.1 re-architecture):

    input DF (row_id, repo, path, commit, lang, content)
      -> salted repartition on repo (skew-aware, computed distributively)
      -> mapInArrow(encode_partition): each partition plays the role of a
         parquet row group; per column, per ~chunk_target_bytes slice, the
         codec layer (codecs/pages.py) builds stats, auto-selects the codec,
         and emits page rows + one chunk summary row
      -> one output DataFrame with kind in ('page', 'chunk')

The chunk rows ARE the lineage/metrics table (chunk id, codec, bytes,
sha256): written to parquet they give resumable re-runs via an anti-join on
completed partition keys (north rule: per-partition checkpointed lineage).

Scale notes:
- the salt factor is computed with a groupBy(repo) aggregate joined back
  (broadcast when small) -- no driver-side collect, works at 10^12 rows;
- a jumbo repo is split into ceil(bytes / salt_target_bytes) salt buckets,
  so no single task serializes the job (Zipf skew, FIXTURES.md §1);
- arrow end-to-end: mapInArrow in, RecordBatch out -- column values never
  materialize as Python objects (no per-row Python anywhere).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame, functions as F

from ..codecs.pages import (
    encode_chunk,
    encode_map_chunk,
    encode_struct_chunk,
    encode_struct_list_chunk,
)

ENCODED_SCHEMA = (
    "kind string, part_key string, chunk_id string, column string, chunk_seq int, "
    "page_idx int, page_kind string, encoding string, num_values long, num_non_null long, "
    "uncompressed_size long, compressed_size long, data binary, "
    "ptype string, logical string, nullable boolean, num_rows long, num_nulls long, "
    "cardinality long, encodings string, compression string, type_length int, "
    "input_bytes long, encoded_bytes long, sha256 string, n_pages int, "
    "max_def int, max_rep int, elem_nullable boolean, "
    "stat_min_num double, stat_max_num double, stat_min_bin binary, stat_max_bin binary"
)

DATA_COLUMNS = ["repo", "path", "commit", "lang", "content"]


def salted_repartition(
    df: DataFrame,
    num_partitions: int,
    salt_target_bytes: int = 64 << 20,
    size_col: str = "content",
    salt_col: str = "repo",
    salt_target_rows: int | None = None,
) -> DataFrame:
    """Repartition by (repo, salt) where jumbo repos get split into
    ceil(repo_bytes / salt_target_bytes) buckets.

    The per-repo sizes are a distributed aggregate joined back (broadcast:
    the repo-size table has one row per repo, tiny relative to the data);
    rows are routed with a deterministic hash of (path, commit) so a re-run
    produces identical partitions.
    """
    if salt_target_rows is not None:
        # row-count salting: scans only the key column (cheap); row count is
        # a good skew proxy when row sizes are iid within a key
        sizes = df.groupBy(salt_col).agg(F.count(F.lit(1)).alias("_repo_size"))
        target = F.lit(salt_target_rows)
    else:
        sizes = df.groupBy(salt_col).agg(
            F.sum(F.coalesce(F.octet_length(size_col), F.lit(0))).alias("_repo_size")
        )
        target = F.lit(salt_target_bytes)
    sizes = sizes.withColumn(
        "_salt_buckets",
        F.greatest(F.lit(1), F.ceil(F.col("_repo_size") / target)).cast("int"),
    ).drop("_repo_size")
    salted = (
        df.join(F.broadcast(sizes), salt_col)
        .withColumn("_salt", F.pmod(F.xxhash64("row_id"), F.col("_salt_buckets")).cast("int"))
        .withColumn("part_key", F.concat_ws("#", F.col(salt_col), F.col("_salt")))
        .drop("_salt", "_salt_buckets")
    )
    return salted.repartition(num_partitions, "part_key")


_OUT_SCHEMA_PA = None


def _out_schema_pa() -> pa.Schema:
    global _OUT_SCHEMA_PA
    if _OUT_SCHEMA_PA is None:
        _OUT_SCHEMA_PA = pa.schema(
            [
                ("kind", pa.string()),
                ("part_key", pa.string()),
                ("chunk_id", pa.string()),
                ("column", pa.string()),
                ("chunk_seq", pa.int32()),
                ("page_idx", pa.int32()),
                ("page_kind", pa.string()),
                ("encoding", pa.string()),
                ("num_values", pa.int64()),
                ("num_non_null", pa.int64()),
                ("uncompressed_size", pa.int64()),
                ("compressed_size", pa.int64()),
                ("data", pa.binary()),
                ("ptype", pa.string()),
                ("logical", pa.string()),
                ("nullable", pa.bool_()),
                ("num_rows", pa.int64()),
                ("num_nulls", pa.int64()),
                ("cardinality", pa.int64()),
                ("encodings", pa.string()),
                ("compression", pa.string()),
                ("type_length", pa.int32()),
                ("input_bytes", pa.int64()),
                ("encoded_bytes", pa.int64()),
                ("sha256", pa.string()),
                ("n_pages", pa.int32()),
                ("max_def", pa.int32()),
                ("max_rep", pa.int32()),
                ("elem_nullable", pa.bool_()),
                ("stat_min_num", pa.float64()),
                ("stat_max_num", pa.float64()),
                ("stat_min_bin", pa.binary()),
                ("stat_max_bin", pa.binary()),
            ]
        )
    return _OUT_SCHEMA_PA


def _encode_partition_factory(
    columns, policy, page_target_bytes, chunk_target_bytes, compression, fixed_len=None
):
    def encode_partition(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from parquet4seastar_spark import _alloc

        _alloc.tune_allocator()
        pending: list[pa.Table] = []
        pending_bytes = 0
        chunk_seq_by_key: dict[str, int] = {}

        def flush(tables: list[pa.Table]) -> Iterator[pa.RecordBatch]:
            tbl = pa.concat_tables(tables).combine_chunks()
            # one chunk per (part_key) slice; the partition may hold several
            # part_keys after hash routing -- encode each separately so
            # lineage stays per-(repo,salt).  Arrow-native group split:
            # sort indices by key, slice runs.
            keys = tbl.column("part_key")
            order = pa.compute.sort_indices(keys)
            sorted_keys = keys.take(order)
            np_keys = np.asarray(sorted_keys.combine_chunks().dictionary_encode().indices)
            boundaries = np.flatnonzero(np.diff(np_keys)) + 1
            starts = np.concatenate([[0], boundaries])
            ends = np.concatenate([boundaries, [len(np_keys)]])
            for st, en in zip(starts.tolist(), ends.tolist()):
                sub = tbl.take(order.slice(st, en - st))
                key = sub.column("part_key")[0].as_py()
                seq = chunk_seq_by_key.get(key, 0)
                chunk_seq_by_key[key] = seq + 1
                yield _encode_chunk_rows(sub, key, seq)

        def _encode_chunk_rows(tbl: pa.Table, part_key: str, seq: int) -> pa.RecordBatch:
            rows = []
            leaf_chunks: list[tuple[str, object]] = []
            for col in ["row_id", *columns]:
                arr = tbl.column(col).combine_chunks()
                if fixed_len and col in fixed_len:
                    # FIXED_LEN_BYTE_ARRAY route: spark has no fixed-size
                    # binary type, so equal-length binary columns opt in here
                    arr = arr.cast(pa.binary(fixed_len[col]))
                # row_id gets int auto-selection regardless of the value
                # policy (sequential ids -> DBP ~free; random ids -> PLAIN)
                cpolicy = "auto" if col == "row_id" else policy
                if pa.types.is_struct(arr.type):
                    # struct-of-primitives: one leaf chunk per field, named
                    # '<col>.<idx>.<field>' so decode can reassemble in order
                    fchunks = encode_struct_chunk(
                        arr,
                        policy=cpolicy,
                        page_target_bytes=page_target_bytes,
                        compression=compression,
                    )
                    for i, (fname, fchunk) in enumerate(fchunks.items()):
                        leaf_chunks.append((f"{col}.{i}.{fname}", fchunk))
                elif (
                    pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type)
                ) and pa.types.is_struct(arr.type.value_type):
                    # list<struct<...>> (token spans): per-field list chunks,
                    # '<col>.<idx>.<field>' with list< logicals marking the
                    # list-of-struct reassembly on decode
                    fchunks = encode_struct_list_chunk(
                        arr,
                        policy=cpolicy,
                        page_target_bytes=page_target_bytes,
                        compression=compression,
                    )
                    for i, (fname, fchunk) in enumerate(fchunks.items()):
                        leaf_chunks.append((f"{col}.{i}.{fname}", fchunk))
                elif pa.types.is_map(arr.type):
                    # map<k,v>: key/value list chunks sharing the map offsets
                    mchunks = encode_map_chunk(
                        arr,
                        policy=cpolicy,
                        page_target_bytes=page_target_bytes,
                        compression=compression,
                    )
                    leaf_chunks.append((f"{col}.#key", mchunks["key"]))
                    leaf_chunks.append((f"{col}.#value", mchunks["value"]))
                else:
                    leaf_chunks.append(
                        (
                            col,
                            encode_chunk(
                                arr,
                                policy=cpolicy,
                                page_target_bytes=page_target_bytes,
                                compression=compression,
                                nullable=arr.null_count > 0,
                            ),
                        )
                    )
            for col, chunk in leaf_chunks:
                chunk_id = hashlib.sha1(f"{part_key}|{col}|{seq}".encode()).hexdigest()[:20]
                for pi, page in enumerate(chunk.pages):
                    rows.append(
                        {
                            "kind": "page",
                            "part_key": part_key,
                            "chunk_id": chunk_id,
                            "column": col,
                            "chunk_seq": seq,
                            "page_idx": pi,
                            "page_kind": page.kind,
                            "encoding": page.encoding,
                            "num_values": page.num_values,
                            "num_non_null": page.num_non_null,
                            "uncompressed_size": page.uncompressed_size,
                            "compressed_size": page.compressed_size,
                            "data": page.data,
                            "ptype": chunk.ptype,
                            "logical": chunk.logical,
                            "nullable": chunk.nullable,
                            "num_rows": chunk.num_rows,
                            "num_nulls": chunk.num_nulls,
                            "cardinality": chunk.cardinality,
                            "encodings": ",".join(chunk.encodings),
                            "compression": chunk.compression,
                            "type_length": chunk.type_length,
                            "input_bytes": None,
                            "encoded_bytes": None,
                            "sha256": None,
                            "n_pages": len(chunk.pages),
                            "max_def": chunk.max_def,
                            "max_rep": chunk.max_rep,
                            "elem_nullable": chunk.elem_nullable,
                            "stat_min_num": None,
                            "stat_max_num": None,
                            "stat_min_bin": None,
                            "stat_max_bin": None,
                        }
                    )
                rows.append(
                    {
                        "kind": "chunk",
                        "part_key": part_key,
                        "chunk_id": chunk_id,
                        "column": col,
                        "chunk_seq": seq,
                        "page_idx": -1,
                        "page_kind": None,
                        "encoding": None,
                        "num_values": chunk.num_rows,
                        "num_non_null": chunk.num_rows - chunk.num_nulls,
                        "uncompressed_size": chunk.encoded_bytes,
                        "compressed_size": chunk.compressed_bytes,
                        "data": None,
                        "ptype": chunk.ptype,
                        "logical": chunk.logical,
                        "nullable": chunk.nullable,
                        "num_rows": chunk.num_rows,
                        "num_nulls": chunk.num_nulls,
                        "cardinality": chunk.cardinality,
                        "encodings": ",".join(chunk.encodings),
                        "compression": chunk.compression,
                        "type_length": chunk.type_length,
                        "input_bytes": chunk.input_bytes,
                        "encoded_bytes": chunk.encoded_bytes,
                        "sha256": chunk.sha256,
                        "n_pages": len(chunk.pages),
                        "max_def": chunk.max_def,
                        "max_rep": chunk.max_rep,
                        "elem_nullable": chunk.elem_nullable,
                        "stat_min_num": chunk.stat_min_num,
                        "stat_max_num": chunk.stat_max_num,
                        "stat_min_bin": chunk.stat_min_bin,
                        "stat_max_bin": chunk.stat_max_bin,
                    }
                )
            schema = _out_schema_pa()
            arrays = [
                pa.array([r[f.name] for r in rows], type=f.type) for f in schema
            ]
            return pa.RecordBatch.from_arrays(arrays, schema=schema)

        for rb in batches:
            t = pa.Table.from_batches([rb])
            pending.append(t)
            pending_bytes += t.nbytes
            if pending_bytes >= chunk_target_bytes:
                yield from flush(pending)
                pending = []
                pending_bytes = 0
        if pending:
            yield from flush(pending)

    return encode_partition


def encode_table(
    df: DataFrame,
    columns: list[str] | None = None,
    *,
    policy: str = "auto",
    num_partitions: int | None = None,
    page_target_bytes: int = 1 << 20,
    chunk_target_bytes: int = 32 << 20,
    salt_target_bytes: int = 64 << 20,
    compression: str = "uncompressed",
    resume_lineage: DataFrame | None = None,
    salt_col: str = "repo",
    size_col: str | None = None,
    salt_target_rows: int | None = None,
    fixed_len: dict[str, int] | None = None,
) -> DataFrame:
    """Encode ``df`` (must carry row_id + the data columns) into a pages+
    lineage DataFrame (see ENCODED_SCHEMA).

    ``resume_lineage``: a previously written lineage table (kind='chunk'
    rows); partitions whose part_key is already fully present are skipped
    via a broadcast anti-join (north rule: resumable re-runs).
    """
    columns = columns or [c for c in DATA_COLUMNS if c in df.columns]
    if not columns:
        raise ValueError(
            "no encodable columns: pass columns=[...] explicitly "
            f"(input has {df.columns}; defaults cover {DATA_COLUMNS})"
        )
    spark = df.sparkSession
    num_partitions = num_partitions or max(spark.sparkContext.defaultParallelism, 8)
    if size_col is None:
        size_col = "content" if "content" in df.columns else columns[-1]
    salted = salted_repartition(
        df, num_partitions, salt_target_bytes, size_col, salt_col, salt_target_rows
    )
    if resume_lineage is not None:
        done = resume_lineage.filter(F.col("kind") == "chunk").select("part_key").distinct()
        salted = salted.join(F.broadcast(done), "part_key", "left_anti")
    fn = _encode_partition_factory(
        columns, policy, page_target_bytes, chunk_target_bytes, compression, fixed_len
    )
    return salted.select("part_key", "row_id", *columns).mapInArrow(fn, schema=ENCODED_SCHEMA)
