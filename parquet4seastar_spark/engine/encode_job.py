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

from ..codecs.pages import encode_chunk, encode_dremel_column

ENCODED_SCHEMA = (
    "kind string, part_key string, chunk_id string, column string, chunk_seq int, "
    "page_idx int, page_kind string, encoding string, num_values long, num_non_null long, "
    "uncompressed_size long, compressed_size long, data binary, "
    "ptype string, logical string, nullable boolean, num_rows long, num_nulls long, "
    "cardinality long, encodings string, compression string, type_length int, "
    "input_bytes long, encoded_bytes long, sha256 string, n_pages int, "
    "max_def int, max_rep int, elem_nullable boolean, "
    "stat_min_num double, stat_max_num double, stat_min_bin binary, stat_max_bin binary, "
    "salt_buckets int, bloom array<long>"
)

DATA_COLUMNS = ["repo", "path", "commit", "lang", "content"]

# NULL salt keys group under this sentinel: an equi-join on the raw salt
# column would silently DROP every null-keyed row (null never equals null
# in a join), losing data with no error.  '\x00' keeps it out of any
# realistic key space and off the '#' separator.
NULL_SALT_KEY = "\x00null"


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
    # null-keyed rows group under a sentinel: a raw equi-join on salt_col
    # would silently drop them (null never joins null)
    skey = F.coalesce(F.col(salt_col).cast("string"), F.lit(NULL_SALT_KEY))
    keyed = df.withColumn("_skey", skey)
    if salt_target_rows is not None:
        # row-count salting: scans only the key column (cheap); row count is
        # a good skew proxy when row sizes are iid within a key
        sizes = keyed.groupBy("_skey").agg(F.count(F.lit(1)).alias("_repo_size"))
        target = F.lit(salt_target_rows)
    else:
        sizes = keyed.groupBy("_skey").agg(
            F.sum(F.coalesce(F.octet_length(size_col), F.lit(0))).alias("_repo_size")
        )
        target = F.lit(salt_target_bytes)
    sizes = sizes.withColumn(
        "_salt_buckets",
        F.greatest(F.lit(1), F.ceil(F.col("_repo_size") / target)).cast("int"),
    ).drop("_repo_size")
    salted = (
        keyed.join(F.broadcast(sizes), "_skey")
        .withColumn("_salt", F.pmod(F.xxhash64("row_id"), F.col("_salt_buckets")).cast("int"))
        .withColumn("part_key", F.concat_ws("#", F.col("_skey"), F.col("_salt")))
        .withColumnRenamed("_salt_buckets", "salt_buckets")
        .drop("_salt", "_skey")
    )
    return salted.repartition(num_partitions, "part_key")


_OUT_SCHEMA_PA = None


def _payload_column(payloads) -> pa.Array:
    """Binary column from page payloads (bytes | None), built directly on
    arrow buffers: one vectorized memcpy per payload into the final buffer,
    no per-element Python object conversion inside pyarrow."""
    n = len(payloads)
    lens = np.fromiter(
        (len(p) if p is not None else 0 for p in payloads), dtype=np.int64, count=n
    )
    offsets64 = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets64[1:])
    total = int(offsets64[-1])
    if total > (1 << 31) - 1:  # pa.binary() carries int32 offsets
        raise ValueError("page payload batch exceeds 2 GiB; lower chunk_target_bytes")
    buf = np.empty(total, dtype=np.uint8)
    pos = 0
    null_count = 0
    for p in payloads:
        if p is None:
            null_count += 1
            continue
        m = len(p)
        buf[pos : pos + m] = np.frombuffer(p, dtype=np.uint8)
        pos += m
    validity = None
    if null_count:
        valid = np.fromiter((p is not None for p in payloads), dtype=bool, count=n)
        validity = pa.py_buffer(np.packbits(valid, bitorder="little").tobytes())
    return pa.Array.from_buffers(
        pa.binary(),
        n,
        [validity, pa.py_buffer(offsets64.astype(np.int32)), pa.py_buffer(buf)],
        null_count=null_count if null_count else 0,
    )


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
                # the salt-bucket count of this part_key's key, recorded so
                # verify can rebuild part keys without inferring the modulus
                # from observed salts (a zero-row top bucket would undercount
                # and trip a spurious whole-table mismatch)
                ("salt_buckets", pa.int32()),
                # equality-pruning bloom (prune_chunks eq=...); None when the
                # column/chunk is outside the bloom caps (codecs/bloom.py)
                ("bloom", pa.list_(pa.int64())),
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
        # one FSST symbol table per (column, part_key): training is a fixed
        # ~15 ms per chunk and dominated auto encode on many-small-chunk
        # layouts.  Keying by part_key keeps the table within one repo's
        # vocabulary (a per-task table measured +5.6% encoded bytes on the
        # repo-heterogeneous bench corpus), so the ratio is unchanged; at
        # production chunk counts (a 1 GB key = 64 chunks) this removes
        # ~98% of trains.  Every page still serializes its own table, so
        # decode and the wire format are unchanged (see _auto_plan).
        fsst_tables: dict[str, object] = {}

        def flush(tables: list[pa.Table]) -> Iterator[pa.RecordBatch]:
            tbl = pa.concat_tables(tables).combine_chunks()
            # one chunk per (part_key) slice; the partition may hold several
            # part_keys after hash routing -- encode each separately so
            # lineage stays per-(repo,salt).  Arrow-native group split:
            # sort indices by key, slice runs.  A single-key slice (always
            # true under map_only/cluster_by, common under salting) skips
            # the sort + take entirely -- both are full-table memcpys of
            # the value bytes.
            keys = tbl.column("part_key").combine_chunks().dictionary_encode()
            if len(keys.dictionary) == 1:
                key = keys.dictionary[0].as_py()
                seq = chunk_seq_by_key.get(key, 0)
                chunk_seq_by_key[key] = seq + 1
                yield _encode_chunk_rows(tbl, key, seq)
                return
            order = pa.compute.sort_indices(tbl.column("part_key"))
            np_keys = np.asarray(keys.indices.take(order))
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
            salt_buckets = int(tbl.column("salt_buckets")[0].as_py())
            # rows are field-order TUPLES (zip-transposed once at the end),
            # not per-row dicts; the page payload column is assembled
            # arrow-native from the payload buffers (one memcpy into the
            # final arrow buffer, no per-element Python binary path)
            rows = []
            leaf_chunks: list[tuple[str, object]] = []
            for col in ["row_id", *columns]:
                arr = tbl.column(col).combine_chunks()
                if fixed_len and col in fixed_len:
                    # FIXED_LEN_BYTE_ARRAY route: spark has no fixed-size
                    # binary type, so equal-length binary columns opt in here
                    arr = arr.cast(pa.binary(fixed_len[col]))
                # row_id gets int auto-selection regardless of the value
                # policy (sequential ids -> DBP ~free; random ids -> PLAIN);
                # a dict policy maps column -> policy (default auto)
                if col == "row_id":
                    cpolicy = "auto"
                elif isinstance(policy, dict):
                    cpolicy = policy.get(col, "auto")
                else:
                    cpolicy = policy
                is_plain_list = (
                    pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type)
                ) and not pa.types.is_nested(arr.type.value_type)
                if pa.types.is_nested(arr.type) and not is_plain_list:
                    # ANY nested shape beyond list<primitive> (struct, map,
                    # list<struct>, list<list<...>>, any composition/depth)
                    # goes through the ONE recursive Dremel walker: leaf
                    # chunks '<col>#g<i>', tree spec in chunk.logical
                    for suffix, gchunk in encode_dremel_column(
                        arr,
                        policy=cpolicy,
                        page_target_bytes=page_target_bytes,
                        compression=compression,
                    ).items():
                        leaf_chunks.append((f"{col}{suffix}", gchunk))
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
                                fsst_cache=fsst_tables,
                                fsst_cache_key=f"{col}|{part_key}",
                            ),
                        )
                    )
            for col, chunk in leaf_chunks:
                chunk_id = hashlib.sha1(f"{part_key}|{col}|{seq}".encode()).hexdigest()[:20]
                encs = ",".join(chunk.encodings)
                for pi, page in enumerate(chunk.pages):
                    # field order = _out_schema_pa()
                    rows.append((
                        "page", part_key, chunk_id, col, seq, pi,
                        page.kind, page.encoding, page.num_values,
                        page.num_non_null, page.uncompressed_size,
                        page.compressed_size, page.data,
                        chunk.ptype, chunk.logical, chunk.nullable,
                        chunk.num_rows, chunk.num_nulls, chunk.cardinality,
                        encs, chunk.compression, chunk.type_length,
                        None, None, None, len(chunk.pages),
                        chunk.max_def, chunk.max_rep, chunk.elem_nullable,
                        None, None, None, None, None, None,
                    ))
                rows.append((
                    "chunk", part_key, chunk_id, col, seq, -1,
                    None, None, chunk.num_rows,
                    chunk.num_rows - chunk.num_nulls, chunk.encoded_bytes,
                    chunk.compressed_bytes, None,
                    chunk.ptype, chunk.logical, chunk.nullable,
                    chunk.num_rows, chunk.num_nulls, chunk.cardinality,
                    encs, chunk.compression, chunk.type_length,
                    chunk.input_bytes, chunk.encoded_bytes, chunk.sha256,
                    len(chunk.pages), chunk.max_def, chunk.max_rep,
                    chunk.elem_nullable, chunk.stat_min_num,
                    chunk.stat_max_num, chunk.stat_min_bin, chunk.stat_max_bin,
                    salt_buckets,
                    chunk.bloom.tolist() if chunk.bloom is not None else None,
                ))
            schema = _out_schema_pa()
            by_field = list(zip(*rows))
            data_idx = schema.get_field_index("data")
            arrays = []
            for i, f in enumerate(schema):
                if i == data_idx:
                    arrays.append(_payload_column(by_field[i]))
                else:
                    arrays.append(pa.array(list(by_field[i]), type=f.type))
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
    policy: str | dict[str, str] = "auto",
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
    cluster_by: str | None = None,
    map_only: bool = False,
) -> DataFrame:
    """Encode ``df`` (must carry row_id + the data columns) into a pages+
    lineage DataFrame (see ENCODED_SCHEMA).

    ``resume_lineage``: a previously written lineage table (kind='chunk'
    rows); partitions whose part_key is already fully present are skipped
    via a broadcast anti-join (north rule: resumable re-runs).

    ``cluster_by``: range-clustered layout instead of salted hash
    partitioning — rows are range-partitioned AND sorted within partitions
    on the given column, so every chunk covers a narrow value range and
    the chunk min/max statistics (plus blooms) actually prune range and
    point predicates (``prune_chunks``).  On unsorted data, stats pruning
    only wins when values are naturally clustered; this is the layout
    knob that makes it win by construction.  part_key becomes the range
    bucket id ('r<i>').  Unlike the salted layout, these labels are
    POSITIONAL, not a pure function of row data: separate evaluations of
    an unmaterialized plan can sample different range boundaries (the
    sampler is seeded from the RDD id), so PERSIST OR WRITE the returned
    frame before feeding it to anything that evaluates it from two
    subtrees (prune_chunks' drop-set anti-join; the repo's own callers
    persist/write already — pruned_scan persists, the CLI writes to
    parquet).  For the same reason ``resume_lineage`` is refused in this
    mode and round-trip verification uses the row-level join
    (``roundtrip_verify_fast`` rejects unsalted part keys).  The salting
    parameters are ignored in this mode.

    ``map_only``: encode each SCAN partition in place — ZERO value
    shuffle.  At corpus scale the salted exchange moves every input byte
    once; when repo-grouped chunks are not required (pure archival
    compression, or input already laid out as desired), this deletes
    that full-corpus shuffle and the whole job is one map pass over the
    scan splits.  Chunk grouping follows storage order (part_key =
    'm<scan split>'); compression stays comparable — codecs adapt per
    chunk regardless of grouping.  Same caveats as
    cluster_by: positional part keys (persist/write before multi-subtree
    use), no resume, row-level verification.
    """
    if map_only and (cluster_by is not None):
        raise ValueError("map_only and cluster_by are mutually exclusive")
    if map_only and resume_lineage is not None:
        raise ValueError(
            "resume_lineage cannot be combined with map_only: scan-split "
            "part keys shift when file layout or split size changes"
        )
    if cluster_by is not None and resume_lineage is not None:
        raise ValueError(
            "resume_lineage cannot be combined with cluster_by: range "
            "bucket boundaries (and so part keys) are not stable across "
            "runs, and the anti-join would silently skip shifted rows"
        )
    columns = columns or [c for c in DATA_COLUMNS if c in df.columns]
    if not columns:
        raise ValueError(
            "no encodable columns: pass columns=[...] explicitly "
            f"(input has {df.columns}; defaults cover {DATA_COLUMNS})"
        )
    for c in ["row_id", *columns]:
        # nested leaf names are built as '<col>#g<i>' (and dremel field
        # paths are dot-joined): a top-level column named with '.' or '#'
        # would silently misroute on decode — fail fast, like struct field
        # names do at the codec layer
        if "." in c or "#" in c:
            raise ValueError(
                f"column name {c!r} collides with the dot-joined leaf path "
                "scheme ('.' and '#' are reserved); rename before encoding"
            )
    # engine-generated columns: an input column with one of these names
    # would otherwise surface as a deep AMBIGUOUS_REFERENCE inside the
    # salting plan instead of a clear error here
    for c in ("part_key", "salt_buckets", "_salt", "_repo_size", "_skey"):
        if c in df.columns:
            raise ValueError(
                f"input column name {c!r} is reserved by the encode engine "
                "(salting/lineage); rename before encoding"
            )
    spark = df.sparkSession
    num_partitions = num_partitions or max(spark.sparkContext.defaultParallelism, 8)
    if map_only:
        salted = df.withColumn(
            "part_key",
            F.concat(F.lit("m"), F.spark_partition_id().cast("string")),
        ).withColumn("salt_buckets", F.lit(1))
    elif cluster_by is not None:
        salted = (
            df.repartitionByRange(num_partitions, cluster_by)
            .sortWithinPartitions(cluster_by)
            .withColumn(
                "part_key",
                F.concat(F.lit("r"), F.spark_partition_id().cast("string")),
            )
            .withColumn("salt_buckets", F.lit(1))
        )
    else:
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
    return salted.select("part_key", "salt_buckets", "row_id", *columns).mapInArrow(
        fn, schema=ENCODED_SCHEMA
    )
