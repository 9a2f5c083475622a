"""Round-trip verification + lineage/metrics helpers.

North-rule contract (BASELINE.json): encode column -> pages -> decode ->
compare, with per-row content sha256 equality vs the original, and a
lineage/metrics table (chunk id, codec chosen, compressed bytes, sha256)
enabling resumable re-runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .decode_job import decode_table


def roundtrip_verify(source: DataFrame, encoded: DataFrame, columns: list[str]) -> DataFrame:
    """Decode ``columns`` and join back to ``source`` on row_id.

    Returns one row per column: (column, rows, matches, mismatches).
    String columns compare on sha2(); other types compare value equality --
    both null-safe (<=> semantics).
    """
    decoded = decode_table(encoded, columns)
    src = source.select("row_id", *columns)
    joined = src.alias("s").join(decoded.alias("d"), "row_id", "full_outer")
    aggs = []
    for c in columns:
        s, d = F.col(f"s.`{c}`"), F.col(f"d.`{c}`")
        # sha2 for strings keeps the comparison cheap to shuffle; eqNullSafe
        # for everything else
        match = (
            F.sha2(s, 256).eqNullSafe(F.sha2(d, 256))
            if dict(src.dtypes)[c] == "string"
            else s.eqNullSafe(d)
        )
        aggs.append(F.sum(F.when(match, 0).otherwise(1)).alias(f"{c}_mismatches"))
    totals = joined.agg(F.count(F.lit(1)).alias("rows"), *aggs)
    return totals


def audit_lineage(encoded: DataFrame) -> DataFrame:
    """Self-contained integrity audit: decode every chunk, recompute its
    content sha256 and compare against the lineage -- detects bit rot /
    page corruption WITHOUT the source table.  Returns one row per chunk:
    (part_key, chunk_seq, column, ok, stored_sha, recomputed_sha).

    Scale shape: the same single (part_key, chunk_seq) shuffle as decode;
    each group audits independently.
    """
    import pyarrow as pa

    from ..codecs.pages import chunk_content_sha, decode_chunk, dremel_recompute_sha
    from .decode_job import _rebuild_chunk

    def audit_group(tbl: pa.Table) -> pa.Table:
        from parquet4seastar_spark import _alloc

        _alloc.tune_allocator()
        tbl = tbl.combine_chunks()
        kinds = tbl.column("kind").to_pylist()
        names = tbl.column("column").to_pylist()
        by_col: dict[str, list[int]] = {}
        stored: dict[str, str] = {}
        for i, (k, c) in enumerate(zip(kinds, names)):
            if k == "page":
                by_col.setdefault(c, []).append(i)
            elif k == "chunk":
                stored[c] = tbl.column("sha256")[i].as_py()
        part_key = tbl.column("part_key")[0].as_py()
        chunk_seq = int(tbl.column("chunk_seq")[0].as_py())
        cols, oks, st, rec = [], [], [], []
        for c, sha in stored.items():
            try:
                chunk = _rebuild_chunk(tbl, by_col[c])
                if chunk.logical.startswith("g:"):
                    # dremel leaf ('<col>#g<i>'): sha covers level streams
                    # + non-null values (pages.dremel_leaf_sha)
                    recomputed = dremel_recompute_sha(chunk)
                else:
                    recomputed = chunk_content_sha(decode_chunk(chunk))
            except Exception as e:  # corrupt pages may fail to decode at all
                recomputed = f"decode-error:{type(e).__name__}"
            cols.append(c)
            st.append(sha)
            rec.append(recomputed)
            oks.append(recomputed == sha)
        n = len(cols)
        return pa.table(
            {
                "part_key": pa.array([part_key] * n, type=pa.string()),
                "chunk_seq": pa.array([chunk_seq] * n, type=pa.int32()),
                "column": pa.array(cols, type=pa.string()),
                "ok": pa.array(oks, type=pa.bool_()),
                "stored_sha": pa.array(st, type=pa.string()),
                "recomputed_sha": pa.array(rec, type=pa.string()),
            }
        )

    return encoded.groupBy("part_key", "chunk_seq").applyInArrow(
        audit_group,
        schema=(
            "part_key string, chunk_seq int, column string, ok boolean, "
            "stored_sha string, recomputed_sha string"
        ),
    )


def lineage_table(encoded: DataFrame) -> DataFrame:
    """The chunk-summary rows = per-partition lineage/metrics."""
    return encoded.filter(F.col("kind") == "chunk").select(
        "part_key",
        "chunk_id",
        "column",
        "chunk_seq",
        "ptype",
        "logical",
        "nullable",
        "num_rows",
        "num_nulls",
        "cardinality",
        "encodings",
        "compression",
        "input_bytes",
        "encoded_bytes",
        F.col("compressed_size").alias("compressed_bytes"),
        "sha256",
        "n_pages",
    )


def metrics_summary(encoded: DataFrame) -> DataFrame:
    """Per-column aggregate compression metrics from chunk rows."""
    chunks = encoded.filter(F.col("kind") == "chunk")
    return (
        chunks.groupBy("column")
        .agg(
            F.sum("num_rows").alias("rows"),
            F.sum("num_nulls").alias("nulls"),
            F.sum("input_bytes").alias("input_bytes"),
            F.sum("encoded_bytes").alias("encoded_bytes"),
            F.count(F.lit(1)).alias("chunks"),
            F.concat_ws(",", F.array_sort(F.array_distinct(F.flatten(F.collect_list(F.split("encodings", ",")))))).alias(
                "encodings"
            ),
        )
        .withColumn("ratio", F.round(F.col("encoded_bytes") / F.col("input_bytes"), 4))
        .orderBy("column")
    )
