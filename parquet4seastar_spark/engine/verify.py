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
