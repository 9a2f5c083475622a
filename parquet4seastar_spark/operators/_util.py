"""Scale-adaptive parallelism helper shared by the operator layer."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition ``df`` up to the session's default
    parallelism when its plan currently yields fewer partitions.

    Heavy per-row compute (shingle hashing, MinHash permutations,
    projection matmuls, per-pair cosine) is otherwise serialized onto
    however many tasks the SCAN happened to produce — a single small
    parquet file is ONE task no matter how many cores the session has.
    At corpus scale the scan already yields >= cores partitions and this
    is a NO-OP (no exchange is added); the repartition only fires where
    the input is small enough that the extra exchange costs microseconds
    against the serialized compute it unlocks.  Partitioning never
    affects operator results (all consumers are per-row / per-doc
    computations or partition-agnostic aggregates).
    """
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
