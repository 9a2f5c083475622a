"""Column-partitioned stored pages layout.

A pages/lineage table written flat forces every reader to row-group-skip
its way past the other columns' page payloads.  Writing it partitioned by
``column`` (one Hive-style ``column=<name>`` directory per stored column,
nested dremel leaves included as ``column=text%23g0`` etc.) turns a
single-column decode or a bloom point-lookup into a scan of ONLY that
column's files — directory-level pruning, before any parquet footer is
even opened.  At 100 TB the text payload dominates the store; a decode of
a metadata column must not touch it.

Two read paths:

- :func:`read_store` resolves the partition directories in the driver and
  hands Spark only the matching paths — pruning guaranteed by
  construction, and ``df.inputFiles()`` provably contains no other
  column's files (``DataFrame.inputFiles`` reports the unpruned file
  index, so a filter-based read cannot make that assertion).
- A plain ``spark.read.parquet(store)`` works too: ``decode_table``'s
  ``column`` name filter is a partition-column predicate, so Catalyst
  prunes the same directories at file-listing time (the plan's
  FileSourceScan shows the PartitionFilters).

The layout is plain Hive partitioning — any parquet reader understands
it, and the ``column`` values round-trip through Spark's partition-path
escaping (``#`` -> ``%23``).

LOCAL-FS LIMITATION (ADVICE r6): :func:`is_column_store`,
:func:`store_column_dirs` and :func:`read_store` resolve partition
directories with ``os.listdir``, so driver-side auto-detection and
guaranteed pruning only work for paths the driver's filesystem can see
(local disk, NFS, fuse mounts).  On HDFS/S3 URLs the CLI's auto-detect
degrades to the plain-read path — which STILL prunes via Catalyst's
partition filters (the second read path above), just without the
``inputFiles``-provable guarantee.  Porting to the Hadoop FileSystem API
is the known follow-up for remote stores.
"""

from __future__ import annotations

import os
from urllib.parse import unquote

from pyspark.sql import DataFrame, SparkSession


def write_store(encoded: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write a pages+lineage frame as a column-partitioned store."""
    encoded.write.mode(mode).partitionBy("column").parquet(path)


def is_column_store(path: str) -> bool:
    """True if ``path`` holds a column-partitioned store layout."""
    try:
        return any(d.startswith("column=") for d in os.listdir(path))
    except OSError:
        return False


def store_column_dirs(path: str, columns: list[str] | None = None) -> list[str]:
    """Partition directories for the requested logical columns (always
    including row_id; a nested column brings all its ``<col>#g<i>`` dremel
    leaf directories).  ``columns=None`` returns every partition."""
    out = []
    for d in sorted(os.listdir(path)):
        if not d.startswith("column="):
            continue
        value = unquote(d.split("=", 1)[1])
        if columns is None or value == "row_id" or value in columns or any(
            value.startswith(f"{c}#g") for c in columns
        ):
            out.append(os.path.join(path, d))
    return out


def read_store(
    spark: SparkSession, path: str, columns: list[str] | None = None
) -> DataFrame:
    """Read a column-partitioned store, touching only the requested
    columns' directories.  The returned frame carries the ``column``
    partition column and feeds ``decode_table`` / ``prune_chunks`` /
    ``metrics_summary`` unchanged."""
    dirs = store_column_dirs(path, columns)
    if not dirs:
        raise ValueError(
            f"no matching column partitions under {path!r} for {columns!r}"
        )
    return spark.read.option("basePath", path).parquet(*dirs)
