"""SparkSession builder tuned for the encode engine.

Single place for the settings that matter at scale:
- AQE on (runtime coalescing + skew-join splitting),
- Arrow transport for pandas UDFs (the codec kernels are Arrow-batch
  consumers; input_hint mandates no per-row Python),
- shuffle partitions sized to cores by default (overridable; on a real
  cluster this would be ~2-3x total executor cores).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "parquet4seastar_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or max(cpus, 8)
    # executor python workers must be able to import this package no matter
    # the caller's cwd (the spark-submit equivalent would be --py-files);
    # local-mode workers inherit the driver environment, so extend PYTHONPATH
    pkg_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    pp = os.environ.get("PYTHONPATH", "")
    if pkg_root not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = f"{pkg_root}{os.pathsep}{pp}" if pp else pkg_root
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # prefer shuffled-hash over sort-merge when the per-partition build
        # side fits (guide §3.1): the operator joins here are ids/buckets
        # keyed with bounded per-key groups, where SMJ pays two full sorts
        # for nothing; AQE's local-map threshold also lets it rewrite SMJ
        # at runtime.  Sort-merge remains the planner's fallback whenever
        # the size conditions fail, so skew/oversized builds degrade
        # gracefully.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # 32 MB scan splits (default 128 MB): the encode pipeline is
        # stream-bound once the C codec kernel is loaded, and coarse scan
        # splits under-feed the exchange — measured +25% on the plain-
        # policy local[16] leg (10.6 -> 8.5 s on 2.4 GB).  At cluster
        # scale this is the same knob executors tune for python-worker
        # pipelines; override via extra_conf if a deployment prefers
        # coarser splits.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("P4S_SCAN_SPLIT_BYTES", str(32 << 20)),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        # the \r progress bar interleaves with result lines in captured
        # logs (driver bench tails, oracle-replica output) — drop it
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
