"""Auxiliary measurement harness (round 7) — NOT the driver contract.

`bench.py` is frozen for measurement; this file exists so optimization
work can time subsets quickly with the same methodology (same session
conf, same best-of-2 rule, same .count() action) without paying the
encode legs on every iteration, and so per-stage isolation (noop-sink
style) can be cited in OPTIMIZATION_r07.md.

Usage:
  python bench_extra.py queries [name ...]   # headline query subset
  python bench_extra.py encode [policy]      # one encode leg at local[16]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _new_spark(cpus: int):
    from parquet4seastar_spark.engine.session import get_spark

    spark = get_spark(
        app_name=f"p4s-bench-extra-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def time_queries(names: list[str]) -> dict[str, float]:
    import __spark_entry__ as entrymod

    spark = _new_spark(CPUS)
    out: dict[str, float] = {}
    try:
        qs = entrymod.queries()
        for name in names:
            spark.sparkContext.setJobDescription(name)
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                qs[name](spark, SF_DIR).count()
                d = time.perf_counter() - t0
                best = d if best is None or d < best else best
            out[name] = round(best, 2)
            print(f"[extra] {name}: {best:.2f}s", file=sys.stderr)
    finally:
        spark.stop()
    return out


def time_encode(policy: str = "auto", cpus: int = 16, map_only: bool = False) -> dict:
    import bench as benchmod

    spark = _new_spark(min(CPUS, 8))
    data_path, rows, content_bytes = benchmod.ensure_bench_data(spark)
    spark.stop()
    r = benchmod.encode_bench(
        cpus, data_path, content_bytes, repeats=2, policy=policy, map_only=map_only
    )
    return r


DEFAULT_QUERIES = [
    "dedup_minhash_lsh",
    "dedup_minhash_incremental",
    "doc_repetition",
    "ann_bruteforce_topk",
    "embedding_near_dups",
]

if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "queries"
    if mode == "queries":
        names = sys.argv[2:] or DEFAULT_QUERIES
        print(json.dumps({"queries": time_queries(names), "sf": SF_DIR}))
    elif mode == "encode":
        policy = sys.argv[2] if len(sys.argv) > 2 else "auto"
        cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 16
        mo = len(sys.argv) > 4 and sys.argv[4] == "map_only"
        print(json.dumps(time_encode(policy, cpus, mo)))
