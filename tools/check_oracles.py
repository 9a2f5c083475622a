"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same sf dir, compare
row counts, schemas (column names), and order-insensitive value hashes.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

import __spark_entry__ as entrymod
from parquet4seastar_spark.engine.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> tuple[int, list[str], str]:
    cols = sorted(df.columns)
    df = df[cols]
    # Mirror the driver's canonicalizer failure modes: it sort_values() the
    # raw frame, which raises on unhashable cells (list/ndarray) and mangles
    # bytes. Reject those up front so a query that would fail the driver
    # fails here too (r02 shipped roundtrip_embeddings red because this
    # replica silently str()-ed list cells). Project to scalars/hex/strings
    # in the query instead.
    for c in cols:
        s = df[c]
        if s.dtype == object and len(s):
            v = s.iloc[0]
            if isinstance(v, (list, tuple, dict, bytes, bytearray)) or hasattr(v, "__array__"):
                raise TypeError(
                    f"column {c!r} holds {type(v).__name__} cells; the driver's "
                    "pandas canonicalizer cannot sort/hash these — project to "
                    "scalar rows (posexplode), hex, or strings in the query"
                )
    if len(df):
        df = df.sort_values(by=cols, kind="mergesort")
    rows = df.astype(str).values.tolist()
    rows.sort()
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return len(df), cols, h.hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e)[:200]}")
            failures += 1
            continue
        elapsed = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (no oracle) [{elapsed:.1f}s]")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e)[:200]}")
            failures += 1
            continue
        try:
            sn, sc, sh = canon(sdf)
            on, oc, oh = canon(odf)
        except TypeError as e:
            print(f"FAIL  {name}: canonicalizer: {str(e)[:200]}")
            failures += 1
            continue
        status = "OK   " if (sn, sc, sh) == (on, oc, oh) else "FAIL "
        if status.startswith("FAIL"):
            failures += 1
        print(f"{status} {name}: spark({sn},{sh}) duck({on},{oh}) cols={'OK' if sc == oc else (sc, oc)} [{elapsed:.1f}s]")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
