"""CLI driver for the encode engine -- the spark-submit equivalent of the
reference's apps/parquet2cql/main.cc (CLI: --file --table --pk -> stdout
CQL) plus the write-path the reference exposes only as a library.

Usage (also runnable via spark-submit --py-files for cluster deployment):

  python tools/p4s_cli.py encode  --input DIR --output DIR [--policy auto]
                                  [--columns a,b,c] [--salt-col repo]
                                  [--layout by-column] (Hive-partition the
                                  store by column: single-column decodes
                                  and lookups touch only that column's
                                  files; decode/lookup auto-detect it)
  python tools/p4s_cli.py decode  --input DIR --output DIR --columns a,b,c
  python tools/p4s_cli.py verify  --source DIR --encoded DIR --columns a,b,c
  python tools/p4s_cli.py metrics --encoded DIR
  python tools/p4s_cli.py lookup  --encoded DIR --column k --values v1,v2
                                  [--type int] (stats+bloom chunk pruning,
                                  decode only surviving chunks)
  python tools/p4s_cli.py dump-cql --encoded DIR --table t --pk row_id
                                  --columns a,b,c [--limit 20]

dump-cql decodes the pages table and renders CREATE TABLE + INSERT
statements like the reference's cql_reader (cql_reader.cc:239-400 schema,
:150-222 row rendering) -- scoped to the flat column types our engine
stores.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _spark(args):
    from parquet4seastar_spark.engine.session import get_spark

    spark = get_spark(app_name="p4s-cli", master=args.master)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


_CQL_TYPES = {
    "string": "text",
    "binary": "blob",
    "flba": "blob",
    "int32": "int",
    "int64": "bigint",
    "float": "float",
    "double": "double",
    "bool": "boolean",
    "timestamp_us": "timestamp",
    "date": "date",
}


def _cql_type(logical: str) -> str:
    """logical -> CQL type, incl. nested lists and decimals
    (cql_reader.cc:325-400 renders the same shapes)."""
    if logical.startswith("list<") and logical.endswith(">"):
        return f"list<{_cql_type(logical[5:-1])}>"
    if logical.startswith("decimal("):
        return "decimal"
    return _CQL_TYPES[logical]


def _cql_value(v, logical: str) -> str:
    if v is None:
        return "null"
    if logical.startswith("list<"):
        inner = logical[5:-1]
        return "[" + ", ".join(_cql_value(x, inner) for x in v) + "]"
    if logical in ("string",):
        return "'" + str(v).replace("'", "''") + "'"
    if logical in ("binary", "flba"):
        return "0x" + bytes(v).hex()
    if logical == "timestamp_us":
        return "'" + v.isoformat() + "'"
    if logical == "bool":
        return "true" if v else "false"
    return str(v)


def cmd_encode(args):
    import pyspark.sql.functions as F

    from parquet4seastar_spark.engine.encode_job import encode_table

    spark = _spark(args)
    df = spark.read.parquet(args.input)
    if "row_id" not in df.columns:
        df = df.withColumn("row_id", F.xxhash64(*df.columns))
    columns = args.columns.split(",") if args.columns else None
    resume = None
    if args.resume_from:
        resume = spark.read.parquet(args.resume_from)
    enc = encode_table(
        df, columns=columns, policy=args.policy, salt_col=args.salt_col,
        resume_lineage=resume, compression=args.compression,
    )
    if args.layout == "by-column":
        # column-partitioned store: a single-column decode or bloom lookup
        # later touches only that column's directory (engine/store.py)
        from parquet4seastar_spark.engine.store import write_store

        write_store(enc, args.output, mode=args.mode)
    else:
        enc.write.mode(args.mode).parquet(args.output)
    n = spark.read.parquet(args.output).filter(F.col("kind") == "chunk").count()
    print(f"wrote {args.output}: {n} chunks")
    spark.stop()


def cmd_decode(args):
    from parquet4seastar_spark.engine.decode_job import decode_table
    from parquet4seastar_spark.engine.store import is_column_store, read_store

    spark = _spark(args)
    cols = args.columns.split(",")
    if is_column_store(args.input):
        # driver-side directory pruning: other columns' files never listed
        enc = read_store(spark, args.input, cols)
    else:
        enc = spark.read.parquet(args.input)
    out = decode_table(enc, cols)
    out.write.mode(args.mode).parquet(args.output)
    print(f"wrote {args.output}: {spark.read.parquet(args.output).count()} rows")
    spark.stop()


def cmd_verify(args):
    import pyspark.sql.functions as F

    from parquet4seastar_spark.engine.verify import roundtrip_verify, roundtrip_verify_fast

    spark = _spark(args)
    source = spark.read.parquet(args.source)
    if "row_id" not in source.columns:
        # same synthesis as cmd_encode, so the ids line up deterministically
        source = source.withColumn("row_id", F.xxhash64(*source.columns))
    encoded = spark.read.parquet(args.encoded)
    cols = args.columns.split(",")
    if args.fast:
        # shuffle-free per-part_key commutative hashes (the 100 TB path);
        # the row-level join stays the default for pinpointing divergences
        rows = roundtrip_verify_fast(source, encoded, cols, salt_col=args.salt_col).collect()
        bad = [r for r in rows if not r["match"]]
        print({"part_keys": len(rows), "mismatched": len(bad)})
        for r in bad[:20]:
            print(dict(r.asDict()))
    else:
        res = roundtrip_verify(source, encoded, cols).collect()[0]
        print(dict(res.asDict()))
        bad = sum(v for k, v in res.asDict().items() if k.endswith("_mismatches"))
    spark.stop()
    sys.exit(1 if bad else 0)


def cmd_metrics(args):
    from parquet4seastar_spark.engine.verify import metrics_summary

    spark = _spark(args)
    metrics_summary(spark.read.parquet(args.encoded)).show(100, truncate=False)
    spark.stop()


def cmd_lookup(args):
    """Point lookup over a stored pages table: stats+bloom chunk pruning
    (min/max alone cannot prune an equality literal on unsorted data; the
    per-chunk blooms prove absence) -> decode only surviving chunks ->
    exact filter.  The 100 TB shape: touch one chunk, not every chunk."""
    import pyspark.sql.functions as F

    from parquet4seastar_spark.engine.decode_job import decode_table, prune_chunks
    from parquet4seastar_spark.engine.store import is_column_store, read_store

    spark = _spark(args)
    if is_column_store(args.encoded):
        # column-partitioned store: the lookup lists only the probed
        # column's directory (plus row_id) — the text payload of every
        # other column is never opened
        enc = read_store(spark, args.encoded, [args.column]).persist()
    else:
        enc = spark.read.parquet(args.encoded).persist()
    values = args.values.split(",")
    if args.type == "int":
        values = [int(v) for v in values]
    col = args.column
    total = enc.filter((F.col("kind") == "chunk") & (F.col("column") == col)).count()
    pruned = (
        prune_chunks(enc, col, isin=values)
        if len(values) > 1
        else prune_chunks(enc, col, eq=values[0])
    ).persist()
    kept = pruned.filter((F.col("kind") == "chunk") & (F.col("column") == col)).count()
    if kept == 0:
        print({"chunks_total": total, "chunks_decoded": 0, "rows": 0})
    else:
        rows = (
            decode_table(pruned, [col])
            .filter(F.col(col).isin(*values))
            .collect()
        )
        print({"chunks_total": total, "chunks_decoded": kept, "rows": len(rows)})
        for r in rows[: args.limit]:
            print(dict(r.asDict()))
    spark.stop()


def cmd_dump_cql(args):
    from parquet4seastar_spark.engine.decode_job import decode_table

    spark = _spark(args)
    enc = spark.read.parquet(args.encoded)
    columns = args.columns.split(",")
    import pyspark.sql.functions as F

    # logical types live on the tiny kind='chunk' lineage rows -- no need to
    # scan the page rows for schema discovery
    logicals = {
        r["column"]: r["logical"]
        for r in enc.filter(F.col("kind") == "chunk").select("column", "logical").distinct().collect()
    }
    cols = ["row_id", *columns]
    ddl_cols = ", ".join(f"{c} {_cql_type(logicals[c])}" for c in cols)
    print(f"CREATE TABLE {args.table} ({ddl_cols}, PRIMARY KEY ({args.pk}));")
    rows = decode_table(enc, columns).orderBy("row_id").limit(args.limit).collect()
    for r in rows:
        vals = [_cql_value(r[c], logicals[c]) for c in cols]
        print(f"INSERT INTO {args.table} ({', '.join(cols)}) VALUES ({', '.join(vals)});")
    spark.stop()


def main():
    ap = argparse.ArgumentParser(prog="p4s_cli")
    ap.add_argument("--master", default=None)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("encode")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--policy", default="auto")
    p.add_argument("--compression", default="gzip",
                   choices=["uncompressed", "snappy", "gzip"],
                   help="page compression; gzip is the deployment default: "
                        "1.7x smaller stores (ratio 0.2545 vs 0.4245) for "
                        "~1/3 the encode throughput (105.8 vs 155.9 MB/s "
                        "at local[16]) -- storage-bound deployments keep "
                        "it, throughput-bound ones pass uncompressed")
    p.add_argument("--columns", default=None)
    p.add_argument("--salt-col", default="repo")
    p.add_argument("--resume-from", default=None)
    p.add_argument("--mode", default="overwrite")
    p.add_argument("--layout", default="flat", choices=["flat", "by-column"],
                   help="by-column: Hive-partition the store by column so "
                        "single-column decodes/lookups touch only that "
                        "column's files (driver-side dir resolution and "
                        "auto-detect need a driver-visible filesystem; on "
                        "HDFS/S3 readers fall back to Catalyst partition "
                        "pruning -- see engine/store.py)")
    p.set_defaults(fn=cmd_encode)

    p = sub.add_parser("decode")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--columns", required=True)
    p.add_argument("--mode", default="overwrite")
    p.set_defaults(fn=cmd_decode)

    p = sub.add_parser("verify")
    p.add_argument("--source", required=True)
    p.add_argument("--encoded", required=True)
    p.add_argument("--columns", required=True)
    p.add_argument("--fast", action="store_true",
                   help="shuffle-free per-part_key hash verify (100 TB path)")
    p.add_argument("--salt-col", default="repo")
    p.set_defaults(fn=cmd_verify)

    p = sub.add_parser("metrics")
    p.add_argument("--encoded", required=True)
    p.set_defaults(fn=cmd_metrics)

    p = sub.add_parser("lookup")
    p.add_argument("--encoded", required=True)
    p.add_argument("--column", required=True)
    p.add_argument("--values", required=True, help="comma-separated literals")
    p.add_argument("--type", default="str", choices=["str", "int"])
    p.add_argument("--limit", type=int, default=20)
    p.set_defaults(fn=cmd_lookup)

    p = sub.add_parser("dump-cql")
    p.add_argument("--encoded", required=True)
    p.add_argument("--table", required=True)
    p.add_argument("--pk", default="row_id")
    p.add_argument("--columns", required=True)
    p.add_argument("--limit", type=int, default=20)
    p.set_defaults(fn=cmd_dump_cql)

    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
