"""Distributed engine tests: generator determinism, salted repartition,
encode -> decode round trip on the source-repo table, lineage resume.

These mirror the reference's end-to-end tier (SURVEY.md §5 tier 3) with the
north-rule table shape (repo, path, commit, lang, content)."""

import pyspark.sql.functions as F
import pytest

from parquet4seastar_spark.engine.encode_job import encode_table, salted_repartition
from parquet4seastar_spark.engine.generator import generate_source_repos


def test_audit_lineage_detects_corruption(spark):
    import pyspark.sql.functions as F

    from parquet4seastar_spark.engine.encode_job import encode_table
    from parquet4seastar_spark.engine.verify import audit_lineage

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        F.col("doc_id").alias("row_id"), "text", "n_chars", "source"
    )
    enc = encode_table(
        docs, columns=["text", "n_chars"], policy="plain", salt_col="source",
        num_partitions=2, salt_target_rows=2000,
    ).cache()
    clean = audit_lineage(enc)
    assert clean.filter(~F.col("ok")).count() == 0
    assert clean.count() > 0
    # flip one byte inside a PLAIN data page payload: decode still succeeds
    # but the recomputed content sha must diverge from the lineage
    import pandas as pd

    pdf = enc.toPandas()
    target = pdf[(pdf["kind"] == "page") & (pdf["column"] == "n_chars")].index[0]
    blob = bytearray(pdf.at[target, "data"])
    blob[-1] ^= 0xFF
    pdf.at[target, "data"] = bytes(blob)
    corrupted = spark.createDataFrame(pdf, schema=enc.schema)
    bad = audit_lineage(corrupted).filter(~F.col("ok"))
    assert bad.count() >= 1
    assert {r["column"] for r in bad.collect()} == {"n_chars"}
    enc.unpersist()


def test_encode_table_rejects_reserved_column_names(spark):
    # top-level column names ride the dot-joined leaf scheme too: 'a.b'
    # would silently reassemble as struct a{b} on decode (review finding)
    df = spark.createDataFrame([(1, "x")], ["row_id", "a.b"])
    with pytest.raises(ValueError, match="reserved"):
        encode_table(df, columns=["a.b"], salt_col="row_id", num_partitions=1)


def test_audit_lineage_list_of_lists(spark):
    """round-2 gap (ADVICE): the list<list> chunk sha hashed only structure,
    never element values, and chunk_content_sha could not flatten two
    repetition levels — audit over a list<list> column either crashed or
    could not detect value corruption even in principle."""
    import pyspark.sql.functions as F

    from parquet4seastar_spark.engine.encode_job import encode_table
    from parquet4seastar_spark.engine.verify import audit_lineage

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        F.col("doc_id").alias("row_id"),
        F.transform(
            F.split("text", r"\. "), lambda s: F.split(F.trim(s), r"\s+")
        ).alias("sents"),
        "source",
    )
    enc = encode_table(
        docs, columns=["sents"], policy="plain", salt_col="source",
        num_partitions=2, salt_target_rows=2000,
    ).cache()
    clean = audit_lineage(enc)
    assert clean.filter(~F.col("ok")).count() == 0
    assert clean.count() > 0
    # corrupt one byte mid-payload of a PLAIN data page: recomputed sha must
    # diverge (the list2 sha now covers the value bytes)
    pdf = enc.toPandas()
    # list<list> columns are dremel leaf chunks ('sents#g0')
    pages = pdf[(pdf["kind"] == "page") & (pdf["column"].str.startswith("sents"))]
    target = max(pages.index, key=lambda i: len(pdf.at[i, "data"]))
    blob = bytearray(pdf.at[target, "data"])
    blob[len(blob) // 2] ^= 0x55
    pdf.at[target, "data"] = bytes(blob)
    corrupted = spark.createDataFrame(pdf, schema=enc.schema)
    bad = audit_lineage(corrupted).filter(~F.col("ok"))
    assert bad.count() >= 1
    enc.unpersist()


def test_list2_sha_covers_values():
    import pyarrow as pa

    from parquet4seastar_spark.codecs.pages import chunk_content_sha, decode_chunk, encode_chunk

    t = pa.list_(pa.list_(pa.int64()))
    a = pa.array([[[1, 2], [3]], None, [[], [4, None]], [], [[5]]], type=t)
    b = pa.array([[[1, 2], [3]], None, [[], [9, None]], [], [[5]]], type=t)  # one value differs
    ca, cb = encode_chunk(a, policy="plain"), encode_chunk(b, policy="plain")
    assert ca.sha256 != cb.sha256
    assert chunk_content_sha(decode_chunk(ca)) == ca.sha256
    assert chunk_content_sha(decode_chunk(cb)) == cb.sha256


def test_export_parquet_files_spark_reads(spark, tmp_path):
    """The export sink writes standard .parquet per chunk group; Spark's own
    parquet reader (a fully independent implementation) reads it back."""
    import pyspark.sql.functions as F

    from parquet4seastar_spark.engine.encode_job import encode_table
    from parquet4seastar_spark.engine.export import export_parquet_files

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        F.col("doc_id").alias("row_id"), "text", "lang", "n_chars", "source"
    )
    enc = encode_table(
        docs, columns=["text", "lang", "n_chars"], policy="auto_fast",
        salt_col="source", num_partitions=2, salt_target_rows=2000,
    )
    out_dir = str(tmp_path / "export")
    manifest = export_parquet_files(enc, ["text", "lang", "n_chars"], out_dir).collect()
    assert sum(r["num_rows"] for r in manifest) == docs.count()
    back = spark.read.parquet(out_dir)
    assert back.count() == docs.count()
    j = docs.join(
        back.select(
            "row_id",
            F.col("text").alias("t2"),
            F.col("lang").alias("l2"),
            F.col("n_chars").alias("n2"),
        ),
        "row_id",
    )
    bad = j.filter(
        ~F.col("text").eqNullSafe(F.col("t2"))
        | ~F.col("lang").eqNullSafe(F.col("l2"))
        | ~F.col("n_chars").eqNullSafe(F.col("n2"))
    )
    assert bad.count() == 0 and j.count() == docs.count()


def test_map_only_encode_no_value_shuffle(spark):
    """map_only encodes each scan split in place: the plan contains NO
    exchange at all (the full-corpus value shuffle is gone), decoded
    values are identical to the salted layout's, and the ratio is within
    ~1% (codecs adapt per chunk regardless of grouping)."""
    import pyspark.sql.functions as F

    from parquet4seastar_spark.engine.decode_job import decode_table

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        F.col("doc_id").alias("row_id"), "text", "source"
    )
    enc = encode_table(docs, columns=["text"], map_only=True)
    plan = enc._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    enc = enc.persist()
    got = {r["row_id"]: r["text"] for r in decode_table(enc, ["text"]).collect()}
    exp = {r["row_id"]: r["text"] for r in docs.collect()}
    assert got == exp
    pks = {r["part_key"] for r in enc.select("part_key").distinct().collect()}
    assert all(p.startswith("m") for p in pks)
    # ratio parity vs the salted layout
    def ratio(e):
        r = e.filter(F.col("kind") == "chunk").agg(
            F.sum("input_bytes").alias("i"), F.sum("compressed_size").alias("c")
        ).collect()[0]
        return r["c"] / r["i"]
    salted = encode_table(
        docs, columns=["text"], salt_col="source", salt_target_rows=2000,
        num_partitions=4,
    )
    # at this toy scale map_only packs ONE chunk vs the salted 20, so its
    # per-chunk tables amortize better — it must never be meaningfully
    # WORSE than salted (codecs adapt per chunk regardless of grouping)
    assert ratio(enc) <= ratio(salted) + 0.02
    enc.unpersist()
    with pytest.raises(ValueError, match="map_only"):
        encode_table(docs, columns=["text"], map_only=True, cluster_by="text")
    with pytest.raises(ValueError, match="resume"):
        encode_table(docs, columns=["text"], map_only=True, resume_lineage=salted)


def test_null_salt_keys_are_not_dropped(spark):
    """Rows with a NULL salt value must survive the per-key sizes join
    (an equi-join on the raw column silently drops null keys) and verify
    end-to-end under the fast path."""
    from parquet4seastar_spark.engine.decode_job import decode_table
    from parquet4seastar_spark.engine.verify import roundtrip_verify_fast

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        F.col("doc_id").alias("row_id"),
        "n_chars",
        F.when(F.col("doc_id") % 5 == 0, F.lit(None)).otherwise(F.col("source")).alias("source"),
    )
    n_null = docs.filter(F.col("source").isNull()).count()
    assert n_null > 0
    enc = encode_table(
        docs, columns=["n_chars"], salt_col="source", num_partitions=4,
        salt_target_rows=2000,
    ).persist()
    dec = decode_table(enc, ["n_chars"])
    assert dec.count() == docs.count()  # null-keyed rows encoded too
    res = roundtrip_verify_fast(docs, enc, ["n_chars"], salt_col="source")
    rows = res.collect()
    assert rows and all(r["match"] for r in rows)
    # the null group verifies as its own part keys, and its row count is
    # accounted (a lossy join on both sides would also 'match')
    assert sum(r["rows_src"] for r in rows) == docs.count()
    enc.unpersist()


def test_cluster_by_makes_stats_pruning_effective(spark):
    """cluster_by range-partitions AND sorts within partitions, so chunk
    min/max ranges are narrow and a range predicate prunes most chunks —
    the layout knob that makes stats pruning win by construction.  The
    same predicate on a hash-salted layout prunes (almost) nothing, and
    decoded values are identical either way."""
    from parquet4seastar_spark.engine.decode_job import decode_table, prune_chunks

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        F.col("doc_id").alias("row_id"), "n_chars", "source"
    )

    def kept(enc, **pred):
        enc = enc.persist()
        total = enc.filter((F.col("kind") == "chunk") & (F.col("column") == "n_chars")).count()
        pruned = prune_chunks(enc, "n_chars", **pred)
        k = pruned.filter((F.col("kind") == "chunk") & (F.col("column") == "n_chars")).count()
        rows = sorted(
            (r["row_id"], r["n_chars"])
            for r in decode_table(pruned, ["n_chars"])
            .filter(F.col("n_chars") > 520).collect()
        )
        enc.unpersist()
        return total, k, rows

    clustered = encode_table(
        docs, columns=["n_chars"], cluster_by="n_chars", num_partitions=8,
        chunk_target_bytes=1 << 12, page_target_bytes=1 << 10,
    )
    t_c, k_c, rows_c = kept(clustered, gt=520)
    hashed = encode_table(
        docs, columns=["n_chars"], salt_col="source", num_partitions=8,
        salt_target_rows=100, chunk_target_bytes=1 << 12,
        page_target_bytes=1 << 10,
    )
    t_h, k_h, rows_h = kept(hashed, gt=520)
    exp = sorted(
        (r["row_id"], r["n_chars"])
        for r in docs.filter(F.col("n_chars") > 520).collect()
    )
    assert rows_c == exp and rows_h == exp
    assert k_c <= t_c // 2, (k_c, t_c)  # clustered: most chunks pruned
    assert k_h > t_h // 2, (k_h, t_h)  # hash-salted: pruning can't help
    # part keys are range-bucket ids, one per partition
    pks = {r["part_key"] for r in clustered.select("part_key").distinct().collect()}
    assert pks <= {f"r{i}" for i in range(8)}
    # range boundaries are not stable across runs: resume is refused, and
    # the salted-layout fast verify fails fast instead of reporting a
    # spurious whole-table mismatch
    from parquet4seastar_spark.engine.verify import roundtrip_verify_fast

    with pytest.raises(ValueError, match="cluster_by"):
        encode_table(
            docs, columns=["n_chars"], cluster_by="n_chars",
            resume_lineage=clustered,
        )
    with pytest.raises(ValueError, match="row-level"):
        roundtrip_verify_fast(docs, clustered, ["n_chars"], salt_col="source")


def test_column_partitioned_store(spark, tmp_path):
    """Column-partitioned pages layout (engine/store.py): a single-column
    decode touches only that column's partition directories.

    - read_store path: inputFiles provably contains no text files;
    - plain spark.read.parquet path: Catalyst prunes the same directories
      (decode_table's column name filter is a partition predicate — the
      scan's PartitionFilters show it);
    - nested columns: '#g' dremel leaf names round-trip through Spark's
      partition-path escaping (column=meta%23g0)."""
    import os
    import re

    from parquet4seastar_spark.engine.decode_job import decode_table
    from parquet4seastar_spark.engine.store import (
        is_column_store,
        read_store,
        store_column_dirs,
        write_store,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        F.col("doc_id").alias("row_id"), "text", "lang", "source",
        F.struct("n_chars", "lang").alias("meta"),
    )
    enc = encode_table(
        docs, columns=["text", "lang", "meta"], salt_col="source",
        num_partitions=4, salt_target_rows=2000,
    )
    store = str(tmp_path / "store")
    write_store(enc, store)
    assert is_column_store(store)
    dirs = sorted(os.path.basename(d) for d in os.listdir(store) if d.startswith("column="))
    assert "column=text" in dirs and "column=meta%23g0" in dirs

    sub = read_store(spark, store, ["lang"])
    files = set(sub.inputFiles())
    assert files and not any("column=text" in f for f in files), files
    got = {r["row_id"]: r["lang"] for r in decode_table(sub, ["lang"]).collect()}
    exp = {r["row_id"]: r["lang"] for r in docs.select("row_id", "lang").collect()}
    assert got == exp

    # nested: both dremel leaf dirs resolve for the logical column name,
    # and the struct reassembles from only those partitions
    meta_dirs = {os.path.basename(d) for d in store_column_dirs(store, ["meta"])}
    assert meta_dirs == {"column=meta%23g0", "column=meta%23g1", "column=row_id"}
    sub_meta = read_store(spark, store, ["meta"])
    assert not any("column=text" in f for f in sub_meta.inputFiles())
    m = decode_table(sub_meta, ["meta"]).filter(F.col("row_id") == 3).collect()[0]
    src = docs.filter(F.col("row_id") == 3).collect()[0]
    assert m["meta"]["n_chars"] == src["meta"]["n_chars"]
    assert m["meta"]["lang"] == src["meta"]["lang"]

    # plain-read path: directory pruning via Catalyst partition filters
    d = decode_table(spark.read.parquet(store), ["lang"])
    plan = d._jdf.queryExecution().executedPlan().toString()
    assert re.search(
        r"PartitionFilters: \[\(column#\d+ IN \(row_id,lang\)", plan
    ), plan


def test_chunk_stats_pruning(spark):
    import pyspark.sql.functions as F

    from parquet4seastar_spark.engine.decode_job import decode_table, prune_chunks
    from parquet4seastar_spark.engine.encode_job import encode_table

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # cluster chunks by value range so stats have pruning power
    src = docs.select(
        F.col("doc_id").alias("row_id"),
        "n_chars",
        F.floor(F.col("n_chars") / 200).cast("string").alias("bucket"),
    )
    enc = encode_table(
        src, columns=["n_chars"], salt_col="bucket", num_partitions=4,
        salt_target_rows=1000, size_col="bucket",
    ).cache()
    thr = 400
    pruned = prune_chunks(enc, "n_chars", gt=thr)
    assert pruned.count() < enc.count()  # chunks actually skipped
    got = decode_table(pruned, ["n_chars"]).filter(F.col("n_chars") > thr)
    exp = src.filter(F.col("n_chars") > thr)
    assert got.count() == exp.count()
    j = got.join(exp.select("row_id", F.col("n_chars").alias("e")), "row_id")
    assert j.filter(F.col("n_chars") != F.col("e")).count() == 0
    # string stats: equality prune on a low-cardinality clustered column
    src2 = docs.select(F.col("doc_id").alias("row_id"), "lang")
    enc2 = encode_table(
        src2, columns=["lang"], salt_col="lang", num_partitions=4,
        salt_target_rows=1000, size_col="lang",
    ).cache()
    pruned2 = prune_chunks(enc2, "lang", eq="en")
    assert pruned2.count() < enc2.count()
    got2 = decode_table(pruned2, ["lang"]).filter(F.col("lang") == "en")
    assert got2.count() == docs.filter(F.col("lang") == "en").count()
    # fail-safe: an absent/typo'd column has an empty drop set -> prunes
    # NOTHING (and decode_table still raises on a truly missing column)
    assert prune_chunks(enc2, "no_such_column", gt=0).count() == enc2.count()
    enc.unpersist()
    enc2.unpersist()


def test_engine_array_column_roundtrip(spark):
    import pyspark.sql.functions as F

    from parquet4seastar_spark.engine.decode_job import decode_table
    from parquet4seastar_spark.engine.encode_job import encode_table

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        F.col("vec_id").alias("row_id"), "embedding", "label"
    )
    enc = encode_table(
        emb, columns=["embedding", "label"], policy="auto", salt_col="label",
        num_partitions=2, salt_target_rows=200, page_target_bytes=8 << 10,
    )
    dec = decode_table(enc, ["embedding", "label"])
    joined = emb.join(
        dec.withColumnRenamed("embedding", "e2").withColumnRenamed("label", "l2"), "row_id"
    )
    assert joined.count() == emb.count()
    bad = joined.filter(
        ~F.col("embedding").eqNullSafe(F.col("e2")) | ~F.col("label").eqNullSafe(F.col("l2"))
    )
    assert bad.count() == 0
from parquet4seastar_spark.engine.verify import lineage_table, metrics_summary, roundtrip_verify

N_ROWS = 600


@pytest.fixture(scope="module")
def source(spark):
    df = generate_source_repos(spark, N_ROWS, n_repos=25, seed=42).cache()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def encoded(spark, source):
    enc = encode_table(
        source, policy="auto", num_partitions=4, page_target_bytes=64 << 10, chunk_target_bytes=1 << 20
    ).cache()
    enc.count()
    yield enc
    enc.unpersist()


def test_generator_deterministic(spark):
    a = generate_source_repos(spark, 100, n_repos=10, seed=7, partitions=2).orderBy("row_id").collect()
    b = generate_source_repos(spark, 100, n_repos=10, seed=7, partitions=5).orderBy("row_id").collect()
    assert a == b  # identical at any parallelism


def test_generator_shape(source):
    assert source.columns == ["row_id", "repo", "path", "commit", "lang", "content"]
    assert source.count() == N_ROWS
    # nullable lang/content present
    assert source.filter(F.col("lang").isNull()).count() > 0
    # zipf skew: top repo much bigger than median
    sizes = source.groupBy("repo").count().orderBy(F.desc("count")).collect()
    assert sizes[0]["count"] >= 5 * sizes[len(sizes) // 2]["count"]


def test_salted_repartition_splits_jumbo(spark, source):
    salted = salted_repartition(source, 4, salt_target_bytes=64 << 10)
    per_key = salted.groupBy("part_key").agg(F.sum(F.octet_length("content")).alias("b"))
    rows = per_key.collect()
    # jumbo repos are split: several part_keys for the biggest repo
    keys = [r["part_key"] for r in rows]
    repos = {k.rsplit("#", 1)[0] for k in keys}
    assert len(keys) > len(repos)


def test_roundtrip_all_columns(source, encoded):
    res = roundtrip_verify(source, encoded, ["repo", "path", "commit", "lang", "content"]).collect()[0]
    assert res["rows"] == N_ROWS
    for c in ["repo", "path", "commit", "lang", "content"]:
        assert res[f"{c}_mismatches"] == 0, c


def test_metrics_and_compression(source, encoded):
    m = {r["column"]: r for r in metrics_summary(encoded).collect()}
    assert set(m) == {"row_id", "repo", "path", "commit", "lang", "content"}
    # auto-selection must compress every column vs PLAIN on this table
    assert m["repo"]["ratio"] < 0.3  # low cardinality -> dict
    assert m["row_id"]["ratio"] < 0.5  # sequential ints -> DBP
    assert m["content"]["ratio"] < 0.9
    chunks = lineage_table(encoded)
    assert chunks.filter(F.col("sha256").isNull()).count() == 0


def test_resume_skips_completed(spark, source):
    enc1 = encode_table(source, num_partitions=4, chunk_target_bytes=1 << 20)
    lineage = enc1.filter(F.col("kind") == "chunk").cache()
    all_keys = {r["part_key"] for r in lineage.select("part_key").distinct().collect()}
    # simulate a partial run: lineage only for half the part_keys
    done_keys = sorted(all_keys)[: len(all_keys) // 2]
    partial = lineage.filter(F.col("part_key").isin(done_keys))
    enc2 = encode_table(source, num_partitions=4, chunk_target_bytes=1 << 20, resume_lineage=partial)
    remaining = {r["part_key"] for r in enc2.select("part_key").distinct().collect()}
    assert remaining == all_keys - set(done_keys)
    lineage.unpersist()


def test_reference_policy_not_smaller_than_auto(spark, source):
    enc_auto = encode_table(source, policy="auto", num_partitions=4)
    enc_ref = encode_table(source, policy="reference", num_partitions=4)
    a = {r["column"]: r["encoded_bytes"] for r in metrics_summary(enc_auto).collect()}
    r = {r["column"]: r["encoded_bytes"] for r in metrics_summary(enc_ref).collect()}
    for col in ["repo", "path", "commit", "lang", "content"]:
        assert a[col] <= r[col], col


def test_engine_gzip_compression(spark, source):
    enc = encode_table(
        source, columns=["content"], num_partitions=2, compression="gzip"
    )
    res = roundtrip_verify(source, enc, ["content"]).collect()[0]
    assert res["content_mismatches"] == 0
    chunks = enc.filter(F.col("kind") == "chunk").filter(F.col("column") == "content")
    row = chunks.agg(F.sum("uncompressed_size").alias("u"), F.sum("compressed_size").alias("c")).collect()[0]
    assert row["c"] < row["u"]  # gzip layer actually compresses


def test_encode_table_rejects_no_columns(spark):
    import pytest as _pytest

    df = spark.range(3).withColumnRenamed("id", "row_id").withColumn("x", F.lit("a"))
    with _pytest.raises(Exception, match="no encodable columns"):
        encode_table(df.select("row_id"), columns=None)


def test_export_parquet_files_nested_columns(spark, tmp_path):
    """Distributed export of NESTED columns (dremel leaf chunks wrapped in
    DremelColumn): Spark's own parquet reader gets the values back."""
    import pyspark.sql.functions as F

    from parquet4seastar_spark.engine.encode_job import encode_table
    from parquet4seastar_spark.engine.export import export_parquet_files

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        F.col("doc_id").alias("row_id"),
        F.struct("lang", "n_chars").alias("meta"),
        F.transform(
            F.split("text", r"\. "), lambda s: F.split(F.trim(s), r"\s+")
        ).alias("sents"),
        "n_chars",
        "source",
    )
    enc = encode_table(
        docs, columns=["meta", "sents", "n_chars"], policy="auto_fast",
        salt_col="source", num_partitions=2, salt_target_rows=2000,
    )
    out = str(tmp_path / "out")
    export_parquet_files(enc, ["meta", "sents", "n_chars"], out).count()
    back = spark.read.parquet(out)
    src = docs.select(
        "row_id",
        F.col("meta.lang").alias("lang"),
        F.col("meta.n_chars").alias("mn"),
        F.array_join(F.transform("sents", lambda x: F.array_join(x, ",")), "|").alias("canon"),
        "n_chars",
    )
    got = back.select(
        "row_id",
        F.col("meta.lang").alias("lang"),
        F.col("meta.n_chars").alias("mn"),
        F.array_join(F.transform("sents", lambda x: F.array_join(x, ",")), "|").alias("canon"),
        "n_chars",
    )
    assert got.count() == src.count()
    assert src.exceptAll(got).count() == 0 and got.exceptAll(src).count() == 0


def test_decode_nested_field_names_with_spaces(spark):
    """Nested field names that aren't plain identifiers survive the decode
    schema hand-off (the output schema is a real StructType, never a DDL
    string that would need backtick escaping)."""
    import pyspark.sql.functions as F

    from parquet4seastar_spark.engine.decode_job import decode_table

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        F.col("doc_id").alias("row_id"),
        F.struct(
            F.col("lang").alias("my lang"), F.col("n_chars").alias("char-count")
        ).alias("meta"),
        "source",
    )
    enc = encode_table(
        docs, columns=["meta"], policy="plain", salt_col="source",
        num_partitions=2, salt_target_rows=2000,
    )
    dec = decode_table(enc, ["meta"])
    got = dec.select(
        "row_id",
        F.col("meta").getField("my lang").alias("l"),
        F.col("meta").getField("char-count").alias("n"),
    )
    src = docs.select("row_id", F.col("meta").getField("my lang").alias("l"),
                      F.col("meta").getField("char-count").alias("n"))
    assert got.exceptAll(src).count() == 0 and src.exceptAll(got).count() == 0


def test_roundtrip_verify_fast_no_row_shuffle(spark):
    """Shuffle-free verify (PLANS.md §2 stretch): per-part_key commutative
    hashes match on clean data, catch a corrupted page, and the physical
    plan contains NO exchange of the decoded row values — only the tiny
    partial-aggregate and final per-key joins."""
    import pyspark.sql.functions as F

    from parquet4seastar_spark.engine.encode_job import encode_table
    from parquet4seastar_spark.engine.verify import roundtrip_verify_fast

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        F.col("doc_id").alias("row_id"), "text", "n_chars", "source"
    )
    enc = encode_table(
        docs, columns=["text", "n_chars"], policy="plain", salt_col="source",
        num_partitions=2, salt_target_rows=2000,
    ).cache()
    out = roundtrip_verify_fast(docs, enc, ["text", "n_chars"], salt_col="source")
    rows = out.collect()
    assert rows and all(r["match"] for r in rows)
    assert sum(r["rows_src"] for r in rows) == docs.count()
    # plan: the decoded side aggregates in place -- no Exchange between the
    # decode (FlatMapGroupsIn*) and its partial aggregate
    plan = out._jdf.queryExecution().executedPlan().toString()
    # plans print parents above children: the segment between the decode's
    # partial HashAggregate (nearest above) and the FlatMapGroupsIn node
    # must carry no Exchange -- the page-grouping shuffle BELOW the decode
    # is decode's own and inherent
    pre = plan[: plan.index("FlatMapGroupsIn")]
    last_agg = pre.rindex("HashAggregate")
    assert "Exchange" not in pre[last_agg:], pre[last_agg:]
    # corruption detection: flip a byte in one text page
    pdf = enc.toPandas()
    target = pdf[(pdf["kind"] == "page") & (pdf["column"] == "text")].index[0]
    blob = bytearray(pdf.at[target, "data"])
    blob[len(blob) // 2] ^= 0x01
    pdf.at[target, "data"] = bytes(blob)
    corrupted = spark.createDataFrame(pdf, schema=enc.schema)
    bad = roundtrip_verify_fast(docs, corrupted, ["text", "n_chars"], salt_col="source")
    assert bad.filter(~F.col("match")).count() >= 1
    enc.unpersist()


def test_bloom_prunes_point_lookups_minmax_cannot(spark):
    """A literal INSIDE every chunk's [min, max] but present in none: range
    stats keep every chunk, the bloom drops them all; a present literal
    keeps exactly its chunks and decodes the right rows."""
    import pyspark.sql.functions as F

    from parquet4seastar_spark.engine.decode_job import decode_table, prune_chunks
    from parquet4seastar_spark.engine.encode_job import encode_table

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        F.col("doc_id").alias("row_id"),
        F.concat(F.lit("key-"), F.format_string("%04d", F.col("doc_id"))).alias("k"),
        "source",
    )
    enc = encode_table(
        docs, columns=["k"], policy="plain", salt_col="source", num_partitions=2,
    ).cache()
    chunks = enc.filter(F.col("kind") == "chunk").filter(F.col("column") == "k")
    n_chunks = chunks.count()
    assert chunks.filter(F.col("bloom").isNotNull()).count() == n_chunks

    # absent but inside the global range ('key-0000' < 'key-00x0' < 'key-0499')
    pruned_absent = prune_chunks(enc, "k", eq="key-00x0")
    kept = pruned_absent.filter(
        (F.col("kind") == "chunk") & (F.col("column") == "k")
    ).count()
    assert kept == 0  # min/max alone would keep every chunk

    # present literal: its chunk survives and decode returns exactly it
    pruned_present = prune_chunks(enc, "k", eq="key-0123").persist()
    assert pruned_present.filter(
        (F.col("kind") == "chunk") & (F.col("column") == "k")
    ).count() >= 1
    rows = (
        decode_table(pruned_present, ["k"])
        .filter(F.col("k") == "key-0123")
        .collect()
    )
    assert [r["row_id"] for r in rows] == [123]
    pruned_present.unpersist()

    # isin: batched point lookups — chunks survive iff ANY value may match
    all_absent = prune_chunks(enc, "k", isin=["key-00x0", "key-01x1"])
    assert all_absent.filter(
        (F.col("kind") == "chunk") & (F.col("column") == "k")
    ).count() == 0
    mixed = prune_chunks(enc, "k", isin=["key-00x0", "key-0123"]).persist()
    assert mixed.filter(
        (F.col("kind") == "chunk") & (F.col("column") == "k")
    ).count() >= 1
    got = decode_table(mixed, ["k"]).filter(F.col("k").isin("key-00x0", "key-0123")).collect()
    assert [r["row_id"] for r in got] == [123]
    mixed.unpersist()
    enc.unpersist()


def test_bloom_ignored_on_type_domain_mismatch(spark):
    """A literal hashed in a different domain than the chunk's physical
    values (str vs int column) must NOT consult the bloom — Spark's
    cast-equality could still match rows, so pruning must stay
    conservative (the chunk survives)."""
    import pyspark.sql.functions as F

    from parquet4seastar_spark.engine.decode_job import prune_chunks
    from parquet4seastar_spark.engine.encode_job import encode_table

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        F.col("doc_id").alias("row_id"), F.col("n_chars").alias("v"), "source"
    )
    enc = encode_table(
        docs, columns=["v"], policy="plain", salt_col="source", num_partitions=2
    ).cache()
    present_int = docs.select("v").first()["v"]
    n_chunks = enc.filter((F.col("kind") == "chunk") & (F.col("column") == "v")).count()
    # str literal against the INT64 column: bloom bits are in the int
    # domain; every chunk must survive (numeric stats vs a str literal are
    # also inapplicable), exactly the pre-bloom conservative behavior
    kept = prune_chunks(enc, "v", eq=str(present_int)).filter(
        (F.col("kind") == "chunk") & (F.col("column") == "v")
    ).count()
    assert kept == n_chunks
    enc.unpersist()


def test_decode_discovery_persists_only_computed_frames(spark, tmp_path):
    """Schema discovery persists the pages frame when it chains off a live
    encode plan (else the encode job runs twice: once for discovery, once
    for decode) but NOT when it reads from storage (the 100-TB shape,
    where the kind='chunk' filter pushes down to the scan)."""
    import pyspark.sql.functions as F

    from parquet4seastar_spark.engine.decode_job import decode_table
    from parquet4seastar_spark.engine.encode_job import encode_table

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        F.col("doc_id").alias("row_id"), "text", "source"
    )
    enc = encode_table(docs, columns=["text"], policy="plain", salt_col="source", num_partitions=2)
    assert decode_table(enc, ["text"]).count() == 500
    assert enc.storageLevel.useMemory or enc.storageLevel.useDisk
    enc.unpersist()

    stored_path = str(tmp_path / "enc_pages")
    enc.write.parquet(stored_path)
    stored = spark.read.parquet(stored_path)
    assert decode_table(stored, ["text"]).count() == 500
    assert not (stored.storageLevel.useMemory or stored.storageLevel.useDisk)


def test_verify_fast_empty_top_salt_bucket(spark):
    """A key whose HIGHEST salt bucket received zero rows must still verify
    clean: the bucket count is read from the recorded lineage, not inferred
    as max(observed salt)+1 (which would rehash every source row into a
    different part_key and report a spurious whole-table mismatch)."""
    import pyspark.sql.functions as F

    from parquet4seastar_spark.engine.encode_job import encode_table
    from parquet4seastar_spark.engine.verify import roundtrip_verify_fast

    # pick row_ids that never land in the top bucket of a 3-bucket salt
    # (buckets = ceil(9 rows / 4) = 3; keep ids with pmod(xxhash64) != 2)
    cand = (
        spark.range(400)
        .withColumn("b", F.pmod(F.xxhash64("id"), F.lit(3)))
        .filter(F.col("b") != 2)
        .limit(9)
        .collect()
    )
    ids = [r["id"] for r in cand]
    docs = spark.createDataFrame(
        [(i, "r1", f"text-{i}") for i in ids], "row_id long, repo string, content string"
    )
    enc = encode_table(
        docs, columns=["content"], policy="plain", num_partitions=2, salt_target_rows=4
    ).cache()
    chunks = enc.filter(F.col("kind") == "chunk")
    salts = sorted(
        int(r["part_key"].split("#")[-1]) for r in chunks.select("part_key").distinct().collect()
    )
    assert 2 not in salts and max(salts) < 2  # precondition: top bucket empty
    assert chunks.agg(F.max("salt_buckets")).collect()[0][0] == 3
    out = roundtrip_verify_fast(docs, enc, ["content"], salt_col="repo").collect()
    assert out and all(r["match"] for r in out)
    assert sum(r["rows_src"] for r in out) == 9
    enc.unpersist()
