"""Physical-plan regression tests: lock in the scale-critical properties
documented in PLANS.md (broadcast joins, predicate pushdown, column
pruning, single-shuffle salting)."""

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_salted_repartition_broadcasts_sizes(spark):
    from parquet4seastar_spark.engine.encode_job import salted_repartition

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        F.col("doc_id").alias("row_id"), "text", F.col("source").alias("repo")
    )
    plan = _plan(salted_repartition(docs, 4, size_col="text"))
    assert "BroadcastHashJoin" in plan  # per-repo sizes join is broadcast
    # exactly ONE shuffle moves the value bytes (the part_key repartition);
    # the second hashpartitioning is the tiny one-row-per-repo aggregate
    assert plan.count("Exchange hashpartitioning(part_key") == 1


def test_scan_pruning_and_pushdown(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    q = docs.select("doc_id", "lang").filter(F.col("lang") == "en")
    plan = _plan(q)
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan
    assert "ReadSchema: struct<doc_id:bigint,lang:string>" in plan


def test_exact_dedup_exchange_carries_fingerprints_not_text(spark):
    """The dedup aggregate shuffles 16-byte fingerprints, never the corpus
    bytes: keys are the two salted xxhash64 values, the map-side partial
    min/count runs below the exchange, and no exchange partitions on text."""
    import re

    from parquet4seastar_spark.operators.dedup import exact_dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(exact_dedup(docs))
    assert "Exchange hashpartitioning(_fp" in plan
    assert "Exchange hashpartitioning(text" not in plan
    assert re.search(r"HashAggregate\(keys=\[_fp#\d+L?, _fp2#\d+L?\], functions=\[partial_min", plan), plan


def test_row_count_salting_prunes_value_column(spark):
    from parquet4seastar_spark.engine.encode_job import salted_repartition

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        F.col("doc_id").alias("row_id"), "text", F.col("source").alias("repo")
    )
    salted = salted_repartition(docs, 4, salt_target_rows=1000)
    # the sizes aggregate subtree must not read the value bytes
    opt = _optimized(salted)
    assert "count(1)" in opt  # row-count mode, not octet_length sum


def test_multimodal_plan_has_no_python_stage(spark):
    # ingest metadata + frame sampling are pure column math: the plan must
    # stay JVM-side (no ArrowEvalPython / MapInPandas / BatchEvalPython)
    from parquet4seastar_spark.operators.multimodal import frame_sample, ingest_media

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    media = ingest_media(docs)
    for df in (media, frame_sample(media, every_n_bytes=1024)):
        plan = _plan(df)
        for marker in ("Python", "MapInPandas", "ArrowEval"):
            assert marker not in plan, plan


def test_ann_corpus_never_shuffles(spark):
    from parquet4seastar_spark.operators.similarity import brute_force_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    plan = _plan(brute_force_topk(emb, q, k=5))
    assert "BroadcastNestedLoopJoin" in plan  # queries broadcast to the corpus
    assert "WindowGroupLimit" in plan  # top-k rank pushdown before the sort


def test_stratified_sample_is_map_side_only(spark):
    # hash-prefix sampling must be a pure scan+filter: no Exchange, no
    # Python stage -- the filter rides whole-stage codegen past pruning
    from parquet4seastar_spark.operators.text import stratified_sample

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(stratified_sample(docs).select("doc_id", "lang"))
    assert "Exchange" not in plan, plan
    for marker in ("Python", "MapInPandas", "ArrowEval"):
        assert marker not in plan, plan


def test_redact_pii_is_map_side_only(spark):
    from parquet4seastar_spark.operators.text import redact_pii

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(redact_pii(docs))
    assert "Exchange" not in plan, plan
    for marker in ("Python", "MapInPandas", "ArrowEval"):
        assert marker not in plan, plan


def test_top_terms_window_group_limit(spark):
    # per-lang top-k must push rank<=k below the sort (WindowGroupLimit):
    # only k rows per lang survive the window region at scale
    from parquet4seastar_spark.operators.text import top_terms_by_lang

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(top_terms_by_lang(docs, k=5))
    assert "WindowGroupLimit" in plan, plan
    # one aggregate shuffle + one window shuffle, nothing more (count only
    # shuffle Exchanges — 'Exchange' alone also matches Broadcast/Reused)
    import re

    n_shuffles = len(re.findall(r"\bExchange hashpartitioning", plan))
    assert n_shuffles <= 2, plan
