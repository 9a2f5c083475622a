"""Text analysis operators over a documents table -- built-in
pyspark.sql.functions (JVM-side, whole-stage codegen) throughout; no
per-row Python anywhere (doc_repetition's n-gram leg rides dedup's
vectorized mapInArrow shingle stream).

Operators: token counting, quality scoring, language-ID heuristic,
document fingerprinting.  Each returns a DataFrame keyed by doc_id with
integer/string outputs chosen to be bit-reproducible in an ANSI-SQL oracle
(DuckDB) for the driver's correctness gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# tiny per-language stopword lists for the n-gram/stopword heuristic;
# deliberately small & deterministic (shared with the SQL oracle)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "und", "nicht", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "que", "de", "los"],
}


def token_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_chars_obs): whitespace tokenization."""
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens"),
        F.length("text").alias("n_chars_obs"),
    )


# BPE-ish pre-tokenizer regex: letter runs, digit runs, punctuation runs
# (each with an optional leading space) and whitespace runs -- the GPT-2
# pattern family minus lookahead, so the exact same regex runs in RE2
# (DuckDB) and Java (Spark) for the oracle
BPE_PATTERN = r" ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+|\s+"


def token_counts_bpe(docs: DataFrame) -> DataFrame:
    """(doc_id, n_bpe_tokens, n_word_tokens): BPE-ish regex pre-tokenization
    vs whitespace tokens -- the token-budget estimate an LLM-data pipeline
    carries per document."""
    return docs.select(
        "doc_id",
        F.regexp_count("text", F.lit(BPE_PATTERN)).alias("n_bpe_tokens"),
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_word_tokens"),
    )


STOPWORDS = ["the", "and", "of", "to", "in", "a", "is", "for", "on", "with"]


def _marker_count(low, words: list[str]):
    """Whole-word marker hits in ONE regex pass: an alternation of
    \\b-anchored words.  Whole-word matches on distinct words are disjoint,
    so one non-overlapping scan counts exactly what per-word scans summed --
    at ~1/len(words) the passes over the text.  RE2-safe (no lookahead), so
    the same pattern runs verbatim in the DuckDB oracle."""
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.regexp_count(low, F.lit(pat))


def stopword_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, n_stopwords, n_word_tokens, stopword_pct): stopword density,
    the classic natural-language-vs-junk quality signal.  Integer percent
    keeps the oracle hash float-free."""
    low = F.lower(F.col("text"))
    n_stop = _marker_count(low, STOPWORDS)
    n_words = F.size(F.split(F.trim("text"), r"\s+"))
    return docs.select(
        "doc_id",
        n_stop.alias("n_stopwords"),
        n_words.alias("n_word_tokens"),
        # explicit floor: DuckDB's double->int cast rounds, Spark's truncates
        F.floor(n_stop * 100 / F.greatest(n_words, F.lit(1))).cast("long").alias("stopword_pct"),
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """Integer quality signals: alpha/digit/punct/space char counts plus a
    simple length bucket.  Integer outputs keep the DuckDB oracle hash-exact
    (no float formatting drift)."""
    text = F.col("text")
    alpha = F.length(F.regexp_replace(text, "[^a-zA-Z]", ""))
    digit = F.length(F.regexp_replace(text, "[^0-9]", ""))
    space = F.length(F.regexp_replace(text, r"[^ \t\n]", ""))
    total = F.length(text)
    return docs.select(
        "doc_id",
        total.alias("n_chars_q"),
        alpha.alias("alpha_chars"),
        digit.alias("digit_chars"),
        space.alias("space_chars"),
        (total - alpha - digit - space).alias("other_chars"),
        F.when(total < 100, "short").when(total < 2000, "medium").otherwise("long").alias("len_bucket"),
    )


def language_id(docs: DataFrame) -> DataFrame:
    """Stopword-count heuristic language ID.

    Counts whole-word marker hits per language on the lowercased text and
    returns the argmax ('und' = undetermined when all zero).  Expressed in
    built-ins so the same logic is one SQL expression for the oracle.
    """
    low = F.lower(F.col("text"))
    scores = [
        _marker_count(low, words).alias(f"score_{lang}")
        for lang, words in LANG_MARKERS.items()
    ]
    scored = docs.select("doc_id", *scores)
    langs = list(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{l}") for l in langs])
    pick = F.when(best <= 0, "und")
    for l in langs:  # first language reaching the max wins (stable order)
        pick = pick.when(F.col(f"score_{l}") == best, l)
    return scored.select("doc_id", *[f"score_{l}" for l in langs], pick.alias("lang_guess"))


def fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, fp_md5, fp_prefix64): content fingerprints.

    md5 is the exact-dup key; the 16-hex-digit prefix stands in as a 64-bit
    rolling-hash-style fingerprint, comparable in any SQL engine.
    """
    return docs.select(
        "doc_id",
        F.md5("text").alias("fp_md5"),
        F.substring(F.md5("text"), 1, 16).alias("fp_prefix64"),
    )


def stratified_sample(
    docs: DataFrame, strata_col: str = "lang", hex_threshold: str = "40",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-stratum sample: keep rows whose
    md5('<stratum>:<id>') 2-hex-digit prefix sorts below ``hex_threshold``
    ('40' = 64/256 = 25%).

    Hash-based, not random: the sample is reproducible across runs,
    engines (md5 is bit-identical in Spark and DuckDB), and cluster sizes
    — no RNG state, no shuffle; the filter runs map-side inside
    whole-stage codegen and pushes past column pruning.  Stratification by
    key keeps every stratum at the same rate regardless of skew.
    """
    # coalesce the stratum: Spark's concat_ws would SKIP a NULL stratum and
    # its separator ('123') while SQL concat keeps it (':123'), silently
    # desyncing the two sides (review finding) — oracle uses the same
    # coalesce(col, '')
    # coalesce BOTH operands: Spark concat NULL-propagates while SQL concat
    # skips NULL args — either asymmetry desyncs the two engines
    key = F.md5(
        F.concat(
            F.coalesce(F.col(strata_col), F.lit("")),
            F.lit(":"),
            F.coalesce(F.col(id_col).cast("string"), F.lit("")),
        )
    )
    return docs.withColumn("_h", F.substring(key, 1, 2)).filter(
        F.col("_h") < hex_threshold
    ).drop("_h")


PII_PATTERNS = [
    # RE2-safe (no lookahead): shared verbatim with the DuckDB oracle
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
]


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, text_redacted, n_redactions): scrub email/phone/SSN-shaped
    spans — the hygiene pass a training-data pipeline runs before
    tokenization.  Pure regexp_replace chain (JVM, whole-stage codegen).
    Each pattern is COUNTED against the text after the previous pattern's
    replacements (a phone embedded in an already-redacted email is not
    double-counted), so n_redactions equals the replacements performed."""
    red = F.col(text_col)
    n = F.lit(0)
    for pat, tag in PII_PATTERNS:
        n = n + F.size(F.split(red, pat)) - 1
        red = F.regexp_replace(red, pat, tag)
    return docs.select(
        "doc_id", red.alias("text_redacted"), n.cast("int").alias("n_redactions")
    )


def top_terms_by_lang(docs: DataFrame, k: int = 5) -> DataFrame:
    """(lang, term, cnt, rank): top-k whitespace terms per language by
    exact count (ties broken by term, so fully deterministic).

    Scale shape: explode -> one (lang, term) hash aggregate with map-side
    partial combine; the per-lang top-k is a WindowGroupLimit (Spark pushes
    rank<=k below the sort), so only k rows per lang survive the window
    shuffle region.
    """
    from pyspark.sql import Window

    terms = docs.select(
        "lang",
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("term"),
    )
    counts = terms.groupBy("lang", "term").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("lang").orderBy(F.desc("cnt"), F.asc("term"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("lang", "term", "cnt", "rank")
    )


def doc_repetition(docs: DataFrame, ngram_k: int = 8) -> DataFrame:
    """(doc_id, n_ngrams, dup_ngram_pct, n_lines, dup_line_pct): intra-
    document repetition quality signals — the standard training-data filter
    for boilerplate / template / degenerate-generation text (publicly
    documented heuristics: duplicate n-gram fraction and repeated-line
    fraction; cf. Gopher/MassiveText quality rules).

    - ``dup_ngram_pct`` = floor(100 * duplicated-k-gram fraction): 1 minus
      distinct/total character k-grams.  Vectorized over dedup's shingle
      stream (ONE rolling-hash pass + segmented unique per Arrow batch --
      no per-row Python; text never shuffles, output is doc-keyed ints).
    - ``dup_line_pct``  = floor(100 * repeated non-empty-line fraction),
      pure JVM built-ins (split + array_distinct).

    Percentages are floored ints so the DuckDB oracle compares exactly
    (floats would be format-sensitive in the value-hash gate).
    """
    from typing import Iterator

    import numpy as np
    import pyarrow as pa

    from ..codecs.pages import ba_components
    from .dedup import _batch_text, _shingle_stream

    # coalesce NULL text: size(split(NULL)) is NULL/-1 depending on the
    # sizeOfNull setting — an empty doc must score (0, 0, 0, 0)
    from ._util import fan_out

    lines = F.filter(
        F.split(F.coalesce(F.col("text"), F.lit("")), "\n"),
        lambda x: F.length(F.trim(x)) > 0,
    )
    # scale-adaptive fan-out: the line stats + shingle pass below are the
    # heavy per-row compute; a small single-file input would otherwise run
    # them on one task (no-op at corpus scale)
    docs = fan_out(docs.select("doc_id", "text"))
    src = docs.select(
        "doc_id",
        "text",
        F.size(lines).alias("_n_lines"),
        F.size(F.array_distinct(lines)).alias("_n_uniq_lines"),
    )

    def compute(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from parquet4seastar_spark import _alloc

        _alloc.tune_allocator()
        for rb in batches:
            if rb.num_rows == 0:
                continue
            text = _batch_text(rb, "text")
            filled = text.fill_null("") if text.null_count else text
            lengths, _ = ba_components(filled)
            grams = np.maximum(lengths - ngram_k + 1, 0).astype(np.int64)
            _, u_counts, _ = _shingle_stream(text, ngram_k)
            uniq = np.where(grams > 0, u_counts, 0)  # sentinel rows -> 0
            yield pa.RecordBatch.from_arrays(
                [
                    _batch_text(rb, "doc_id").cast(pa.int64()),
                    pa.array(grams, type=pa.int64()),
                    pa.array(uniq, type=pa.int64()),
                    _batch_text(rb, "_n_lines").cast(pa.int64()),
                    _batch_text(rb, "_n_uniq_lines").cast(pa.int64()),
                ],
                names=["doc_id", "n_ngrams", "_uniq", "_n_lines", "_n_uniq"],
            )

    out = src.mapInArrow(
        compute,
        schema="doc_id long, n_ngrams long, _uniq long, _n_lines long, _n_uniq long",
    )
    pct = lambda dup, total: F.floor(  # noqa: E731 - shared floored-pct shape
        dup * F.lit(100) / F.greatest(total, F.lit(1))
    ).cast("long")
    return out.select(
        "doc_id",
        "n_ngrams",
        pct(F.col("n_ngrams") - F.col("_uniq"), F.col("n_ngrams")).alias("dup_ngram_pct"),
        F.col("_n_lines").alias("n_lines"),
        pct(F.col("_n_lines") - F.col("_n_uniq"), F.col("_n_lines")).alias("dup_line_pct"),
    )


def pack_sequences(
    docs: DataFrame, max_tokens: int = 2048, strata_col: str = "lang",
    id_col: str = "doc_id", text_col: str = "text",
    num_partitions: int | None = None,
) -> DataFrame:
    """(doc_id, <strata>, n_tokens, seq_bin): contiguous sequence packing —
    the step that groups documents into fixed-token-budget training
    sequences.  A document is assigned to the bin where its tokens START:
    seq_bin = floor(exclusive_prefix_sum(n_tokens) / max_tokens) in id
    order WITHIN its stratum.

    Scale shape: a DISTRIBUTED prefix sum, not a per-stratum window (a
    window serializes each stratum through one task — tens of TB for `en`
    in a real corpus).  The (id, strata, n_tokens) frame — token counts
    only, never the text — is range-partitioned on (strata, id) and
    persisted to pin the partition boundaries, per-(partition, stratum)
    totals are aggregated (one tiny row per partition x stratum) and
    collected, exclusive offsets are broadcast, and one mapInArrow pass
    assigns bins map-side via a segmented cumsum with cross-batch carry.
    Every stratum spans as many tasks as its row-range covers.
    Deterministic: same input -> same bins on any cluster size.
    """
    import pyarrow as _pa
    from pyspark.sql.types import LongType, StructField

    spark = docs.sparkSession
    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    # coalesce NULL text: size(split(NULL)) is -1 under Spark's legacy
    # sizeOfNull, which would silently corrupt the prefix sums (negative
    # bins); an empty doc counts as 1 token, same as the '' convention in
    # dedup's shingle stream
    n_tok = F.size(F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"))
    ranged = (
        docs.select(id_col, strata_col, n_tok.alias("n_tokens"))
        .repartitionByRange(P, strata_col, id_col)
        .sortWithinPartitions(strata_col, id_col)
        # pin boundaries: both passes must see identical pids.  The cache
        # (token counts + keys only, never the text — ~24 B/row) lives
        # until the returned frame is garbage-collected (ContextCleaner
        # unpersists it then); same session-bounded convention as
        # pruned_scan's pages persist, noted here because the harness may
        # call this several times per session.
        .persist()
    )

    # pass 1: tiny per-(partition, stratum) totals.  Range partitioning on
    # (strata, id) means a stratum's partitions are contiguous in pid
    # order, so the cross-partition base for (pid, s) is the sum of s's
    # totals over pid' < pid.
    totals = (
        ranged.groupBy(
            F.spark_partition_id().alias("_pid"), F.col(strata_col).alias("_s")
        )
        .agg(F.sum("n_tokens").alias("_t"))
        .collect()
    )
    offsets: dict[tuple[int, object], int] = {}
    run: dict[object, int] = {}
    for r in sorted(totals, key=lambda r: r["_pid"]):
        offsets[(r["_pid"], r["_s"])] = run.get(r["_s"], 0)
        run[r["_s"]] = run.get(r["_s"], 0) + int(r["_t"])
    b_offsets = spark.sparkContext.broadcast(offsets)

    out_fields = list(ranged.schema.fields) + [StructField("seq_bin", LongType())]
    mt = int(max_tokens)

    def assign(batches: Iterator[_pa.RecordBatch]) -> Iterator[_pa.RecordBatch]:
        import numpy as np
        import pyarrow.compute as pc

        from parquet4seastar_spark import _alloc

        _alloc.tune_allocator()
        offs = b_offsets.value
        _no_carry = object()  # distinct from any stratum incl. None
        carry_key: list = [_no_carry]  # stratum of the partition's last row
        carry_sum = [0]  # inclusive running total (with base) for carry_key

        for batch in batches:
            if batch.num_rows == 0:
                continue
            pid = batch.column(3)[0].as_py()  # _pid (id, strata, n, _pid)
            scol = batch.column(1)  # strata (position: id, strata, n, _pid)
            dic = pc.dictionary_encode(scol)
            codes = pc.fill_null(dic.indices, -1).to_numpy(zero_copy_only=False)
            codes = np.asarray(codes, dtype=np.int64)
            n = np.asarray(
                pc.fill_null(batch.column(2), 0).to_numpy(zero_copy_only=False),
                dtype=np.int64,
            )
            cum = np.cumsum(n)
            excl = np.empty_like(cum)
            excl[0] = 0
            excl[1:] = cum[:-1]
            newgrp = np.empty(len(codes), dtype=bool)
            newgrp[0] = True
            np.not_equal(codes[1:], codes[:-1], out=newgrp[1:])
            gstart = np.flatnonzero(newgrp)
            gcount = np.diff(np.append(gstart, len(codes)))
            # per-group base offset: the carry when continuing the previous
            # batch's stratum, else the broadcast cross-partition base
            goffs = np.empty(len(gstart), dtype=np.int64)
            dvals = dic.dictionary
            for gi, si in enumerate(gstart):
                c = codes[si]
                key = None if c < 0 else dvals[c].as_py()
                if gi == 0 and carry_key[0] is not _no_carry and key == carry_key[0]:
                    goffs[gi] = carry_sum[0]
                else:
                    goffs[gi] = offs.get((pid, key), 0)
            base = np.repeat(excl[gstart], gcount)
            row_off = np.repeat(goffs, gcount)
            seq_bin = (excl - base + row_off) // mt
            # carry = last group's offset + its inclusive sum so far
            last = len(gstart) - 1
            lc = codes[gstart[last]]
            carry_key[0] = None if lc < 0 else dvals[lc].as_py()
            carry_sum[0] = int(goffs[last] + cum[-1] - excl[gstart[last]])
            yield _pa.RecordBatch.from_arrays(
                [batch.column(0), batch.column(1), batch.column(2),
                 _pa.array(seq_bin, type=_pa.int64())],
                names=[f.name for f in out_fields],
            )

    from pyspark.sql.types import StructType

    return ranged.withColumn("_pid", F.spark_partition_id()).mapInArrow(
        assign, StructType(out_fields)
    )
