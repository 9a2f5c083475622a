"""Deduplication operators for large-scale training-data pipelines.

All shuffle-conscious: exact dedup is one hash aggregate; MinHash-LSH and
SimHash bucket first (map-side, vectorized pandas UDFs over Arrow batches)
and only join within buckets, so the candidate-pair space stays linear-ish
instead of O(n^2).  At cluster scale the bucket join is a standard shuffled
equi-join Catalyst/AQE can re-plan (skewed buckets split by AQE).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

_MERSENNE = (1 << 61) - 1


def exact_dedup(docs: DataFrame, key: str = "text") -> DataFrame:
    """Group identical texts: (keep_id = min doc_id, n_copies)."""
    return docs.groupBy(key).agg(
        F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies")
    ).select("keep_id", "n_copies")


def _shingle_hashes(texts: pd.Series, k: int) -> list[np.ndarray]:
    """Per-doc arrays of 64-bit k-shingle hashes (vectorized per doc)."""
    out = []
    for t in texts:
        if t is None or len(t) < k:
            out.append(np.zeros(1, dtype=np.uint64))
            continue
        b = np.frombuffer(t.encode("utf-8", "surrogatepass"), dtype=np.uint8)
        n = len(b)
        if n < k:
            out.append(np.zeros(1, dtype=np.uint64))
            continue
        # polynomial rolling hash of every k-gram, fully vectorized
        h = np.zeros(n - k + 1, dtype=np.uint64)
        mult = np.uint64(1099511628211)
        for j in range(k):
            h = h * mult + b[j : n - k + 1 + j].astype(np.uint64)
        out.append(np.unique(h))
    return out


def minhash_signatures(
    docs: DataFrame, num_hashes: int = 64, shingle_k: int = 9, seed: int = 42
) -> DataFrame:
    """(doc_id, sig array<long>): MinHash signatures over k-shingles.

    Vectorized pandas UDF: per Arrow batch, shingle hashes x permutation
    params in one (num_hashes, n_shingles) broadcast min.
    """
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE - 1, num_hashes, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE - 1, num_hashes, dtype=np.uint64)

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from parquet4seastar_spark import _alloc

        _alloc.tune_allocator()
        for pdf in batches:
            shingles = _shingle_hashes(pdf["text"], shingle_k)
            sigs = []
            for h in shingles:
                # (num_hashes, n_shingles) permuted mod-Mersenne minimum
                hm = (a[:, None] * (h[None, :] % _MERSENNE) + b[:, None]) % _MERSENNE
                sigs.append(hm.min(axis=1).astype(np.int64))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "sig": sigs})

    return docs.select("doc_id", "text").mapInPandas(compute, schema="doc_id long, sig array<long>")


def minhash_lsh_pairs(
    docs: DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 9,
    threshold: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate candidate pairs via banded LSH + exact signature check.

    banding: sig split into ``bands`` bands of r = num_hashes/bands rows;
    docs sharing any band-hash become candidates (shuffle = groupBy band
    bucket); candidate pairs keep an estimated Jaccard >= threshold
    (fraction of equal signature positions).
    """
    r = num_hashes // bands
    sigs = minhash_signatures(docs, num_hashes, shingle_k, seed)
    banded = sigs.select(
        "doc_id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.xxhash64(F.slice("sig", i * r + 1, r).cast("array<string>").cast("string")).alias("bucket"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "sig", "bb.band", "bb.bucket")
    left = banded.alias("l")
    right = banded.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
            F.col("l.sig").alias("sig_a"),
            F.col("r.sig").alias("sig_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    est = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, v: acc + v,
    ) / F.lit(num_hashes)
    return cand.select("doc_a", "doc_b", est.alias("est_jaccard")).filter(
        F.col("est_jaccard") >= threshold
    )


def simhash(docs: DataFrame, bits: int = 64, shingle_k: int = 6, seed: int = 7) -> DataFrame:
    """(doc_id, simhash long): weighted bit-vote fingerprint over shingles."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from parquet4seastar_spark import _alloc

        _alloc.tune_allocator()
        shifts = np.arange(bits, dtype=np.uint64)
        for pdf in batches:
            shingles = _shingle_hashes(pdf["text"], shingle_k)
            out = np.empty(len(shingles), dtype=np.int64)
            for i, h in enumerate(shingles):
                votes = (((h[:, None] >> shifts) & np.uint64(1)).astype(np.int64) * 2 - 1).sum(axis=0)
                out[i] = int(((votes > 0).astype(np.uint64) << shifts).sum(dtype=np.uint64).astype(np.int64))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "simhash": out})

    return docs.select("doc_id", "text").mapInPandas(compute, schema="doc_id long, simhash long")


def ngram_jaccard_dedup(
    docs: DataFrame, shingle_k: int = 9, threshold: float = 0.8, seed: int = 42
) -> DataFrame:
    """Exact n-gram Jaccard on LSH candidate pairs (verification pass).

    LSH proposes candidates (cheap); the exact Jaccard over shingle sets
    confirms (cogrouped pandas apply over only the candidate texts).
    """
    cand = minhash_lsh_pairs(docs, threshold=min(threshold - 0.2, 0.5), shingle_k=shingle_k, seed=seed)
    texts = docs.select("doc_id", "text")
    joined = (
        cand.join(texts.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("text", "text_a"), "doc_a")
        .join(texts.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("text", "text_b"), "doc_b")
    )

    def exact(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ja = []
            for ta, tb in zip(pdf["text_a"], pdf["text_b"]):
                sa = _shingle_hashes(pd.Series([ta]), shingle_k)[0]
                sb = _shingle_hashes(pd.Series([tb]), shingle_k)[0]
                inter = len(np.intersect1d(sa, sb, assume_unique=True))
                union = len(sa) + len(sb) - inter
                ja.append(inter / union if union else 0.0)
            yield pd.DataFrame({"doc_a": pdf["doc_a"], "doc_b": pdf["doc_b"], "jaccard": ja})

    out = joined.mapInPandas(exact, schema="doc_a long, doc_b long, jaccard double")
    return out.filter(F.col("jaccard") >= threshold)
