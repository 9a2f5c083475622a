"""Deterministic synthetic source-repo table generator.

Input shape mandated by BASELINE.json input_hint:
    (repo string, path string, commit string, lang string, content string)
plus a stable ``row_id`` (int64) used by the round-trip verifier.

Design for scale:
- generated distributively from ``spark.range`` via ``mapInPandas`` -- no
  driver-side materialization, any row count;
- fully deterministic from (seed, row index): re-running at any
  parallelism yields identical rows (generation state is per-row, not
  per-partition);
- repo sizes follow a Zipf(alpha) distribution => heavy skew, exercising the
  engine's salted repartitioning (FIXTURES.md §1);
- content is sliced from per-language deterministic token-soup corpora with
  a unique per-row header line; lengths are lognormal (median ~800 B, heavy
  tail), so dictionaries lose and FSST/DLBA win, like real source text.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

LANGS = [
    "python", "c", "cpp", "java", "go", "rust", "js", "ts", "ruby", "php",
    "swift", "kotlin", "scala", "sh", "sql", "html", "css", "yaml", "json", "md",
]

_KEYWORDS = {
    "python": b"def class import return self for in if else None True lambda yield from with as try except raise",
    "c": b"int char void static struct const return if else while for sizeof typedef union unsigned long",
    "go": b"func package import return defer go chan select struct interface map range nil err := var const",
    "rust": b"fn let mut impl pub struct enum match Some None Result Ok Err use mod crate trait where async",
    "java": b"public private static final class void new return extends implements interface throws import package",
}
_DEFAULT_KW = b"function var let const return if else for while break continue switch case new delete typeof"

_CORPUS_BYTES = 1 << 20


def _corpus_for(lang: str, seed: int) -> np.ndarray:
    """Deterministic ~1 MiB token soup for one language."""
    rng = np.random.default_rng(abs(hash((lang, seed))) % (2**63))
    words = (_KEYWORDS.get(lang, _DEFAULT_KW)).split()
    idents = [f"v{i}".encode() for i in range(40)] + [f"fn_{i}".encode() for i in range(20)]
    seps = [b" ", b" ", b"\n", b"(", b")", b" = ", b"., ", b";\n", b"    "]
    pool = words * 4 + idents + seps * 6
    pool_arr = np.array(pool, dtype=object)
    parts = pool_arr[rng.integers(0, len(pool_arr), _CORPUS_BYTES // 5)]
    buf = b"".join(parts)[:_CORPUS_BYTES]
    return np.frombuffer(buf, dtype=np.uint8)


class _GenState:
    """Per-executor lazily built corpora (deterministic, seed-keyed)."""

    _cache: dict = {}

    @classmethod
    def corpora(cls, seed: int) -> dict:
        if seed not in cls._cache:
            cls._cache[seed] = {lang: _corpus_for(lang, seed) for lang in LANGS}
        return cls._cache[seed]


def _zipf_cdf(n_repos: int, alpha: float) -> np.ndarray:
    w = 1.0 / np.power(np.arange(1, n_repos + 1, dtype=np.float64), alpha)
    return np.cumsum(w) / w.sum()


def _gen_batch(ids: np.ndarray, n_repos: int, seed: int, alpha: float) -> pd.DataFrame:
    n = len(ids)
    # one independent stream per batch, keyed by the first row id -- but all
    # row attributes are pure functions of the row id, so regeneration at any
    # partitioning is identical
    base = np.random.default_rng(seed)  # fixed stream for shared tables
    cdf = _zipf_cdf(n_repos, alpha)

    # per-row uniform from a counter-based hash of (seed, id)
    def u(tag: int, lo=0.0, hi=1.0) -> np.ndarray:
        x = (ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15) + np.uint64(seed * 1000003 + tag)) & np.uint64(
            0xFFFFFFFFFFFFFFFF
        )
        x ^= x >> np.uint64(33)
        x = (x * np.uint64(0xFF51AFD7ED558CCD)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        x ^= x >> np.uint64(33)
        return lo + (hi - lo) * (x.astype(np.float64) / float(2**64))

    repo_idx = np.searchsorted(cdf, u(1))
    org = repo_idx % 97
    repos = pd.Series(repo_idx).map(lambda r: f"org{r % 97}/repo{r}").to_numpy()

    depth = (u(2) * 3).astype(np.int64) + 1
    d1 = (u(3) * 12).astype(np.int64)
    d2 = (u(4) * 12).astype(np.int64)
    fno = (u(5) * 500).astype(np.int64)
    lang_pick = (u(6) * len(LANGS) ** 2) .astype(np.int64)
    # per-repo skewed language: fold repo into the pick
    lang_idx = (lang_pick + repo_idx * 7) % len(LANGS)
    langs = np.array(LANGS, dtype=object)[lang_idx]
    exts = langs  # extension = lang tag (synthetic)
    paths = np.array(
        [
            f"src/dir{a}/" + (f"sub{b}/" if d > 1 else "") + f"file{f}.{e}"
            for a, b, d, f, e in zip(d1, d2, depth, fno, exts)
        ],
        dtype=object,
    )
    commits = np.array(
        [hashlib.sha1(f"{seed}:{r}:{i >> 6}".encode()).hexdigest() for r, i in zip(repo_idx, ids)],
        dtype=object,
    )
    # ~2% null lang, ~1% null content (def-level coverage, FIXTURES.md §1)
    lang_null = u(7) < 0.02
    content_null = u(8) < 0.01

    # lognormal lengths: median ~800B, heavy tail; clip to corpus size
    ln = np.exp(np.log(800.0) + 1.1 * _norminv(u(9)))
    lengths = np.clip(ln, 16, 260_000).astype(np.int64)
    offsets = (u(10) * (_CORPUS_BYTES - 260_001)).astype(np.int64)
    corpora = _GenState.corpora(seed)
    contents = np.empty(n, dtype=object)
    for i in range(n):
        if content_null[i]:
            contents[i] = None
            continue
        corpus = corpora[langs[i]]
        header = f"// {repos[i]}/{paths[i]}@{commits[i][:12]} #{ids[i]}\n"
        contents[i] = header + corpus[offsets[i] : offsets[i] + lengths[i]].tobytes().decode("latin1")
    langs_col = np.where(lang_null, None, langs)
    return pd.DataFrame(
        {
            "row_id": ids,
            "repo": repos,
            "path": paths,
            "commit": commits,
            "lang": langs_col,
            "content": contents,
        }
    )


def _norminv(u: np.ndarray) -> np.ndarray:
    """Acklam-style rational approximation of the normal quantile (enough
    precision for synthetic length distributions)."""
    # Peter Acklam's algorithm, public domain constants
    a = [-3.969683028665376e01, 2.209460984245205e02, -2.759285104469687e02,
         1.383577518672690e02, -3.066479806614716e01, 2.506628277459239e00]
    b = [-5.447609879822406e01, 1.615858368580409e02, -1.556989798598866e02,
         6.680131188771972e01, -1.328068155288572e01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e00,
         -2.549732539343734e00, 4.374664141464968e00, 2.938163982698783e00]
    d = [7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e00,
         3.754408661907416e00]
    u = np.clip(u, 1e-12, 1 - 1e-12)
    out = np.empty_like(u)
    lo = u < 0.02425
    hi = u > 1 - 0.02425
    mid = ~(lo | hi)
    q = np.sqrt(-2 * np.log(u[lo]))
    out[lo] = (((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / (
        (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1
    )
    q = np.sqrt(-2 * np.log(1 - u[hi]))
    out[hi] = -(((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / (
        (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1
    )
    q = u[mid] - 0.5
    r = q * q
    out[mid] = (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]) * q / (
        ((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1
    )
    return out


def generate_source_repos(
    spark: SparkSession,
    n_rows: int,
    n_repos: int = 200,
    seed: int = 42,
    alpha: float = 1.2,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic source-repo table."""
    partitions = partitions or max(spark.sparkContext.defaultParallelism, 8)
    schema = "row_id long, repo string, path string, commit string, lang string, content string"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from parquet4seastar_spark import _alloc

        _alloc.tune_allocator()
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            yield _gen_batch(ids, n_repos, seed, alpha)

    return spark.range(0, n_rows, 1, partitions).mapInPandas(gen, schema=schema)
