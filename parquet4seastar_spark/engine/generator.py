"""Deterministic synthetic source-repo table generator.

Input shape mandated by BASELINE.json input_hint:
    (repo string, path string, commit string, lang string, content string)
plus a stable ``row_id`` (int64) used by the round-trip verifier.

Design for scale:
- generated distributively from ``spark.range`` via ``mapInArrow``; the
  content column is assembled as one arrow buffer per batch (offsets +
  payload gather) -- value bytes never materialize as per-row Python
  strings, honoring the input_hint's "no per-row Python";
- fully deterministic from (seed, row index): re-running at any
  parallelism yields identical rows (generation state is per-row
  counter-hash, not per-partition RNG);
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
import pyarrow as pa
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
    """Deterministic ~1 MiB token soup for one language (fully vectorized:
    token picks are gathered from a concatenated pool buffer)."""
    # hash-randomization-free seed derivation: Python's str hash depends on
    # PYTHONHASHSEED, so digest-based seeding is what makes the generator
    # reproducible outside Spark workers too
    rng = np.random.default_rng(
        int.from_bytes(hashlib.sha256(f"{lang}:{seed}".encode()).digest()[:8], "little")
    )
    words = (_KEYWORDS.get(lang, _DEFAULT_KW)).split()
    idents = [f"v{i}".encode() for i in range(40)] + [f"fn_{i}".encode() for i in range(20)]
    seps = [b" ", b" ", b"\n", b"(", b")", b" = ", b"., ", b";\n", b"    "]
    pool = words * 4 + idents + seps * 6
    pool_payload = np.frombuffer(b"".join(pool), dtype=np.uint8)
    pool_lens = np.array([len(t) for t in pool], dtype=np.int64)
    pool_starts = np.zeros(len(pool), dtype=np.int64)
    pool_starts[1:] = np.cumsum(pool_lens)[:-1]
    picks = rng.integers(0, len(pool), _CORPUS_BYTES // 5)
    buf = _ragged_gather(pool_payload, pool_starts[picks], pool_lens[picks])
    return buf[:_CORPUS_BYTES]


class _GenState:
    """Per-executor lazily built corpora (deterministic, seed-keyed).

    All language corpora concatenated into one buffer so body bytes can be
    gathered with a single fancy index.
    """

    _cache: dict = {}

    @classmethod
    def corpus_blob(cls, seed: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(blob, per-lang start offsets, per-lang lengths).

        Corpora are shorter than _CORPUS_BYTES (token join undershoots);
        slices past a corpus end clamp, like numpy slicing."""
        if seed not in cls._cache:
            parts = [_corpus_for(lang, seed) for lang in LANGS]
            lens = np.array([len(p) for p in parts], dtype=np.int64)
            starts = np.zeros(len(parts), dtype=np.int64)
            starts[1:] = np.cumsum(lens)[:-1]
            cls._cache[seed] = (np.concatenate(parts), starts, lens)
        return cls._cache[seed]


def _zipf_cdf(n_repos: int, alpha: float) -> np.ndarray:
    w = 1.0 / np.power(np.arange(1, n_repos + 1, dtype=np.float64), alpha)
    return np.cumsum(w) / w.sum()


def _ragged_gather(src: np.ndarray, starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Concatenate src[starts[i] : starts[i]+lens[i]] for all i, vectorized."""
    total = int(lens.sum())
    if total == 0:
        return np.zeros(0, dtype=src.dtype)
    base = np.repeat(starts, lens)
    off = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(lens) - lens, lens)
    return src[base + off]


def _gen_batch(ids: np.ndarray, n_repos: int, seed: int, alpha: float) -> pa.RecordBatch:
    n = len(ids)
    cdf = _zipf_cdf(n_repos, alpha)

    # per-row uniform from a counter-based hash of (seed, id)
    def u(tag: int) -> np.ndarray:
        x = (
            ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            + np.uint64(seed * 1000003 + tag)
        ) & np.uint64(0xFFFFFFFFFFFFFFFF)
        x ^= x >> np.uint64(33)
        x = (x * np.uint64(0xFF51AFD7ED558CCD)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        x ^= x >> np.uint64(33)
        return x.astype(np.float64) / float(2**64)

    repo_idx = np.searchsorted(cdf, u(1))
    s = pd.Series  # vectorized string assembly (pandas C string kernels)
    repos = ("org" + s(repo_idx % 97).astype(str) + "/repo" + s(repo_idx).astype(str)).to_numpy()

    depth = (u(2) * 3).astype(np.int64) + 1
    d1 = s((u(3) * 12).astype(np.int64)).astype(str)
    d2 = s((u(4) * 12).astype(np.int64)).astype(str)
    fno = s((u(5) * 500).astype(np.int64)).astype(str)
    lang_idx = ((u(6) * len(LANGS) ** 2).astype(np.int64) + repo_idx * 7) % len(LANGS)
    langs = np.array(LANGS, dtype=object)[lang_idx]
    mid = np.where(depth > 1, ("sub" + d2 + "/").to_numpy(), "")
    paths = ("src/dir" + d1 + "/" + s(mid) + "file" + fno + "." + s(langs)).to_numpy()

    # commits: one sha1 per (repo, id-bucket) -- hash only the unique keys
    bucket = ids >> 6
    keys = repo_idx.astype(np.uint64) << np.uint64(32) | (bucket.astype(np.uint64) & np.uint64(0xFFFFFFFF))
    uniq, inverse = np.unique(keys, return_inverse=True)
    uniq_commits = np.array(
        [
            hashlib.sha1(f"{seed}:{int(k) >> 32}:{int(k) & 0xFFFFFFFF}".encode()).hexdigest()
            for k in uniq
        ],
        dtype=object,
    )
    commits = uniq_commits[inverse]

    # ~2% null lang, ~1% null content (def-level coverage, FIXTURES.md §1)
    lang_null = u(7) < 0.02
    content_null = u(8) < 0.01

    # lognormal lengths: median ~800B, heavy tail; clip to corpus size
    body_lens = np.clip(
        np.exp(np.log(800.0) + 1.1 * _norminv(u(9))), 16, 260_000
    ).astype(np.int64)
    blob, lang_starts, lang_lens = _GenState.corpus_blob(seed)
    rel_offs = (u(10) * (_CORPUS_BYTES - 260_001)).astype(np.int64)
    body_offs = lang_starts[lang_idx] + np.minimum(rel_offs, lang_lens[lang_idx])
    # clamp to each language corpus end (original slice semantics)
    body_lens = np.minimum(body_lens, np.maximum(lang_lens[lang_idx] - rel_offs, 0))

    # content = header line + corpus slice, assembled as ONE arrow buffer
    headers = (
        "// " + s(repos) + "/" + s(paths) + "@" + s(commits).str[:12]
        + " #" + s(ids).astype(str) + "\n"
    )
    h_arr = pa.array(headers, type=pa.string()).cast(pa.large_binary())
    h_buffers = h_arr.buffers()
    h_offsets = np.frombuffer(h_buffers[1], dtype=np.int64, count=n + 1)
    h_payload = np.frombuffer(h_buffers[2], dtype=np.uint8)
    h_lens = np.diff(h_offsets)

    nn = ~content_null
    c_lens = np.where(nn, h_lens + body_lens, 0).astype(np.int64)
    out_offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(c_lens, out=out_offsets[1:])
    payload = np.empty(int(out_offsets[-1]), dtype=np.uint8)
    # scatter headers then bodies (both ragged, fully vectorized)
    h_starts_out = out_offsets[:-1][nn]
    hp = _ragged_gather(h_payload, h_offsets[:-1][nn], h_lens[nn])
    idx_h = np.repeat(h_starts_out, h_lens[nn]) + (
        np.arange(len(hp), dtype=np.int64)
        - np.repeat(np.cumsum(h_lens[nn]) - h_lens[nn], h_lens[nn])
    )
    payload[idx_h] = hp
    bp = _ragged_gather(blob, body_offs[nn], body_lens[nn])
    b_starts_out = (out_offsets[:-1] + h_lens)[nn]
    idx_b = np.repeat(b_starts_out, body_lens[nn]) + (
        np.arange(len(bp), dtype=np.int64)
        - np.repeat(np.cumsum(body_lens[nn]) - body_lens[nn], body_lens[nn])
    )
    payload[idx_b] = bp
    validity = pa.py_buffer(np.packbits(nn, bitorder="little").tobytes())
    content_arr = pa.Array.from_buffers(
        pa.large_binary(),
        n,
        [validity if content_null.any() else None, pa.py_buffer(out_offsets.tobytes()), pa.py_buffer(payload.tobytes())],
    ).cast(pa.large_string()).cast(pa.string())

    lang_arr = pa.array(langs, type=pa.string(), mask=lang_null)
    return pa.RecordBatch.from_arrays(
        [
            pa.array(ids, type=pa.int64()),
            pa.array(repos, type=pa.string()),
            pa.array(paths, type=pa.string()),
            pa.array(commits, type=pa.string()),
            lang_arr,
            content_arr,
        ],
        names=["row_id", "repo", "path", "commit", "lang", "content"],
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

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from parquet4seastar_spark import _alloc

        _alloc.tune_allocator()
        for rb in batches:
            ids = rb.column("id").to_numpy()
            yield _gen_batch(ids, n_repos, seed, alpha)

    return spark.range(0, n_rows, 1, partitions).mapInArrow(gen, schema=schema)
