"""parquet4seastar_spark: a from-scratch PySpark-native per-column
lightweight-compression engine reproducing the encoding core of
michoecho/parquet4seastar (see SURVEY.md), plus FSST and codec
auto-selection, over source-repo tables at cluster scale.

Layout:
- codecs/    numpy codec kernels (wire-format parity with the reference)
- engine/    Spark jobs: synthetic table generator, encode/decode/verify,
             salted repartitioning, lineage & resume
- operators/ training-data pipeline ops (dedup, similarity, text analysis)
"""

from . import _alloc  # noqa: F401  (allocator tuning side effect)

__version__ = "0.1.0"
