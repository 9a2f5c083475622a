"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata
struct.  Metadata extraction and frame sampling are pure column math and
run entirely JVM-side (whole-stage codegen, no Python stage in the plan):
``encode``/``octet_length``/``sha1``/``md5`` built-ins for ingest,
``explode(sequence(...))`` for frame offsets.  The only Python stage left
is the actual media decode (``decode_image``), which is where a real
image/audio library would sit -- it is STUBBED (no such libs in this
container): raises NotImplementedError unless ``fake=True``, in which case
a deterministic fake decoder derives a thumbnail from the payload bytes,
so the mapInPandas plumbing (schema, Arrow batch shape, UDF signature) is
exercisable end-to-end.
"""

from __future__ import annotations

from typing import Iterator

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "doc_id long, media binary, media_type string, n_bytes long, "
    "sha1 string, md5 string, width int, height int"
)


def ingest_media(docs: DataFrame, payload_col: str = "text") -> DataFrame:
    """Wrap a column as an opaque media payload with extracted metadata.

    All metadata is computed with JVM built-ins -- no per-row Python.  A
    real container-header parse (jpeg/png dims etc.) would slot in as one
    extra mapInArrow stage over ``media``; the fake dimensions here are
    deterministic functions of the payload size so the whole pipeline is
    SQL-oracle-checkable.
    """
    media = F.encode(F.coalesce(F.col(payload_col), F.lit("")), "utf-8")
    n_bytes = F.octet_length(media).cast("long")
    return docs.select(
        "doc_id",
        media.alias("media"),
        F.lit("text/plain").alias("media_type"),
        n_bytes.alias("n_bytes"),
        F.sha1(media).alias("sha1"),
        F.md5(media).alias("md5"),
        (n_bytes % 640).cast("int").alias("width"),
        (n_bytes % 480).cast("int").alias("height"),
    )


def decode_image(media: DataFrame, fake: bool = False) -> DataFrame:
    """Decode/resize stub.

    Real decode requires an image library not present in this container;
    the Spark plumbing (schema, batch shape) is what this function pins.
    ``fake=True`` derives a deterministic 8x8 'thumbnail' from the payload
    hash so downstream feature-extraction plumbing can be tested.
    """
    if not fake:
        raise NotImplementedError(
            "media decode requires an image/audio library not available in "
            "this environment; run with fake=True for the deterministic stub"
        )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = []
            for blob in pdf["media"]:
                h = hashlib.sha256(bytes(blob)).digest()
                thumbs.append(np.frombuffer((h * 2)[:64], dtype=np.uint8).astype(np.int32).tolist())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "thumb8x8": thumbs})

    return media.select("doc_id", "media").mapInPandas(decode, schema="doc_id long, thumb8x8 array<int>")


def frame_sample(media: DataFrame, every_n_bytes: int = 4096) -> DataFrame:
    """'Frame sampling': one row per sampled offset of each payload
    (min 1 per payload).  Pure built-ins: the per-row fan-out is
    ``explode(sequence(...))`` -- fully JVM-side, no Python stage."""
    n_frames = F.greatest(
        (F.octet_length("media") / F.lit(every_n_bytes)).cast("long"), F.lit(1)
    )
    return media.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("_j"),
    ).select(
        "doc_id", (F.col("_j") * every_n_bytes).cast("long").alias("frame_offset")
    )
