"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata
struct.  The Spark-side plumbing -- schemas, Arrow batch shapes,
mapInPandas signatures, partition sizing -- is real and tested; the actual
media decode is STUBBED (no image/audio libs in this container):
``decode_image`` raises NotImplementedError unless ``fake=True``, in which
case a deterministic fake decoder derives metadata from the payload bytes,
so the pipeline is exercisable end-to-end and oracle-checkable.
"""

from __future__ import annotations

from typing import Iterator

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "doc_id long, media binary, media_type string, n_bytes long, "
    "sha1 string, width int, height int"
)


def ingest_media(docs: DataFrame, payload_col: str = "text") -> DataFrame:
    """Wrap a column as an opaque media payload with extracted metadata.

    Runs in mapInPandas over Arrow batches (the shape a real image decoder
    would use: bytes in, metadata + bytes out, batch-at-a-time).
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = [t.encode("utf-8", "surrogatepass") if t is not None else b"" for t in pdf[payload_col]]
            n_bytes = np.array([len(b) for b in payload], dtype=np.int64)
            sha1 = [hashlib.sha1(b).hexdigest() for b in payload]
            # deterministic fake dimensions derived from content size --
            # replicable in SQL for the oracle; a real decoder would parse
            # the container header here
            width = (n_bytes % 640).astype(np.int32)
            height = (n_bytes % 480).astype(np.int32)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": payload,
                    "media_type": ["text/plain"] * len(pdf),
                    "n_bytes": n_bytes,
                    "sha1": sha1,
                    "width": width,
                    "height": height,
                }
            )

    return docs.select("doc_id", payload_col).mapInPandas(extract, schema=MEDIA_SCHEMA)


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
    """'Frame sampling' plumbing: emit one row per sampled offset of each
    payload (what video frame extraction looks like shape-wise: one input
    row fans out to many output rows inside mapInPandas)."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, offs = [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                n = len(blob)
                k = max(1, n // every_n_bytes)
                for j in range(k):
                    ids.append(doc_id)
                    offs.append(j * every_n_bytes)
            yield pd.DataFrame({"doc_id": ids, "frame_offset": np.array(offs, dtype=np.int64)})

    return media.select("doc_id", "media").mapInPandas(sample, schema="doc_id long, frame_offset long")
