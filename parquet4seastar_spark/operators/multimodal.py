"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata
struct.  Metadata extraction and frame sampling are pure column math and
run entirely JVM-side (whole-stage codegen, no Python stage in the plan):
``encode``/``octet_length``/``sha1``/``md5`` built-ins for ingest,
``explode(sequence(...))`` for frame offsets.  The only Python stage left
is the actual media decode (``decode_image``): it probes for PIL at plan
time and runs a real 8x8 grayscale thumbnail decode when the library is
present; without it (this container ships none) it raises
NotImplementedError unless ``fake=True``, in which case a deterministic
fake decoder derives a thumbnail from the payload bytes with one
vectorized numpy pass (mapInArrow; no per-row Python), so the plumbing
(schema, Arrow batch shape, UDF signature) is exercisable end-to-end
everywhere.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
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


def _image_lib():
    """PIL's Image module if importable, else None (dependency probe)."""
    try:
        from PIL import Image

        return Image
    except Exception:
        return None


def _decode_blob_thumb(Image, blob: bytes) -> list[int]:
    """One payload -> 64 grayscale ints (8x8 thumbnail) via the real image
    library; undecodable payloads yield 64 zeros (the fake path's empty
    convention).  Factored out of the UDF so the per-blob logic is unit-
    testable with a stub library even where PIL is absent."""
    import io

    try:
        img = Image.open(io.BytesIO(blob)).convert("L").resize((8, 8))
        return [int(v) for v in img.getdata()]
    except Exception:
        return [0] * 64


def decode_image(media: DataFrame, fake: bool = False) -> DataFrame:
    """Decode/resize: real when an image library is present, else stub.

    ``fake=False`` probes for PIL at plan time; if present, each payload
    decodes to an 8x8 grayscale thumbnail inside mapInArrow (per-row
    Python is the right shape here — native image decode dominates the
    loop overhead).  Without the library it raises NotImplementedError
    (this container ships no image lib; the per-blob logic is pinned by a
    stub-library unit test).  ``fake=True`` derives a deterministic
    8x8 'thumbnail' from a vectorized per-payload byte fold (one numpy
    pass over the concatenated buffer, segment-reduced -- no per-row
    Python) so downstream feature-extraction plumbing is testable
    everywhere.  Both paths share the output schema
    (doc_id, thumb8x8 array<int>).
    """
    import pyarrow as pa

    if not fake:
        if _image_lib() is None:
            raise NotImplementedError(
                "media decode requires an image library (PIL) not available "
                "in this environment; run with fake=True for the "
                "deterministic stub"
            )

        def decode_real(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
            from parquet4seastar_spark import _alloc

            _alloc.tune_allocator()
            Image = _image_lib()
            if Image is None:
                # loud, not lossy: on a heterogeneous cluster (driver has
                # PIL, executor doesn't) the per-blob except would
                # otherwise turn a missing dependency into silent all-zero
                # thumbnails for every row
                raise RuntimeError(
                    "PIL importable on the driver but missing on this "
                    "executor — install it cluster-wide or use fake=True"
                )
            for rb in batches:
                if rb.num_rows == 0:
                    continue
                blobs = rb.column(1).to_pylist()
                thumbs = pa.array(
                    [_decode_blob_thumb(Image, b or b"") for b in blobs],
                    type=pa.list_(pa.int32()),
                )
                yield pa.RecordBatch.from_arrays(
                    [rb.column(0).cast(pa.int64()), thumbs],
                    names=["doc_id", "thumb8x8"],
                )

        return media.select("doc_id", "media").mapInArrow(
            decode_real, schema="doc_id long, thumb8x8 array<int>"
        )

    def decode(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from parquet4seastar_spark import _alloc

        _alloc.tune_allocator()
        for rb in batches:
            if rb.num_rows == 0:
                continue
            tbl = pa.Table.from_batches([rb])
            blobs = tbl.column("media").combine_chunks().cast(pa.large_binary())
            n = len(blobs)
            bufs = blobs.buffers()
            offsets = np.frombuffer(bufs[1], dtype=np.int64, count=n + 1, offset=blobs.offset * 8)
            data = (
                np.frombuffer(bufs[2], dtype=np.uint8)
                if bufs[2] is not None
                else np.zeros(0, dtype=np.uint8)
            )
            starts = offsets[:-1] - offsets[0]
            lens = np.diff(offsets)
            seg = data[offsets[0] : offsets[-1]].astype(np.uint64)
            # position-weighted fold per payload: digest_i = sum over the
            # payload of byte * (pos_in_payload + 1) * PRIME, one reduceat
            within = np.arange(len(seg), dtype=np.uint64) - np.repeat(
                starts.astype(np.uint64), lens
            )
            val = seg * (within + np.uint64(1)) * np.uint64(1099511628211)
            # pad one zero so empty trailing payloads (starts == len) stay
            # legal reduceat indices WITHOUT clipping into the previous
            # payload's segment (clipping shortened the preceding non-empty
            # payload by one byte, making the digest depend on batch
            # composition); the lens>0 mask zeroes the empty segments
            val = np.append(val, np.uint64(0))
            digests = np.add.reduceat(val, starts) if n else np.zeros(0, dtype=np.uint64)
            digests = np.where(lens > 0, digests, np.uint64(0))
            # 8 bytes of digest tiled to an 8x8 thumbnail
            shifts = (np.arange(64, dtype=np.uint64) % 8) * np.uint64(8)
            thumb = ((digests[:, None] >> shifts[None, :]) & np.uint64(0xFF)).astype(np.int32)
            flat = pa.array(thumb.reshape(-1), type=pa.int32())
            offs = pa.py_buffer((np.arange(n + 1, dtype=np.int32) * 64).tobytes())
            thumbs = pa.Array.from_buffers(pa.list_(pa.int32()), n, [None, offs], children=[flat])
            yield pa.RecordBatch.from_arrays(
                [tbl.column("doc_id").combine_chunks().cast(pa.int64()), thumbs],
                names=["doc_id", "thumb8x8"],
            )

    return media.select("doc_id", "media").mapInArrow(
        decode, schema="doc_id long, thumb8x8 array<int>"
    )


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
