"""Multimodal columns: image/audio/video payloads as opaque `binary` columns
with typed metadata, processed by Arrow-batched pandas stages (mapInPandas).

The decode step itself (JPEG/PNG/audio codecs) is STUBBED — the libs are not
in this container — behind `decode_media` (NotImplementedError) with a
clearly-marked deterministic fake (`fake_decode_features`) so the Spark-side
plumbing is real and testable: schema handling, Arrow batch shapes, UDF
signatures, and partition behavior all match what a real decoder would use.

Scale notes: payloads never leave their partition (all stages are narrow
mapInPandas); batch memory is bounded by
spark.sql.execution.arrow.maxRecordsPerBatch × mean payload size. On a real
corpus, set maxRecordsPerBatch low for video, high for thumbnails.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession, functions as F

META_SCHEMA = "doc_id string, kind string, n_bytes long, first_byte int, md5_prefix string"
FEATURE_DIM = 16
FEATURE_SCHEMA = f"doc_id string, features array<float>"
FRAME_SCHEMA = "doc_id string, frame_idx int, frame_offset long"


def _binary_buffers(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(offsets, data) numpy views over an Arrow binary array's buffers —
    the zero-copy path that lets payload metadata extraction stay fully
    vectorized (no per-row Python over the blobs)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    odt = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
    offsets = np.frombuffer(arr.buffers()[1], dtype=odt)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    buf = arr.buffers()[2]
    data = (
        np.frombuffer(buf, dtype=np.uint8)
        if buf is not None and len(buf)
        else np.empty(0, dtype=np.uint8)
    )
    return offsets, data


def binarize_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stand-in multimodal table: utf-8 text payloads as binary + kind tag.
    (Real pipelines read payloads via spark.read.format('binaryFile').)"""
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit("text").alias("kind"),
    )


def extract_meta(df: DataFrame) -> DataFrame:
    """Typed metadata from opaque payloads — Arrow batches decomposed to
    numpy buffer views (offsets/data), so lengths and first bytes are pure
    vector ops; the pattern a real magic-number sniffer / EXIF reader uses.
    Only md5 (per-row by nature) loops, over zero-copy memoryviews."""

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            pay = batch.column(batch.schema.get_field_index("payload"))
            offsets, data = _binary_buffers(pay)
            lens = np.diff(offsets)
            starts = np.minimum(offsets[:-1], max(len(data) - 1, 0))
            first = np.where(
                lens > 0,
                data[starts] if len(data) else np.int32(-1),
                np.int32(-1),
            ).astype(np.int32)
            mv = memoryview(data)
            md5s = [
                hashlib.md5(mv[s:e]).hexdigest()[:16]
                for s, e in zip(offsets[:-1].tolist(), offsets[1:].tolist())
            ]
            yield pa.record_batch(
                {
                    "doc_id": batch.column(
                        batch.schema.get_field_index("doc_id")
                    ),
                    "kind": batch.column(batch.schema.get_field_index("kind")),
                    "n_bytes": pa.array(lens, type=pa.int64()),
                    "first_byte": pa.array(first, type=pa.int32()),
                    "md5_prefix": pa.array(md5s, type=pa.string()),
                }
            )

    return df.mapInArrow(run, META_SCHEMA)


def decode_media(payload: bytes, kind: str) -> np.ndarray:
    """REAL decode entry point — unavailable in this container (no PIL/
    ffmpeg/soundfile). Swap in the actual decoder on a full cluster image."""
    raise NotImplementedError(
        f"media decoding for kind={kind!r} requires image/audio libs not "
        "present in this environment; use fake_decode_features for plumbing"
    )


def fake_decode_features(df: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """DETERMINISTIC FAKE decoder: md5-derived feature vector per payload.
    Exercises the exact plumbing of a real embedding/decode stage (binary in,
    fixed-dim float array out, Arrow-batched)."""

    reps = (dim * 2) // 16 + 1  # md5 digests are 16 bytes

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # md5 is per-row by nature; the feature ASSEMBLY is batched —
            # one concat of all digests, one frombuffer, one reshape/scale
            digests = b"".join(hashlib.md5(b).digest() for b in pdf["payload"])
            mat = (
                np.frombuffer(digests, dtype=np.uint8)
                .reshape(len(pdf), 16)[:, None, :]
                .repeat(reps, axis=1)
                .reshape(len(pdf), reps * 16)[:, : dim * 2]
            )
            v = mat.copy().view(np.uint16).astype(np.float32) / 65535.0
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "features": list(v)}
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Frame-sampling plumbing for video-like payloads: emits one row per
    sampled 'frame' offset (the fan-out shape of real frame extraction —
    1 input row → many output rows, still partition-local). The fan-out is
    the vectorized repeat/arange idiom — no per-frame Python loop."""

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            pay = batch.column(batch.schema.get_field_index("payload"))
            offsets, _ = _binary_buffers(pay)
            lens = np.diff(offsets)
            n_frames = np.maximum(lens // every_n_bytes, 1)
            ends = np.cumsum(n_frames)
            starts = ends - n_frames
            idxs = (np.arange(ends[-1] if len(ends) else 0) - np.repeat(starts, n_frames)).astype(np.int32)
            ids = batch.column(batch.schema.get_field_index("doc_id")).take(
                pa.array(np.repeat(np.arange(len(n_frames)), n_frames))
            )
            yield pa.record_batch(
                {
                    "doc_id": ids.cast(pa.string()),
                    "frame_idx": pa.array(idxs, type=pa.int32()),
                    "frame_offset": pa.array(
                        idxs.astype(np.int64) * every_n_bytes, type=pa.int64()
                    ),
                }
            )

    return df.mapInArrow(run, FRAME_SCHEMA)


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-surface wrapper: binarize -> extract_meta (oracle: octet_length
    + the UTF-8 leading byte of the text the payload was built from)."""
    return extract_meta(binarize_documents(spark, sf_dir)).select(
        "doc_id", "n_bytes", "first_byte"
    )


def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-surface wrapper for the frame-sampling fan-out: the offsets are
    a pure function of payload length, so the whole mapInArrow stage is
    hash-gated by a SQL oracle (one row per 64-byte 'frame')."""
    return frame_sample(binarize_documents(spark, sf_dir)).select(
        "doc_id", "frame_idx", "frame_offset"
    )
