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
from pyspark.sql import DataFrame, SparkSession, functions as F

META_SCHEMA = "doc_id string, kind string, n_bytes long, first_byte int, md5_prefix string"
FEATURE_DIM = 16
FEATURE_SCHEMA = f"doc_id string, features array<float>"
FRAME_SCHEMA = "doc_id string, frame_idx int, frame_offset long"


def binarize_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stand-in multimodal table: utf-8 text payloads as binary + kind tag.
    (Real pipelines read payloads via spark.read.format('binaryFile').)"""
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit("text").alias("kind"),
    )


def extract_meta(df: DataFrame) -> DataFrame:
    """Typed metadata from opaque payloads — vectorized pandas over Arrow
    batches; the pattern a real magic-number sniffer / EXIF reader uses."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payload.str.len().astype("int64"),
                    "first_byte": payload.map(
                        lambda b: b[0] if len(b) else -1
                    ).astype("int32"),
                    "md5_prefix": payload.map(
                        lambda b: hashlib.md5(b).hexdigest()[:16]
                    ),
                }
            )

    return df.mapInPandas(run, META_SCHEMA)


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

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf["payload"]:
                d = hashlib.md5(b).digest()
                raw = (d * ((dim * 2) // len(d) + 1))[: dim * 2]
                v = np.frombuffer(raw, dtype=np.uint16).astype(np.float32)
                feats.append(v / 65535.0)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    return df.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Frame-sampling plumbing for video-like payloads: emits one row per
    sampled 'frame' offset (the fan-out shape of real frame extraction —
    1 input row → many output rows, still partition-local)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, offs = [], [], []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                n = max(1, len(b) // every_n_bytes)
                for i in range(n):
                    ids.append(doc_id)
                    idxs.append(i)
                    offs.append(i * every_n_bytes)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="string"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_offset": pd.Series(offs, dtype="int64"),
                }
            )

    return df.mapInPandas(run, FRAME_SCHEMA)


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-surface wrapper: binarize -> extract_meta (oracle: octet_length
    + ascii of the text the payload was built from)."""
    return extract_meta(binarize_documents(spark, sf_dir)).select(
        "doc_id", "n_bytes", "first_byte"
    )
