"""Flagship engine queries for the driver contract: encode→decode→verify
round-trips over tokens derived from the testdata `documents` table, plus a
codec-selection report. These are the non-SQL-expressible entries in
__spark_entry__.queries() (rows-only checks)."""

from __future__ import annotations

import tempfile

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession

from .pipeline import decode_table, encode_table, verify_roundtrip
from .stripe import encode_stripe
from .tokenize import read_documents, tokens_from_documents

METRICS_SCHEMA = (
    "pid string, n_rows long, n_tokens long, enc_bytes long, "
    "bytes_per_token_f4 long, verify_missing long, verify_extra long"
)


def encode_roundtrip_metrics(
    spark: SparkSession,
    sf_dir: str,
    salt_buckets: int = 8,
    stripe_tokens: int = 2_000_000,
) -> DataFrame:
    """Full pipeline on (doc_id, tokens, n_tok, source) derived from
    documents: salted repartition → mapInArrow encode → manifest commit →
    decode → exceptAll bit-equality. Returns one row per committed partition
    with lineage + metrics; verify counts are repeated on each row."""
    wh = tempfile.mkdtemp(prefix="orc_spark_wh_")
    df = tokens_from_documents(read_documents(spark, sf_dir))
    manifest = encode_table(
        spark,
        df,
        wh,
        snapshot="flagship",
        salt_buckets=salt_buckets,
        stripe_tokens=stripe_tokens,
    )
    res = verify_roundtrip(df, decode_table(spark, wh, snapshot="flagship"))
    rows = [
        (
            pid,
            int(p["n_rows"]),
            int(p["n_tokens"]),
            int(p["enc_bytes"]),
            int(p["enc_bytes"] * 10_000 // max(p["n_tokens"], 1)),
            int(res["missing"]),
            int(res["extra"]),
        )
        for pid, p in sorted(manifest["partitions"].items())
    ]
    return spark.createDataFrame(rows, METRICS_SCHEMA)


def codec_plan_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The codec auto-selection decisions (SURVEY.md §2.4) on the derived
    tokens table: one row per (column, stream) with chosen encoding/codec/
    compression. Driver-side single-stripe probe — the same chooser code the
    distributed encode path runs per stripe."""
    df = tokens_from_documents(read_documents(spark, sf_dir)).orderBy("doc_id")
    tbl = pa.Table.from_pandas(df.toPandas(), preserve_index=False)
    batch = tbl.combine_chunks().to_batches()[0]
    _, footer = encode_stripe(batch)
    rows = []
    for col, meta in footer["columns"].items():
        for s in meta["streams"]:
            rows.append(
                (
                    col,
                    meta["type"],
                    meta["encoding"],
                    s["kind"],
                    s.get("codec", "bytes"),
                    s["comp"],
                    bool(s.get("fsst", False)),
                )
            )
    return spark.createDataFrame(
        rows,
        "column string, type string, encoding string, stream string, "
        "codec string, compression string, fsst boolean",
    )
