"""Flagship engine queries for the driver contract: encode→decode→verify
round-trips over tokens derived from the testdata `documents` table, plus a
codec-selection report.

`encode_roundtrip_summary` is the hard-gate entry: it returns per-source
aggregates computed FROM THE DECODED table (row counts, token counts, exact
token sums, an md5 rollup of the sorted doc_ids) plus the bit-equality
verify counters — all reproducible by a DuckDB oracle that re-derives the
same tokens from the raw documents parquet (the tokenizer is md5-prefix
hashed for exactly this reason, see tokenize.py). A wrong encode, decode, or
verify changes the value hash; the oracle's verify columns are literal 0s.
"""

from __future__ import annotations

import shutil
import tempfile

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession, functions as F

from .pipeline import decode_table, encode_table, verify_roundtrip
from .stripe import encode_stripe
from .tokenize import read_documents, tokens_from_documents

METRICS_SCHEMA = (
    "pid string, n_rows long, n_tokens long, enc_bytes long, "
    "bytes_per_token_f4 long, verify_missing long, verify_extra long"
)

SUMMARY_SCHEMA = (
    "source string, n_rows long, n_tokens long, token_sum long, "
    "doc_ids_md5 string, verify_missing long, verify_extra long"
)

PLAN_SCHEMA = (
    "column string, type string, encoding string, stream string, "
    "codec string, compression string, fsst boolean"
)


def encode_roundtrip_metrics(
    spark: SparkSession,
    sf_dir: str,
    salt_buckets: int = 8,
    stripe_tokens: int = 2_000_000,
) -> DataFrame:
    """Full pipeline on (doc_id, tokens, n_tok, source) derived from
    documents: salted repartition → mapInArrow encode → manifest commit →
    decode → bit-equality verify. Returns one row per committed partition
    with lineage + metrics; verify counts are repeated on each row."""
    wh = tempfile.mkdtemp(prefix="orc_spark_wh_")
    try:
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
    finally:
        shutil.rmtree(wh, ignore_errors=True)
    return spark.createDataFrame(rows, METRICS_SCHEMA)


def encode_roundtrip_summary(
    spark: SparkSession,
    sf_dir: str,
    salt_buckets: int = 8,
    stripe_tokens: int = 2_000_000,
) -> DataFrame:
    """Oracle-checkable round-trip: encode → decode → per-source aggregates
    of the DECODED rows. Every output value flows through the full engine
    (tokenize → salt → stripe encode → manifest → stripe decode), so the
    DuckDB value-hash comparison certifies the pipeline end to end."""
    wh = tempfile.mkdtemp(prefix="orc_spark_wh_")
    try:
        df = tokens_from_documents(read_documents(spark, sf_dir))
        encode_table(
            spark,
            df,
            wh,
            snapshot="flagship",
            salt_buckets=salt_buckets,
            stripe_tokens=stripe_tokens,
        )
        decoded = decode_table(spark, wh, snapshot="flagship")
        res = verify_roundtrip(df, decode_table(spark, wh, snapshot="flagship"))
        # integer token sum: exact and order-free, unlike double sums
        tok_sum = F.aggregate(
            "tokens", F.lit(0).cast("long"), lambda acc, x: acc + x
        )
        agg_rows = (
            decoded.groupBy("source")
            .agg(
                F.count("*").alias("n_rows"),
                F.sum("n_tok").cast("long").alias("n_tokens"),
                F.sum(tok_sum).cast("long").alias("token_sum"),
                F.md5(
                    F.concat_ws(",", F.array_sort(F.collect_list("doc_id")))
                ).alias("doc_ids_md5"),
            )
            .collect()
        )
        rows = [
            (
                r["source"],
                int(r["n_rows"]),
                int(r["n_tokens"]),
                int(r["token_sum"]),
                r["doc_ids_md5"],
                int(res["missing"]),
                int(res["extra"]),
            )
            for r in agg_rows
        ]
    finally:
        shutil.rmtree(wh, ignore_errors=True)
    return spark.createDataFrame(rows, SUMMARY_SCHEMA)


def codec_plan_report(
    spark: SparkSession, sf_dir: str, probe_rows: int = 4096
) -> DataFrame:
    """The codec auto-selection decisions (SURVEY.md §2.4) on the derived
    tokens table: one row per (column, stream) with chosen encoding/codec/
    compression. The single-stripe probe runs EXECUTOR-side (limit →
    mapInArrow) — only the ~8 plan rows ever reach the driver, so the query
    is scale-safe: at 100 TB it still encodes exactly one probe stripe."""
    df = (
        tokens_from_documents(read_documents(spark, sf_dir))
        .orderBy("doc_id")
        .limit(probe_rows)
        .coalesce(1)  # one probe stripe → one plan-row batch
    )

    def probe(batches):
        batches = list(batches)
        if not batches:
            return
        tbl = pa.Table.from_batches(batches).combine_chunks()
        if tbl.num_rows == 0:
            return
        _, footer = encode_stripe(tbl)
        rows = []
        for col, meta in footer["columns"].items():
            for s in meta["streams"]:
                rows.append(
                    {
                        "column": col,
                        "type": meta["type"],
                        "encoding": meta["encoding"],
                        "stream": s["kind"],
                        "codec": s.get("codec", "bytes"),
                        "compression": s["comp"],
                        "fsst": bool(s.get("fsst", False)),
                    }
                )
        yield pa.RecordBatch.from_pylist(rows)

    return df.mapInArrow(probe, PLAN_SCHEMA)
