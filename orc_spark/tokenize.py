"""Derive the canonical (doc_id, tokens, n_tok, source) table from the
driver-generated `documents` parquet — the engine's input shape
(BASELINE.json:15) — entirely JVM-side (no Python UDFs).

Tokenization is a deterministic whitespace split + h48(word) % VOCAB where
h48 is the repo-wide md5-prefix hash (textops._h48), i.e. a fixed
hash-vocabulary tokenizer: cheap, reproducible across runs and cluster
sizes, and — because DuckDB computes the identical md5 — every token id is
bit-reproducible by the SQL oracle, which is what lets the encode→decode
round-trip query carry a real DuckDB value-hash gate (decoded token sums
match the oracle's). At 100 TB this runs inside the scan stage (narrow, no
shuffle) and is fused by whole-stage codegen.

`replicate` amplifies the table for benchmarking: each replica gets a
distinct doc_id (suffix) so dedup/salting behave as on real data. Replication
is a crossJoin with a broadcast range — still narrow per input split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .textops import _h48

VOCAB = 50257


def tokens_from_documents(docs: DataFrame, replicate: int = 1) -> DataFrame:
    """documents(doc_id, text, lang, source, n_chars) -> (doc_id string,
    tokens array<int>, n_tok int, source string)."""
    words = F.split(F.col("text"), " ")
    toks = F.transform(words, lambda w: F.pmod(_h48(w), F.lit(VOCAB)).cast("int"))
    base = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        toks.alias("tokens"),
        F.col("source").cast("string").alias("source"),
    ).withColumn("n_tok", F.size("tokens").cast("int"))
    if replicate <= 1:
        return base.select("doc_id", "tokens", "n_tok", "source")
    reps = base.sparkSession.range(replicate).select(F.col("id").alias("rep"))
    return (
        base.crossJoin(F.broadcast(reps))
        .select(
            F.concat_ws("-", "doc_id", "rep").alias("doc_id"),
            "tokens",
            "n_tok",
            "source",
        )
    )


def read_documents(spark, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")
