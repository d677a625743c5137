"""Predicate pushdown: manifest file-level + stripe-stats + row-level
pruning in decode_table must be exactly transparent (pruned result ==
unpruned result + filter) and must actually skip work when the layout
clusters the predicate column."""

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from orc_spark.pipeline import decode_table, encode_table, stripe_matches
from orc_spark.stripe import footer_from_json
from orc_spark.warehouse import Warehouse


def test_stripe_matches_int_stats():
    footer = {"columns": {"n_tok": {"stats": {"min": 100, "max": 200}}}}
    assert stripe_matches(footer, "n_tok", 150, 300)
    assert stripe_matches(footer, "n_tok", 0, 100)  # touches min
    assert stripe_matches(footer, "n_tok", 200, 999)  # touches max
    assert not stripe_matches(footer, "n_tok", 201, 999)
    assert not stripe_matches(footer, "n_tok", 0, 99)
    # unknown column / no stats: conservative match
    assert stripe_matches(footer, "other", 0, 1)
    assert stripe_matches({"columns": {"s": {"stats": {}}}}, "s", 0, 1)


def _clustered_df(spark, n=40_000):
    """Single-source table whose arrival order is sorted by n_tok, so
    stripes get disjoint-ish n_tok stats ranges (a time-ordered corpus).
    Lengths step up every 400 rows; with ~8k-row Arrow batches each stripe
    flush covers a narrow, ascending n_tok band."""
    return (
        spark.range(n)
        .select(
            F.format_string("d%06d", F.col("id")).alias("doc_id"),
            F.transform(
                F.sequence(F.lit(1), (F.col("id") / F.lit(400)).cast("int") + 2),
                lambda i: (i * 7 % 101).cast("int"),
            ).alias("tokens"),
            F.lit("src").alias("source"),
        )
        .withColumn("n_tok", F.size("tokens").cast("int"))
        .select("doc_id", "tokens", "n_tok", "source")
        .coalesce(1)
    )


def test_stripe_pruning_transparent_and_effective(spark, tmp_path):
    wh = str(tmp_path / "wh")
    df = _clustered_df(spark)
    encode_table(
        spark, df, wh, snapshot="s1", salt_buckets=1, stripe_tokens=20_000,
        num_partitions=1,
    )
    lo, hi = 5, 20
    full = decode_table(spark, wh, snapshot="s1")
    pruned = decode_table(spark, wh, snapshot="s1", predicate=("n_tok", lo, hi))
    expect = sorted(
        (r["doc_id"], r["n_tok"], tuple(r["tokens"]))
        for r in full.where(F.col("n_tok").between(lo, hi)).collect()
    )
    got = sorted(
        (r["doc_id"], r["n_tok"], tuple(r["tokens"])) for r in pruned.collect()
    )
    assert got == expect and len(got) > 0
    # the sorted layout must let stripe stats actually skip stripes
    files = Warehouse(wh).committed_files("s1")
    footers = [
        footer_from_json(str(f))
        for path in files
        for f in pq.read_table(path, columns=["footer"]).column("footer")
    ]
    n_match = sum(stripe_matches(f, "n_tok", lo, hi) for f in footers)
    assert len(footers) >= 4, "layout did not produce multiple stripes"
    assert n_match < len(footers), "no stripe was prunable"


def test_file_pruning_via_manifest_doc_id(spark, tmp_path):
    wh = str(tmp_path / "wh")
    # two sources -> distinct pids; doc_ids are source-prefixed so the
    # manifest [min,max] ranges separate by source
    df = (
        spark.range(400)
        .select(
            F.concat(
                F.when(F.col("id") % 2 == 0, F.lit("a")).otherwise(F.lit("b")),
                F.format_string("%06d", F.col("id")),
            ).alias("doc_id"),
            F.array(F.lit(1), (F.col("id") % 100).cast("int")).alias("tokens"),
            F.when(F.col("id") % 2 == 0, F.lit("alpha"))
            .otherwise(F.lit("beta"))
            .alias("source"),
        )
        .withColumn("n_tok", F.size("tokens").cast("int"))
        .select("doc_id", "tokens", "n_tok", "source")
    )
    encode_table(spark, df, wh, snapshot="s1", salt_buckets=2)
    m = Warehouse(wh).read_manifest("s1")
    lo, hi = "a", "a~"  # only source-alpha ids
    keep = [
        p for p in m["partitions"].values()
        if not (p["max_doc_id"] < lo or p["min_doc_id"] > hi)
    ]
    assert 0 < len(keep) < len(m["partitions"]), "manifest ranges not prunable"
    pruned = decode_table(spark, wh, snapshot="s1", predicate=("doc_id", lo, hi))
    rows = pruned.collect()
    assert len(rows) == 200
    assert all(r["doc_id"].startswith("a") for r in rows)
    # fully-disjoint range: empty result without a job
    none = decode_table(spark, wh, snapshot="s1", predicate=("doc_id", "z", "zz"))
    assert none.count() == 0


def test_predicate_column_not_in_projection(spark, tmp_path):
    wh = str(tmp_path / "wh")
    df = _clustered_df(spark, n=500)
    encode_table(spark, df, wh, snapshot="s1", salt_buckets=1, stripe_tokens=5_000)
    out = decode_table(
        spark, wh, snapshot="s1", columns=["doc_id"], predicate=("n_tok", 3, 6)
    )
    assert out.columns == ["doc_id"]
    full = decode_table(spark, wh, snapshot="s1")
    expect = {r["doc_id"] for r in full.where(F.col("n_tok").between(3, 6)).collect()}
    assert {r["doc_id"] for r in out.collect()} == expect and expect


def test_bad_predicate_column_raises(spark, tmp_path):
    wh = str(tmp_path / "wh")
    df = _clustered_df(spark, n=50)
    encode_table(spark, df, wh, snapshot="s1", salt_buckets=1)
    with pytest.raises(ValueError, match="predicate column"):
        decode_table(spark, wh, snapshot="s1", predicate=("nope", 0, 1))


def _two_source_df(spark, n=2_000):
    return (
        spark.range(n)
        .select(
            F.format_string("d%06d", F.col("id")).alias("doc_id"),
            F.transform(
                F.sequence(F.lit(1), (F.col("id") % 50).cast("int") + 2),
                lambda i: (i * 7 % 101).cast("int"),
            ).alias("tokens"),
            F.when(F.col("id") % 3 == 0, F.lit("alpha"))
            .when(F.col("id") % 3 == 1, F.lit("beta"))
            .otherwise(F.lit("gamma"))
            .alias("source"),
        )
        .withColumn("n_tok", F.size("tokens").cast("int"))
        .select("doc_id", "tokens", "n_tok", "source")
    )


def test_composite_predicate_conjunction_and_in_set(spark, tmp_path):
    """Conjunction [(source IN-set), (n_tok between)] must equal the
    unpruned decode + both filters, and the source IN-set must prune
    whole files via the pid prefix (partition-key pruning)."""
    wh = str(tmp_path / "wh")
    encode_table(spark, _two_source_df(spark), wh, snapshot="s1", salt_buckets=2)
    metrics = {}
    got = decode_table(
        spark,
        wh,
        snapshot="s1",
        predicate=[("source", ("alpha", "gamma")), ("n_tok", 10, 30)],
        prune_metrics=metrics,
    )
    full = decode_table(spark, wh, snapshot="s1")
    expect = sorted(
        (r["doc_id"], r["source"], r["n_tok"])
        for r in full.where(
            F.col("source").isin("alpha", "gamma") & F.col("n_tok").between(10, 30)
        ).collect()
    )
    rows = sorted((r["doc_id"], r["source"], r["n_tok"]) for r in got.collect())
    assert rows == expect and len(rows) > 0
    # beta's files (1/3 of pids) must never have been opened — and some
    # must survive, or the equality above compared empty sets
    assert 0 < metrics["files_pruned"] < metrics["files_total"]
    assert metrics["stripes_seen"].value > 0


def test_in_set_predicate_on_doc_id_prunes_files(spark, tmp_path):
    """IN-set on doc_id: file pruned when no member hits its manifest
    range; surviving rows are exactly the set members."""
    wh = str(tmp_path / "wh")
    df = (
        spark.range(400)
        .select(
            F.concat(
                F.when(F.col("id") % 2 == 0, F.lit("a")).otherwise(F.lit("b")),
                F.format_string("%06d", F.col("id")),
            ).alias("doc_id"),
            F.array(F.lit(1), (F.col("id") % 100).cast("int")).alias("tokens"),
            F.when(F.col("id") % 2 == 0, F.lit("alpha"))
            .otherwise(F.lit("beta"))
            .alias("source"),
        )
        .withColumn("n_tok", F.size("tokens").cast("int"))
        .select("doc_id", "tokens", "n_tok", "source")
    )
    encode_table(spark, df, wh, snapshot="s1", salt_buckets=2)
    want = ["a000002", "a000100"]
    metrics = {}
    out = decode_table(
        spark, wh, snapshot="s1", predicate=("doc_id", want), prune_metrics=metrics
    )
    assert sorted(r["doc_id"] for r in out.collect()) == want
    # all-b files have manifest ranges above/below the a-ids -> pruned
    assert metrics["files_pruned"] > 0


def test_empty_snapshot_raises_even_with_predicate(spark, tmp_path):
    """'nothing committed' is a caller error; only 'all files pruned'
    returns an empty result (regression: the two were conflated)."""
    wh = str(tmp_path / "wh")
    encode_table(spark, _clustered_df(spark, n=50), wh, snapshot="s1", salt_buckets=1)
    with pytest.raises(ValueError, match="no committed files"):
        decode_table(spark, wh, snapshot="nope", predicate=("n_tok", 0, 1))


def test_malformed_predicates_raise(spark, tmp_path):
    wh = str(tmp_path / "wh")
    encode_table(spark, _clustered_df(spark, n=50), wh, snapshot="s1", salt_buckets=1)
    with pytest.raises(ValueError, match="empty IN-set"):
        decode_table(spark, wh, snapshot="s1", predicate=("doc_id", []))
    with pytest.raises(ValueError, match="neither"):
        decode_table(spark, wh, snapshot="s1", predicate=("n_tok", 5))
    with pytest.raises(ValueError, match="array column"):
        decode_table(spark, wh, snapshot="s1", predicate=("tokens", 0, 1))
