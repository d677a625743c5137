"""tokstripe Python Data Source: the warehouse as a first-class Spark
format. Read-path contract: results identical to decode_table / the raw
table for every filter shape, with PLANNING-TIME pruning visible as the
task count. Write-path contract: atomic manifest commit, append-refusal,
overwrite, and exactly-once streaming across checkpoint replay."""

import os
import sys

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from orc_spark.datasource import register
from orc_spark.fixtures import tokens_arrow
from orc_spark.pipeline import decode_table, encode_table, verify_roundtrip
from orc_spark.warehouse import Warehouse


@pytest.fixture(scope="module")
def ds_wh(spark, tmp_path_factory):
    register(spark)
    wh = str(tmp_path_factory.mktemp("ds_wh"))
    df = spark.createDataFrame(tokens_arrow(2000, seed=42).to_pandas())
    encode_table(spark, df, wh, snapshot="s1", salt_buckets=4, stripe_tokens=20_000)
    return wh, df


def _fmt(spark, wh, **opts):
    r = spark.read.format("tokstripe").option("path", wh)
    for k, v in opts.items():
        r = r.option(k, v)
    return r


def test_full_scan_roundtrip(spark, ds_wh):
    wh, df = ds_wh
    got = _fmt(spark, wh).load()
    assert got.schema.simpleString() == df.schema.simpleString()
    assert got.exceptAll(df).count() == 0
    assert df.exceptAll(got).count() == 0


def test_pushed_filters_are_exact(spark, ds_wh):
    wh, df = ds_wh
    r = _fmt(spark, wh).load()
    cases = [
        lambda d: d.where(F.col("doc_id").isin("doc-0000001000", "doc-0000000042")),
        lambda d: d.where(F.col("source") == "books"),
        lambda d: d.where((F.col("n_tok") >= 100) & (F.col("n_tok") <= 200)),
        lambda d: d.where(F.col("n_tok") > 4000),   # strict: hint + residual
        lambda d: d.where(F.col("n_tok") < 3),
        lambda d: d.where((F.col("source") == "cc") & (F.col("n_tok") >= 50)),
    ]
    for i, c in enumerate(cases):
        got = c(r).drop("tokens")
        want = c(df).drop("tokens")
        assert got.exceptAll(want).count() == 0, i
        assert want.exceptAll(got).count() == 0, i


def test_planning_time_pruning_reduces_tasks(spark, ds_wh):
    wh, _ = ds_wh
    full = _fmt(spark, wh).load()
    n_full = full.rdd.getNumPartitions()
    n_src = full.where(F.col("source") == "books").rdd.getNumPartitions()
    n_point = full.where(F.col("doc_id") == "doc-0000001000").rdd.getNumPartitions()
    # source equality = partition-key prune (1 of 4 sources); point lookup =
    # range + sidecar bloom prune down to the single containing file
    assert n_src < n_full
    assert n_point <= 2
    # absent-but-in-range key: everything pruned at planning, 0 rows
    assert full.where(F.col("doc_id") == "doc-0000001000x").count() == 0


def test_narrowed_schema_reads_subset(spark, ds_wh):
    wh, df = ds_wh
    got = (
        spark.read.format("tokstripe")
        .option("path", wh)
        .schema("doc_id string, source string")
        .load()
    )
    assert got.columns == ["doc_id", "source"]
    want = df.select("doc_id", "source")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_batch_write_roundtrip_and_modes(spark, tmp_path):
    register(spark)
    wh = str(tmp_path / "wwh")
    df = spark.createDataFrame(tokens_arrow(800, seed=7).to_pandas())
    (
        df.repartition(4, "source")
        .write.format("tokstripe").mode("append")
        .option("path", wh).option("snapshot", "w1")
        .option("salt_buckets", "3").option("stripe_tokens", "20000")
        .save()
    )
    dec = decode_table(spark, wh, "w1")
    assert verify_roundtrip(df, dec)["ok"]
    man = Warehouse(wh).read_manifest("w1")
    assert man["layout"]["key_col"] == "doc_id"
    # append to a committed snapshot refuses
    with pytest.raises(Exception):
        df.write.format("tokstripe").mode("append").option("path", wh).option(
            "snapshot", "w1"
        ).save()
    # overwrite replaces
    df.limit(100).write.format("tokstripe").mode("overwrite").option(
        "path", wh
    ).option("snapshot", "w1").save()
    assert decode_table(spark, wh, "w1").count() == 100


def test_write_then_read_format_with_bloom_point_lookup(spark, tmp_path):
    register(spark)
    wh = str(tmp_path / "bwh")
    df = spark.createDataFrame(tokens_arrow(600, seed=3).to_pandas())
    df.write.format("tokstripe").mode("append").option("path", wh).option(
        "snapshot", "b1"
    ).option("salt_buckets", "4").save()
    r = _fmt(spark, wh, snapshot="b1").load()
    got = r.where(F.col("doc_id") == "doc-0000000300")
    assert got.count() == 1
    assert got.rdd.getNumPartitions() <= 2


def test_stream_reader_tails_snapshots(spark, tmp_path):
    register(spark)
    wh = str(tmp_path / "tail_wh")
    t = tokens_arrow(400, seed=5)
    df = spark.createDataFrame(t.to_pandas())
    d1 = df.where(F.col("n_tok") % 2 == 0)
    d2 = df.where(F.col("n_tok") % 2 == 1)
    encode_table(spark, d1, wh, snapshot="t1", salt_buckets=2, stripe_tokens=50_000)

    out = str(tmp_path / "out")

    def drain():
        q = (
            spark.readStream.format("tokstripe")
            .option("path", wh)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "tail_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    drain()
    got1 = spark.read.parquet(out)
    assert verify_roundtrip(d1, got1)["ok"]

    # a second snapshot commits; the restarted stream consumes ONLY it
    encode_table(spark, d2, wh, snapshot="t2", salt_buckets=2, stripe_tokens=50_000)
    drain()
    got2 = spark.read.parquet(out)
    assert verify_roundtrip(df, got2)["ok"]  # union, no duplicates


def test_stream_writer_exactly_once(spark, tmp_path):
    register(spark)
    inp = tmp_path / "in"
    inp.mkdir()
    t = tokens_arrow(300, seed=9)
    pq.write_table(t.slice(0, 150), str(inp / "part-0.parquet"))
    pq.write_table(t.slice(150), str(inp / "part-1.parquet"))
    wh = str(tmp_path / "swh")
    orig = spark.createDataFrame(t.to_pandas())

    def run():
        q = (
            spark.readStream.schema(orig.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(inp))
            .writeStream.format("tokstripe")
            .option("path", wh)
            .option("snapshot", "sw")
            .option("salt_buckets", "2")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run()
    w = Warehouse(wh)
    snaps = sorted(
        f[5:-5]
        for f in os.listdir(w.manifest_dir)
        if f.startswith("snap-sw-e")
    )
    assert len(snaps) >= 2  # one epoch per file
    dec = None
    for s in snaps:
        d = decode_table(spark, wh, snapshot=s)
        dec = d if dec is None else dec.unionAll(d)
    assert verify_roundtrip(orig, dec)["ok"]

    # replay with the same checkpoint: no new epochs, no duplicates
    run()
    snaps2 = sorted(
        f[5:-5]
        for f in os.listdir(w.manifest_dir)
        if f.startswith("snap-sw-e")
    )
    assert snaps2 == snaps
    assert verify_roundtrip(orig, dec)["ok"]
