"""Iceberg-style metadata tables (metadata.py): snapshots_table must report
the commit log in order with correct status and manifest-summed lineage
totals; files_table must mirror the manifests per pid and stay consistent
with snapshots_table; expiry must flip status without disturbing ordinals
(commit-log positions are stream offsets and must stay stable)."""

import pytest
from pyspark.sql import functions as F

from orc_spark.maintenance import compact_snapshots, expire_snapshots
from orc_spark.metadata import files_table, snapshots_table
from orc_spark.pipeline import decode_table, encode_table
from orc_spark.warehouse import Warehouse


def _df(spark, lo, hi):
    return (
        spark.range(lo, hi)
        .select(
            F.format_string("d%05d", F.col("id")).alias("doc_id"),
            F.transform(
                F.sequence(F.lit(1), (F.col("id") % 13) + 2),
                lambda i: ((i * 7 + F.col("id")) % 997).cast("int"),
            ).alias("tokens"),
            F.concat(F.lit("s"), (F.col("id") % 2).cast("string")).alias("source"),
        )
        .withColumn("n_tok", F.size("tokens").cast("int"))
    )


@pytest.fixture(scope="module")
def wh2(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("meta_wh"))
    encode_table(spark, _df(spark, 0, 400), wh, snapshot="a",
                 salt_buckets=4, stripe_tokens=800)
    encode_table(spark, _df(spark, 400, 700), wh, snapshot="b",
                 salt_buckets=4, stripe_tokens=800)
    return wh


def test_snapshots_table_order_status_and_totals(spark, wh2):
    rows = snapshots_table(spark, wh2).orderBy("ordinal").collect()
    assert [r["snapshot_id"] for r in rows] == ["a", "b"]
    assert [r["status"] for r in rows] == ["committed", "current"]
    assert rows[1]["parent"] == "a"
    # lineage totals must equal the data actually decodable
    for r, (lo, hi) in zip(rows, [(0, 400), (400, 700)]):
        dec = decode_table(spark, wh2, r["snapshot_id"])
        want = dec.agg(
            F.count("*").alias("n"), F.sum("n_tok").alias("t")
        ).collect()[0]
        assert (r["n_rows"], r["n_tokens"]) == (want["n"], want["t"]) == (
            hi - lo,
            want["t"],
        )
        assert r["enc_bytes"] > 0 and r["n_stripes"] >= r["n_partitions"] > 0


def test_files_table_mirrors_manifests_and_sums_to_snapshots(spark, wh2):
    m = Warehouse(wh2).read_manifest("a")
    ft = files_table(spark, wh2, "a").collect()
    assert {r["pid"] for r in ft} == set(m["partitions"])
    for r in ft:
        p = m["partitions"][r["pid"]]
        assert r["file"] == p["file"]
        assert (r["n_rows"], r["n_tokens"], r["enc_bytes"]) == (
            p["n_rows"], p["n_tokens"], p["enc_bytes"]
        )
        assert r["min_key"] <= r["max_key"]  # doc_id string range recorded
    snap_a = snapshots_table(spark, wh2).where("snapshot_id = 'a'").collect()[0]
    assert sum(r["n_rows"] for r in ft) == snap_a["n_rows"]
    assert sum(r["enc_bytes"] for r in ft) == snap_a["enc_bytes"]


def test_files_table_default_is_current_and_list_selects(spark, wh2):
    cur = files_table(spark, wh2).select("snapshot_id").distinct().collect()
    assert [r["snapshot_id"] for r in cur] == ["b"]
    both = files_table(spark, wh2, ["a", "b"])
    assert both.select("snapshot_id").distinct().count() == 2


def test_expiry_flips_status_keeps_ordinals(spark, tmp_path):
    wh = str(tmp_path / "wh")
    encode_table(spark, _df(spark, 0, 200), wh, snapshot="e0",
                 salt_buckets=2, stripe_tokens=800)
    encode_table(spark, _df(spark, 200, 400), wh, snapshot="e1",
                 salt_buckets=2, stripe_tokens=800)
    compact_snapshots(spark, wh, ["e0", "e1"], "main")
    expire_snapshots(wh, ["e0", "e1"])
    rows = {r["snapshot_id"]: r for r in snapshots_table(spark, wh).collect()}
    assert rows["e0"]["status"] == rows["e1"]["status"] == "expired"
    assert rows["e0"]["n_rows"] is None  # manifest gone, counts unknown
    assert (rows["e0"]["ordinal"], rows["e1"]["ordinal"]) == (0, 1)
    assert rows["main"]["status"] == "current"
    assert rows["main"]["n_rows"] == 400  # concat preserved lineage sums
    with pytest.raises(ValueError, match="expired"):
        files_table(spark, wh, "e0")


def test_files_table_no_current_raises(spark, tmp_path):
    with pytest.raises(ValueError, match="no committed snapshot"):
        files_table(spark, str(tmp_path / "empty_wh"))


def test_snapshots_table_operation_column(spark, tmp_path):
    from orc_spark import deletes
    from orc_spark.evolution import evolve_schema
    from orc_spark.maintenance import materialize_deletes
    from pyspark.sql import functions as F

    wh = str(tmp_path / "wh_ops")
    df = (
        spark.range(80)
        .select(
            F.format_string("d%04d", F.col("id")).alias("doc_id"),
            F.array(F.lit(1).cast("int"), (F.col("id") % 5).cast("int")).alias("tokens"),
            F.lit("s0").alias("source"),
        )
        .withColumn("n_tok", F.size("tokens").cast("int"))
    )
    encode_table(spark, df, wh, snapshot="a", salt_buckets=2, stripe_tokens=64)
    d = deletes.delete_where(spark, wh, ("n_tok", 2, 2))["snapshot_id"]
    u = deletes.upsert(
        spark, wh,
        decode_table(spark, wh).limit(2), snapshot=d, salt_buckets=2,
    )["snapshot_id"]
    ev = evolve_schema(wh, snapshot=u, add={"x": "int"})["snapshot_id"]
    mat = materialize_deletes(spark, wh, snapshot=ev)["snapshot_id"]
    ops = {
        r["snapshot_id"]: r["operation"]
        for r in snapshots_table(spark, wh).collect()
        if r["operation"] is not None
    }
    assert ops["a"] == "append"
    assert ops[d] == "delete" and ops[u] == "upsert"
    assert ops[ev] == "evolve" and ops[mat] == "replace"
