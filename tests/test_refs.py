"""Named refs (warehouse.py): Iceberg tag/branch analogs — atomic pointer
files resolvable anywhere a snapshot name goes, immutable tags, movable
branches, and retention protection against expire_snapshots."""

import pytest
from pyspark.sql import functions as F

from orc_spark import deletes
from orc_spark.maintenance import expire_snapshots
from orc_spark.metadata import files_table
from orc_spark.pipeline import decode_table, encode_table
from orc_spark.warehouse import Warehouse


def _df(spark, n=120):
    return (
        spark.range(n)
        .select(
            F.format_string("d%05d", F.col("id")).alias("doc_id"),
            F.array(F.lit(1).cast("int"), (F.col("id") % 7).cast("int")).alias("tokens"),
            F.concat(F.lit("s"), (F.col("id") % 2).cast("string")).alias("source"),
        )
        .withColumn("n_tok", F.size("tokens").cast("int"))
    )


@pytest.fixture()
def wh(spark, tmp_path):
    path = str(tmp_path / "wh")
    encode_table(spark, _df(spark), path, snapshot="v1", salt_buckets=2,
                 stripe_tokens=200)
    return path


def test_tag_resolves_everywhere(spark, wh):
    w = Warehouse(wh)
    w.set_ref("prod", "v1", kind="tag")
    assert w.resolve_snapshot("prod") == "v1"
    assert decode_table(spark, wh, snapshot="prod").count() == 120
    # a later delete moves CURRENT; the tag still reads the full table
    deletes.delete_where(spark, wh, ("n_tok", 2, 2))
    assert decode_table(spark, wh, snapshot="prod").count() == 120
    assert decode_table(spark, wh).count() < 120
    # metadata + format resolve too
    assert files_table(spark, wh, "prod").count() > 0
    from orc_spark.datasource import register

    register(spark)
    fmt = (
        spark.read.format("tokstripe")
        .option("path", wh).option("snapshot", "prod").load()
    )
    assert fmt.count() == 120


def test_tag_immutable_branch_movable(spark, wh):
    w = Warehouse(wh)
    w.set_ref("rel", "v1", kind="tag")
    with pytest.raises(ValueError, match="immutable"):
        w.set_ref("rel", "v1", kind="tag")
    d = deletes.delete_where(spark, wh, ("n_tok", 2, 2))["snapshot_id"]
    b = w.set_ref("dev", "v1", kind="branch")
    assert w.get_ref("dev")["snapshot"] == "v1"
    w.set_ref("dev", d, kind="branch")  # branches advance
    assert w.resolve_snapshot("dev") == d
    with pytest.raises(ValueError, match="kind"):
        w.set_ref("dev", d, kind="tag")
    with pytest.raises(ValueError, match="no manifest"):
        w.set_ref("x", "never-committed")
    with pytest.raises(ValueError, match="bad ref name"):
        w.set_ref("snap-v1", "v1")
    w.delete_ref("rel")
    assert w.get_ref("rel") is None
    with pytest.raises(ValueError, match="no ref"):
        w.delete_ref("rel")


def test_refs_protect_expiry(spark, wh):
    w = Warehouse(wh)
    w.set_ref("keep", "v1", kind="tag")
    deletes.delete_where(spark, wh, ("n_tok", 2, 2))  # CURRENT moves on
    with pytest.raises(ValueError, match="pinned by ref"):
        expire_snapshots(wh, ["v1"])
    w.delete_ref("keep")
    expire_snapshots(wh, ["v1"])
    assert w.read_manifest("v1") is None


def test_committed_snapshot_wins_over_ref(spark, wh):
    w = Warehouse(wh)
    d = deletes.delete_where(spark, wh, ("n_tok", 2, 2))["snapshot_id"]
    # a ref named like an EXISTING snapshot never shadows it
    w.set_ref("v1x", d, kind="tag")
    assert w.resolve_snapshot("v1") == "v1"
    assert w.resolve_snapshot("v1x") == d


def test_update_where_and_refs_table(spark, wh):
    from orc_spark.metadata import refs_table

    w = Warehouse(wh)
    res = deletes.update_where(
        spark, wh, ("n_tok", 2, 2),
        {"tokens": "transform(tokens, x -> CAST(x + 100 AS INT))"},
    )
    got = decode_table(spark, wh, snapshot=res["snapshot_id"])
    n_match = _df(spark).where("n_tok = 2").count()
    assert res["n_upserted"] == n_match > 0
    assert got.count() == 120  # update, not delete
    assert got.where("n_tok = 2").count() == n_match
    row = got.where("n_tok = 2").limit(1).collect()[0]
    assert all(t >= 100 for t in row["tokens"])
    # untouched rows keep original payloads
    assert got.where("n_tok != 2").where(
        F.exists("tokens", lambda t: t >= 100)
    ).count() == 0
    with pytest.raises(ValueError, match="SET column"):
        deletes.update_where(spark, wh, ("n_tok", 2, 2), {"nope": "1"})
    # refs_table reflects refs with their log ordinals
    w.set_ref("prod", "v1", kind="tag")
    w.set_ref("dev", res["snapshot_id"], kind="branch")
    rt = {r["name"]: r for r in refs_table(spark, wh).collect()}
    assert rt["prod"]["kind"] == "tag" and rt["prod"]["ordinal"] == 0
    assert rt["dev"]["snapshot_id"] == res["snapshot_id"]
    assert rt["dev"]["ordinal"] is not None


def test_branch_scoped_writes(spark, wh):
    """Iceberg branch-commit semantics: writes with branch= advance the
    branch ref only; main (CURRENT) is untouched until a fast-forward
    publish — the write-audit-publish flow."""
    w = Warehouse(wh)
    w.set_ref("dev", "v1", kind="branch")
    d = deletes.delete_where(spark, wh, ("n_tok", 2, 2), branch="dev")
    # CURRENT untouched, branch advanced, base came from the ref
    assert w.current_snapshot_id() == "v1"
    assert w.resolve_snapshot("dev") == d["snapshot_id"]
    assert decode_table(spark, wh).count() == 120
    n_dev = decode_table(spark, wh, snapshot="dev").count()
    assert n_dev == 120 - d["n_deleted"] < 120
    # chained branch write bases on the advanced ref automatically
    u = deletes.update_where(
        spark, wh, ("n_tok", 1, 1),
        {"tokens": "transform(tokens, x -> CAST(x+50 AS INT))"},
        branch="dev",
    )
    assert w.resolve_snapshot("dev") == u["snapshot_id"]
    assert w.current_snapshot_id() == "v1"
    # audit on the branch, then PUBLISH: fast-forward CURRENT
    audited = decode_table(spark, wh, snapshot="dev")
    assert audited.count() == n_dev
    w.rollback(w.resolve_snapshot("dev"))
    assert decode_table(spark, wh).count() == n_dev
    # guard rails: unknown branch without a base; tag as branch
    with pytest.raises(ValueError, match="does not exist"):
        deletes.delete_where(spark, wh, ("n_tok", 3, 3), branch="nope")
    w.set_ref("rel", "v1", kind="tag")
    with pytest.raises(ValueError, match="tag"):
        deletes.delete_where(spark, wh, ("n_tok", 3, 3), branch="rel")
