"""Changelog reads (cdc.py): per-commit insert/delete row emission from
manifest diffs, replayable back onto the starting snapshot, evolution-
aware, and failing loudly on expired pre-images."""

import pytest
from pyspark.sql import functions as F

from orc_spark import deletes
from orc_spark.cdc import changes_between
from orc_spark.evolution import evolve_schema
from orc_spark.maintenance import expire_snapshots
from orc_spark.pipeline import decode_table, encode_table
from orc_spark.warehouse import Warehouse


def _df(spark, n=300):
    return (
        spark.range(n)
        .select(
            F.format_string("d%05d", F.col("id")).alias("doc_id"),
            F.transform(
                F.sequence(F.lit(1), (F.col("id") % 19) + 2),
                lambda i: ((i * 13 + F.col("id")) % 400).cast("int"),
            ).alias("tokens"),
            F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias("source"),
        )
        .withColumn("n_tok", F.size("tokens").cast("int"))
    )


@pytest.fixture()
def wh(spark, tmp_path):
    path = str(tmp_path / "wh")
    encode_table(spark, _df(spark), path, snapshot="c0",
                 salt_buckets=4, stripe_tokens=800)
    return path


def test_changelog_delete_then_upsert(spark, wh):
    d1 = deletes.delete_where(spark, wh, ("n_tok", 5, 8))["snapshot_id"]
    upd = (
        decode_table(spark, wh, snapshot=d1)
        .where("doc_id >= 'd00100' AND doc_id < 'd00110'")
        .withColumn("tokens", F.expr("transform(tokens, x -> CAST(x+1 AS INT))"))
    )
    u1 = deletes.upsert(spark, wh, upd, snapshot=d1)["snapshot_id"]
    ch = changes_between(spark, wh, "c0").cache()
    # delete commit: exactly the predicate's rows, as of c0
    dels1 = ch.where(
        (F.col("_commit_snapshot") == d1) & (F.col("_change_type") == "delete")
    )
    assert dels1.count() == _df(spark).where("n_tok BETWEEN 5 AND 8").count()
    assert dels1.where("n_tok NOT BETWEEN 5 AND 8").count() == 0
    # upsert commit: old versions out, new versions in, same keys
    dels2 = ch.where(
        (F.col("_commit_snapshot") == u1) & (F.col("_change_type") == "delete")
    ).collect()
    ins2 = ch.where(
        (F.col("_commit_snapshot") == u1) & (F.col("_change_type") == "insert")
    ).collect()
    n_upd = upd.count()
    assert len(dels2) == len(ins2) == n_upd
    assert {r["doc_id"] for r in dels2} == {r["doc_id"] for r in ins2}
    old = {r["doc_id"]: r["tokens"] for r in dels2}
    new = {r["doc_id"]: r["tokens"] for r in ins2}
    for k in old:
        assert new[k] == [x + 1 for x in old[k]]
    # REPLAY: applying the changelog to c0 reproduces the final table
    model = {
        r["doc_id"]: tuple(r["tokens"])
        for r in decode_table(spark, wh, snapshot="c0").collect()
    }
    for r in sorted(ch.collect(), key=lambda r: (r["_commit_ordinal"],
                                                 r["_change_type"] != "delete")):
        if r["_change_type"] == "delete":
            del model[r["doc_id"]]
        else:
            model[r["doc_id"]] = tuple(r["tokens"])
    final = {
        r["doc_id"]: tuple(r["tokens"])
        for r in decode_table(spark, wh, snapshot=u1).collect()
    }
    assert model == final
    ch.unpersist()


def test_changelog_append_only_and_empty_range(spark, wh):
    encode_table(spark, _df(spark, 40), wh, snapshot="c1",
                 salt_buckets=2, stripe_tokens=800, resume=False)
    ch = changes_between(spark, wh, "c0", "c1")
    assert ch.where("_change_type = 'insert'").count() == 40
    assert ch.where("_change_type = 'delete'").count() == 0
    empty = changes_between(spark, wh, "c1", "c1")
    assert empty.count() == 0
    assert "_change_type" in empty.columns


def test_changelog_emits_to_snapshot_schema(spark, wh, tmp_path):
    w = str(tmp_path / "wh_evo")
    encode_table(spark, _df(spark, 60), w, snapshot="e0", salt_buckets=2,
                 stripe_tokens=800, weight_col=None)
    ev = evolve_schema(w, snapshot="e0", rename={"n_tok": "tok_count"},
                       add={"lang": "string"})["snapshot_id"]
    new = spark.createDataFrame(
        [("z-1", [3, 4], "s0", 2, "aa")],
        "doc_id string, tokens array<int>, source string, "
        "tok_count int, lang string",
    )
    u = deletes.upsert(spark, w, new, snapshot=ev, salt_buckets=2)["snapshot_id"]
    # delete a pre-evolution row so the delete pre-image needs renaming
    d = deletes.delete_where(spark, w, ("doc_id", ["d00005"]), snapshot=u)[
        "snapshot_id"
    ]
    ch = changes_between(spark, w, "e0", d)
    assert set(ch.columns) == {
        "doc_id", "tokens", "source", "tok_count", "lang",
        "_change_type", "_commit_snapshot", "_commit_ordinal",
    }
    ins = ch.where("_change_type = 'insert'").collect()
    assert len(ins) == 1 and ins[0]["lang"] == "aa"
    dl = ch.where("_change_type = 'delete'").collect()
    assert len(dl) == 1 and dl[0]["doc_id"] == "d00005"
    assert dl[0]["tok_count"] is not None  # renamed forward
    assert dl[0]["lang"] is None           # added later: null pre-image


def test_streaming_cdc_source(spark, wh, tmp_path):
    from orc_spark.datasource import register

    register(spark)
    d1 = deletes.delete_where(spark, wh, ("n_tok", 5, 8))["snapshot_id"]
    upd = (
        decode_table(spark, wh, snapshot=d1)
        .where("doc_id >= 'd00100' AND doc_id < 'd00105'")
        .withColumn("tokens", F.expr("transform(tokens, x -> CAST(x+1 AS INT))"))
    )
    u1 = deletes.upsert(spark, wh, upd, snapshot=d1)["snapshot_id"]
    out = str(tmp_path / "cdc_sink")
    ckpt = str(tmp_path / "cdc_ckpt")

    def run_batch():
        q = (
            spark.readStream.format("tokstripe")
            .option("path", wh).option("mode", "cdc").load()
            .writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    run_batch()
    got = spark.read.parquet(out)
    n_del1 = _df(spark).where("n_tok BETWEEN 5 AND 8").count()
    n_upd = upd.count()
    assert n_upd > 0
    # replays the whole log: base inserts + delete pre-images + upsert pair
    assert got.where("_change_type = 'insert'").count() == 300 + n_upd
    assert got.where("_change_type = 'delete'").count() == n_del1 + n_upd
    # the stream's post-base changes equal the batch changelog exactly
    batch = changes_between(spark, wh, "c0", u1)
    stream_tail = got.where("_commit_snapshot <> 'c0'").select(*batch.columns)
    assert stream_tail.exceptAll(batch).count() == 0
    assert batch.exceptAll(stream_tail).count() == 0
    # incremental restart from the checkpoint: only NEW commits emit
    d2 = deletes.delete_where(spark, wh, ("doc_id", ["d00200"]), snapshot=u1)
    run_batch()
    got2 = spark.read.parquet(out)
    assert got2.count() == got.count() + 1
    new_row = got2.where("_commit_snapshot = '%s'" % d2["snapshot_id"]).collect()
    assert len(new_row) == 1 and new_row[0]["_change_type"] == "delete"
    assert new_row[0]["doc_id"] == "d00200"
    # batch reader refuses cdc mode with a pointer to the right APIs
    with pytest.raises(Exception, match="cdc"):
        spark.read.format("tokstripe").option("path", wh).option(
            "mode", "cdc"
        ).load().count()


def test_changelog_errors(spark, wh):
    d1 = deletes.delete_where(spark, wh, ("n_tok", 5, 8))["snapshot_id"]
    with pytest.raises(ValueError, match="newer than"):
        changes_between(spark, wh, d1, "c0")
    with pytest.raises(ValueError, match="not in commit log"):
        changes_between(spark, wh, "nope")
    # expiring a mid-range snapshot kills its pre-images -> loud error
    u = deletes.upsert(
        spark, wh,
        decode_table(spark, wh).limit(1)
        .withColumn("tokens", F.expr("transform(tokens, x -> CAST(x+1 AS INT))")),
        snapshot=d1,
    )["snapshot_id"]
    expire_snapshots(wh, [d1])
    with pytest.raises(ValueError, match="expired"):
        changes_between(spark, wh, "c0", u)
