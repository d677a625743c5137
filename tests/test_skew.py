"""Skew handling: the salted pid must spread a pathologically skewed source
(one source = 90% of tokens, with some giant documents) evenly enough that
no single logical partition dominates — the property that keeps 1000-executor
runs from stalling on one straggler task (BASELINE.json:6)."""

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from orc_spark.pipeline import with_pid

SALT = 16


@pytest.fixture(scope="module")
def skewed_df(spark, tmp_path_factory):
    rng = np.random.RandomState(7)
    n = 4000
    # 90% of docs in one source; lengths heavy-tailed with a few giants
    src = np.where(rng.rand(n) < 0.9, "cc", rng.choice(["web", "books"], n))
    lens = np.clip(rng.lognormal(5.5, 1.4, n).astype(int), 1, 60_000)
    tbl = pa.table(
        {
            "doc_id": pa.array([f"d{i:08d}" for i in range(n)]),
            "tokens": pa.array([[1] * 3 for _ in range(n)], type=pa.list_(pa.int32())),
            "n_tok": pa.array(lens, type=pa.int32()),
            "source": pa.array(src),
        }
    )
    p = tmp_path_factory.mktemp("skew")
    pq.write_table(tbl, str(p / "t.parquet"))
    return spark.read.parquet(str(p))


def test_salt_spreads_dominant_source(skewed_df):
    pids = (
        with_pid(skewed_df, SALT)
        .groupBy("pid")
        .agg(F.sum("n_tok").alias("tok"))
        .collect()
    )
    total = sum(r["tok"] for r in pids)
    biggest = max(r["tok"] for r in pids)
    # unsalted, the 'cc' partition would hold ~90%; salted, no pid should
    # hold more than a few times the ideal share
    n_cc_pids = len([r for r in pids if r["pid"].startswith("cc#")])
    assert n_cc_pids == SALT  # every salt bucket of the hot source is used
    assert biggest / total < 4 / SALT


def test_salt_is_deterministic(skewed_df):
    a = sorted(with_pid(skewed_df, SALT).select("doc_id", "pid").collect())
    b = sorted(with_pid(skewed_df, SALT).select("doc_id", "pid").collect())
    assert a == b


@pytest.fixture(scope="module")
def giant_doc_df(spark, tmp_path_factory):
    """Adversary salt alone cannot fix: one source is a burst of giant
    documents — every salt bucket of it is >2x the cap."""
    n_hot, n_cold = 2000, 4000
    tbl = pa.table(
        {
            "doc_id": pa.array(
                [f"h{i:08d}" for i in range(n_hot)]
                + [f"c{i:08d}" for i in range(n_cold)]
            ),
            "tokens": pa.array(
                [[1] * 3] * (n_hot + n_cold), type=pa.list_(pa.int32())
            ),
            "n_tok": pa.array(
                [40_000] * n_hot + [100] * n_cold, type=pa.int32()
            ),
            "source": pa.array(["hot"] * n_hot + ["cold"] * n_cold),
        }
    )
    p = tmp_path_factory.mktemp("giant")
    pq.write_table(tbl, str(p / "t.parquet"))
    return spark.read.parquet(str(p))


def test_rebalance_caps_pid_token_mass(giant_doc_df):
    from orc_spark.pipeline import rebalance_by_tokens

    cap = 1_000_000  # hot source: 80M tokens over 16 salt buckets = 5M each
    dfp = with_pid(giant_doc_df, SALT)
    before = {
        r["pid"]: r["m"]
        for r in dfp.groupBy("pid").agg(F.sum("n_tok").alias("m")).collect()
    }
    assert max(before.values()) > 2 * cap  # salt alone leaves >2x stragglers

    out, splits = rebalance_by_tokens(dfp, cap)
    after = {
        r["pid"]: r["m"]
        for r in out.groupBy("pid").agg(F.sum("n_tok").alias("m")).collect()
    }
    # every overweight pid was split by its ceil(mass/cap) factor
    assert splits and all(pid.startswith("hot#") for pid in splits)
    assert all(k == -(-before[pid] // cap) for pid, k in splits.items())
    # sub-salting is uniform, not exact bin packing: allow sampling slack
    # over the largest-single-doc floor
    assert max(after.values()) <= 1.8 * cap
    # underweight pids untouched; total mass conserved
    assert all(after[pid] == m for pid, m in before.items() if pid.startswith("cold#"))
    assert sum(after.values()) == sum(before.values())


def test_rebalance_is_deterministic(giant_doc_df):
    from orc_spark.pipeline import rebalance_by_tokens

    dfp = with_pid(giant_doc_df, SALT)
    a, sa = rebalance_by_tokens(dfp, 1_000_000)
    b, sb = rebalance_by_tokens(dfp, 1_000_000)
    assert sa == sb
    assert sorted(a.select("doc_id", "pid").collect()) == sorted(
        b.select("doc_id", "pid").collect()
    )


def test_rebalance_resume_rederives_same_pids(giant_doc_df, tmp_path_factory):
    """Kill/resume with rebalance on: the mass aggregation runs on the FULL
    input before the resume filter, so a resumed run derives identical split
    pid names and only re-encodes what is missing."""
    from orc_spark.pipeline import decode_table, encode_table, verify_roundtrip
    from orc_spark.warehouse import Warehouse

    spark = giant_doc_df.sparkSession
    wh = str(tmp_path_factory.mktemp("rbres"))
    kwargs = dict(
        snapshot="rb",
        salt_buckets=SALT,
        stripe_tokens=500_000,
        max_pid_tokens=1_000_000,
    )
    m1 = encode_table(spark, giant_doc_df, wh, **kwargs)
    # simulate a killed run that committed only a third of the partitions
    w = Warehouse(wh)
    pids = sorted(m1["partitions"])
    keep = {p: {**m1["partitions"][p], "encode_s": -1.0} for p in pids[: len(pids) // 3]}
    import os

    os.remove(w.manifest_file("rb"))
    for p in pids[len(pids) // 3 :]:
        os.remove(m1["partitions"][p]["file"])
    w.commit("rb", keep, m1["schema"])

    m2 = encode_table(spark, giant_doc_df, wh, **kwargs)
    assert set(m2["partitions"]) == set(pids)  # identical split pid names
    for p in keep:
        assert m2["partitions"][p]["encode_s"] == -1.0  # committed: untouched
    res = verify_roundtrip(giant_doc_df, decode_table(spark, wh, snapshot="rb"))
    assert res["ok"]


def test_rebalanced_encode_roundtrips(giant_doc_df, tmp_path_factory):
    """The split pids flow through encode -> manifest -> decode unchanged."""
    from orc_spark.pipeline import decode_table, encode_table, verify_roundtrip

    wh = str(tmp_path_factory.mktemp("rbwh"))
    spark = giant_doc_df.sparkSession
    manifest = encode_table(
        spark,
        giant_doc_df,
        wh,
        snapshot="rb",
        salt_buckets=SALT,
        stripe_tokens=500_000,
        max_pid_tokens=1_000_000,
    )
    # split pids use '@' (distinct from with_pid's '#': a source name that
    # contains '#' must not make a split pid collide with a salt pid)
    assert any("@" in p for p in manifest["partitions"])
    assert all(
        p["n_tokens"] <= 1_800_000 for p in manifest["partitions"].values()
    )
    res = verify_roundtrip(giant_doc_df, decode_table(spark, wh, snapshot="rb"))
    assert res["ok"]
