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
