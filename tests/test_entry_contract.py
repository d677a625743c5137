"""Mini-driver: replicates the grading harness — run every __spark_entry__
queries() entry at sf0.01 and compare row-multisets (columns sorted by name)
against the DuckDB oracle_sql(). This is the correctness gate rehearsal."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm(v):
    if isinstance(v, float):
        assert not math.isnan(v)
        return round(v, 9)
    return v


def _rows(cols, data):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in data)


ORACLED = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, duck, name):
    q = entrymod.queries()[name]
    sdf = q(spark, SF_DIR)
    scols = sdf.columns
    srows = _rows(scols, [tuple(r) for r in sdf.collect()])

    res = duck.sql(entrymod.oracle_sql()[name])
    dcols = res.columns
    drows = _rows(dcols, res.fetchall())

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), (
        f"{name}: row count {len(srows)} vs oracle {len(drows)}"
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(srows, drows)) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


def test_every_query_listed_or_rows_only():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    rows_only = set(qs) - set(oracles)
    # EVERY query is oracled: even codec_plan (engine-internal chooser
    # decisions) is hash-gated via a pinned literal VALUES oracle
    assert rows_only == set()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert all(r["verify_missing"] == 0 and r["verify_extra"] == 0 for r in rows)
    assert all(r["n_tokens"] > 0 for r in rows)
