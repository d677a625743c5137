"""export_orc sink: the warehouse round-trips through standalone ORC files
that the REFERENCE reader consumes directly — multiset-identical rows to
the engine's own decode."""

import glob

import pyarrow.orc as paorc
import pytest
from pyspark.sql import functions as F

from orc_spark.fixtures import tokens_arrow
from orc_spark.pipeline import decode_table, encode_table, export_orc


@pytest.fixture(scope="module")
def exported(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("orcsink")
    wh, out = str(base / "wh"), str(base / "orc")
    df = spark.createDataFrame(tokens_arrow(20_000).to_pandas())
    # one encode task, ~8k-row Arrow batches: each pid flushes a stripe per
    # batch -> genuinely multi-stripe pid files
    encode_table(
        spark, df, wh, snapshot="s1", salt_buckets=2, stripe_tokens=30_000,
        num_partitions=1,
    )
    metas = export_orc(spark, wh, out, snapshot="s1").collect()
    return spark, wh, out, metas


def test_export_writes_multistripe_files_per_pid(exported):
    spark, wh, out, metas = exported
    files = sorted(glob.glob(out + "/*.orc"))
    assert len(files) == len(metas) > 1
    assert sum(m["n_rows"] for m in metas) == 20_000
    # multi-stripe layout: file count is O(#pids), not O(#stripes)
    assert sum(m["stripes"] for m in metas) > len(files)
    assert any(m["stripes"] > 1 for m in metas)


def test_reference_reader_consumes_export(exported):
    spark, wh, out, metas = exported
    rows = []
    for f in sorted(glob.glob(out + "/*.orc")):
        t = paorc.ORCFile(f).read()
        assert t.schema.names == ["doc_id", "tokens", "n_tok", "source"]
        rows.extend(
            (r["doc_id"], tuple(r["tokens"]), r["n_tok"], r["source"])
            for r in t.to_pylist()
        )
    decoded = decode_table(spark, wh, snapshot="s1")
    expect = [
        (r["doc_id"], tuple(r["tokens"]), r["n_tok"], r["source"])
        for r in decoded.collect()
    ]
    assert sorted(rows) == sorted(expect)


def test_spark_native_reader_consumes_export(exported):
    spark, wh, out, metas = exported
    sdf = spark.read.orc(out + "/*.orc")
    assert sdf.count() == 20_000
    got = sdf.agg(F.sum("n_tok").alias("s")).collect()[0]["s"]
    expect = (
        decode_table(spark, wh, snapshot="s1")
        .agg(F.sum("n_tok").alias("s"))
        .collect()[0]["s"]
    )
    assert got == expect


def test_export_rejects_null_list_elements(tmp_path):
    import pyarrow as pa

    from orc_spark.orcexport import write_batch_file

    batch = pa.record_batch(
        [pa.array([[1, None]], type=pa.list_(pa.int32()))], names=["tokens"]
    )
    with pytest.raises(ValueError, match="null list ELEMENTS"):
        write_batch_file(str(tmp_path / "x.orc"), batch)


def test_two_readers_agree_on_fuzzed_compressed_files(spark, tmp_path):
    """Two independent reference readers (liborc C++ and Spark's Java
    orc-core) read fuzzed zstd-compressed files from our writer and agree
    with the source batch — including dictionary-favorable strings (low
    cardinality), nulls, and multi-stripe layouts. Two readers disagree
    with a broken writer more often than one."""
    import numpy as np
    import pyarrow as pa

    from orc_spark.orcexport import OrcFileWriter

    for seed in range(4):
        rng = np.random.default_rng(900 + seed)
        n = int(rng.integers(500, 4000))
        ints = pa.array(
            [None if rng.random() < 0.1 else int(v) for v in
             rng.integers(-(1 << 40), 1 << 40, n)], type=pa.int64()
        )
        words = pa.array(
            [None if rng.random() < 0.05 else "w%d" % v for v in
             rng.integers(0, 20, n)], type=pa.string()
        )
        lens = rng.integers(0, 9, n)
        offs = np.zeros(n + 1, dtype=np.int32)
        offs[1:] = np.cumsum(lens, dtype=np.int32)
        lists = pa.ListArray.from_arrays(
            pa.array(offs), pa.array(
                rng.integers(0, 50257, int(lens.sum()), dtype=np.int64
                             ).astype(np.int32), type=pa.int32())
        )
        batch = pa.record_batch([ints, words, lists], names=["v", "s", "tokens"])
        f = str(tmp_path / f"fz{seed}.orc")
        w = OrcFileWriter(f)  # default zstd
        w.add_stripe(batch.slice(0, n // 2))
        w.add_stripe(batch.slice(n // 2))
        w.close()
        ref = paorc.ORCFile(f).read()
        expect = pa.Table.from_batches([batch])
        assert ref.cast(expect.schema).equals(expect)
        got = spark.read.orc(f).collect()
        want = expect.to_pylist()
        key = lambda r: (str(r["v"]), str(r["s"]))
        assert sorted(
            [(r["v"], r["s"], tuple(r["tokens"])) for r in
             ({"v": x["v"], "s": x["s"], "tokens": x["tokens"]} for x in want)],
            key=lambda t: (str(t[0]), str(t[1]), t[2]),
        ) == sorted(
            [(r["v"], r["s"], tuple(r["tokens"])) for r in got],
            key=lambda t: (str(t[0]), str(t[1]), t[2]),
        )


def test_export_generic_events_warehouse(spark, tmp_path):
    """A generic-layout warehouse (events: int64 key, timestamp + double
    payload) exports to standalone ORC that BOTH reference readers consume
    row-identical to the engine's own decode."""
    wh, out = str(tmp_path / "wh"), str(tmp_path / "orc")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    encode_table(
        spark, ev, wh, snapshot="ev",
        key_col="event_id", source_col="event_type", weight_col=None,
        salt_buckets=2, stripe_tokens=300,
    )
    export_orc(spark, wh, out, snapshot="ev").collect()

    def key(r):
        return (r["event_id"], r["ts"], r["user_id"], r["event_type"], r["value"], r["props"])

    expect = sorted(key(r) for r in decode_table(spark, wh, "ev").collect())
    got_spark = sorted(key(r) for r in spark.read.orc(out + "/*.orc").collect())
    assert got_spark == expect
    rows = []
    for f in sorted(glob.glob(out + "/*.orc")):
        t = paorc.ORCFile(f).read()
        for r in t.to_pylist():
            rows.append((r["event_id"], r["ts"].replace(tzinfo=None), r["user_id"],
                         r["event_type"], r["value"], r["props"]))
    assert sorted(rows) == expect


def test_import_orc_roundtrip(spark, tmp_path):
    """Migration-in mirror of the export tests: foreign ORC files (written
    by Spark's own orc-core writer) ingest via pipeline.import_orc into a
    fresh warehouse whose decode is multiset-identical to the original
    DataFrame — and a full export->import cycle through OUR OWN exporter's
    files is equally lossless."""
    from orc_spark.pipeline import import_orc

    src = str(tmp_path / "foreign_orc")
    wh = str(tmp_path / "wh")
    df = spark.createDataFrame(tokens_arrow(5_000).to_pandas())
    df.write.mode("overwrite").orc(src)

    m = import_orc(
        spark, src, wh, snapshot="imp", salt_buckets=2, stripe_tokens=30_000
    )
    assert sum(p["n_rows"] for p in m["partitions"].values()) == 5_000

    def key(r):
        return (r["doc_id"], tuple(r["tokens"]), r["n_tok"], r["source"])

    expect = sorted(key(r) for r in df.collect())
    got = sorted(key(r) for r in decode_table(spark, wh, "imp").collect())
    assert got == expect

    # round 2: OUR exporter's ORC files feed import_orc (self-interchange)
    out2, wh2 = str(tmp_path / "orc2"), str(tmp_path / "wh2")
    export_orc(spark, wh, out2, snapshot="imp").collect()
    import_orc(
        spark, out2, wh2, snapshot="imp2", salt_buckets=2,
        stripe_tokens=30_000,
    )
    got2 = sorted(key(r) for r in decode_table(spark, wh2, "imp2").collect())
    assert got2 == expect
