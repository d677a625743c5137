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
