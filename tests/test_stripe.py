"""Stripe encode/decode: all column types, projection, nulls, dictionary
threshold behavior, and the size gate at stripe granularity."""

import numpy as np
import pyarrow as pa
import pytest

from orc_spark.fixtures import tokens_arrow
from orc_spark.stripe import decode_stripe, encode_stripe, footer_from_json, footer_to_json


@pytest.fixture(scope="module")
def canonical():
    tbl = tokens_arrow(1000)
    batch = tbl.to_batches()[0]
    blob, footer = encode_stripe(batch)
    return tbl, batch, blob, footer


def test_roundtrip_all_columns(canonical):
    _, batch, blob, footer = canonical
    out = decode_stripe(blob, footer_from_json(footer_to_json(footer)))
    for name in batch.schema.names:
        assert out.column(name).cast(batch.column(name).type).equals(batch.column(name)), name


def test_encodings_match_reference_heuristics(canonical):
    """source (card 5) dictionary-encodes; doc_id (unique) does not — the
    0.8-threshold behavior observed from liborc (SURVEY.md [PROBE-1])."""
    _, _, _, footer = canonical
    assert footer["columns"]["source"]["encoding"] == "DICTIONARY"
    assert footer["columns"]["doc_id"]["encoding"] in ("DIRECT", "FSST")
    assert footer["columns"]["tokens"]["encoding"] == "DIRECT"  # ints never dict


def test_size_gate(canonical):
    """Compressed bytes <= reference liborc zstd B/tok on identical data."""
    _, _, blob, footer = canonical
    ntok = footer["columns"]["tokens"]["stats"]["n_values"]
    assert len(blob) / ntok <= 1.469, f"{len(blob)/ntok:.3f} B/tok > reference 1.469"


def test_projection_reads_only_requested(canonical):
    _, batch, blob, footer = canonical
    out = decode_stripe(blob, footer, columns=["n_tok", "source"])
    assert out.schema.names == ["n_tok", "source"]
    assert out.column("n_tok").cast(pa.int32()).equals(batch.column("n_tok"))


def test_nullable_columns():
    b = pa.RecordBatch.from_arrays(
        [
            pa.array([1, None, 3, None, 5] * 50, type=pa.int32()),
            pa.array(["a", None, "bb", "a", None] * 50),
            pa.array([[1, 2], [3], None, [], [5, 6, 7]] * 50, type=pa.list_(pa.int32())),
        ],
        ["i", "s", "l"],
    )
    blob, footer = encode_stripe(b)
    out = decode_stripe(blob, footer)
    for name in b.schema.names:
        assert out.column(name).cast(b.column(name).type).equals(b.column(name)), name


def test_all_null_column():
    b = pa.RecordBatch.from_arrays([pa.array([None] * 10, type=pa.int64())], ["x"])
    blob, footer = encode_stripe(b)
    out = decode_stripe(blob, footer)
    assert out.column("x").null_count == 10


def test_empty_batch():
    b = pa.RecordBatch.from_arrays(
        [pa.array([], type=pa.int32()), pa.array([], type=pa.string())], ["i", "s"]
    )
    blob, footer = encode_stripe(b)
    out = decode_stripe(blob, footer)
    assert out.num_rows == 0


def test_int64_and_negative_values():
    rng = np.random.RandomState(3)
    b = pa.RecordBatch.from_arrays(
        [pa.array(rng.randint(-(2**40), 2**40, 1000), type=pa.int64())], ["x"]
    )
    blob, footer = encode_stripe(b)
    out = decode_stripe(blob, footer)
    assert out.column("x").equals(b.column("x"))


def test_empty_and_null_token_lists_roundtrip():
    """Docs with zero tokens and null token arrays survive the stripe path."""
    import pyarrow as pa

    from orc_spark.stripe import decode_stripe, encode_stripe

    batch = pa.record_batch(
        {
            "doc_id": pa.array(["a", "b", "c", "d"]),
            "tokens": pa.array(
                [[1, 2, 3], [], None, [7]], type=pa.list_(pa.int32())
            ),
            "n_tok": pa.array([3, 0, None, 1], type=pa.int32()),
            "source": pa.array(["x", "x", "y", "y"]),
        }
    )
    blob, footer = encode_stripe(batch)
    out = decode_stripe(blob, footer)
    assert out.column(1).to_pylist() == [[1, 2, 3], [], None, [7]]
    assert out.column(2).to_pylist() == [3, 0, None, 1]


def _bits(arr: pa.Array) -> np.ndarray:
    np_vals = np.asarray(arr.to_numpy(zero_copy_only=False))
    return np_vals.view("u4" if np_vals.dtype == np.float32 else "u8")


def test_float_double_roundtrip_bit_exact():
    """float32/float64 columns decode BIT-identical — NaN payload, +/-inf,
    and -0.0 included (both float methods are lossless byte transforms)."""
    rng = np.random.RandomState(11)
    d = rng.normal(100, 3, 4096)
    d[1], d[2], d[3] = np.nan, np.inf, -0.0
    f = rng.normal(0, 1, 4096).astype(np.float32)
    b = pa.record_batch(
        {"d": pa.array(d, type=pa.float64()), "f": pa.array(f, type=pa.float32())}
    )
    blob, footer = encode_stripe(b)
    out = decode_stripe(blob, footer_from_json(footer_to_json(footer)))
    for c in ("d", "f"):
        assert out.column(c).type == b.column(c).type
        assert np.array_equal(_bits(out.column(c)), _bits(b.column(c)))
    # NaN in the stream must suppress the min/max stats (conservative pruning)
    assert footer["columns"]["d"]["stats"]["min"] is None
    assert footer["columns"]["f"]["stats"]["min"] is not None


def test_float_split_beats_raw_on_real_valued_data():
    """The chooser's cost trial picks byte-stream-split on real-number data
    and the encoded stream (post-zstd) is smaller than compressed raw."""
    from orc_spark import chooser
    from orc_spark.codecs.compression import compress
    from orc_spark.codecs.floats import encode_floats

    vals = np.random.RandomState(5).normal(1e4, 17.0, 8192)
    assert chooser.choose_float(vals)["method"] == "split"
    raw_c = len(compress(encode_floats(vals, "raw"), "zstd"))
    split_c = len(compress(encode_floats(vals, "split"), "zstd"))
    assert split_c < raw_c


def test_timestamp_roundtrip_and_delta_compression():
    """timestamp[us] columns ride the int pipeline: values roundtrip exactly
    (type preserved) and near-arithmetic streams land in ~0 bytes via DELTA."""
    n = 4096
    ts = (np.arange(n) * 1_000_003 + 1_700_000_000_000_000).astype("datetime64[us]")
    nullable = pa.array(
        [None if i % 9 == 0 else int(ts[i].astype("int64")) for i in range(n)],
        type=pa.int64(),
    ).cast(pa.timestamp("us"))
    b = pa.record_batch(
        {"ts": pa.array(ts, type=pa.timestamp("us")), "tsn": nullable}
    )
    blob, footer = encode_stripe(b)
    out = decode_stripe(blob, footer_from_json(footer_to_json(footer)))
    assert out.column("ts").equals(b.column("ts"))
    assert out.column("tsn").equals(b.column("tsn"))
    data = [s for s in footer["columns"]["ts"]["streams"] if s["kind"] == "DATA"][0]
    assert data["clen"] < n // 8  # DELTA collapsed the arithmetic stream
    # integer epoch stats exist for time-range stripe pruning
    assert footer["columns"]["ts"]["stats"]["min"] == int(ts[0].astype("int64"))


def test_list_float_roundtrip_bit_exact():
    """list<float> (the embeddings shape): values bit-identical, nulls and
    empty lists preserved, LENGTH+DATA layout like the token column."""
    rng = np.random.RandomState(7)
    rows = [rng.normal(0, 1, 16).astype(np.float32) for _ in range(300)]
    rows[5] = np.array([], dtype=np.float32)
    lst = [None if i % 50 == 0 else r.tolist() for i, r in enumerate(rows)]
    b = pa.record_batch({"emb": pa.array(lst, type=pa.list_(pa.float32()))})
    blob, footer = encode_stripe(b)
    out = decode_stripe(blob, footer_from_json(footer_to_json(footer)))
    got = out.column("emb")
    assert got.type == pa.list_(pa.float32())
    assert got.to_pylist() == b.column("emb").to_pylist()
    flat_a = np.asarray(b.column("emb").drop_null().flatten().to_numpy(zero_copy_only=False))
    flat_b = np.asarray(got.drop_null().flatten().to_numpy(zero_copy_only=False))
    assert np.array_equal(flat_a.view("u4"), flat_b.view("u4"))
