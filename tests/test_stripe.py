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
