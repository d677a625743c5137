"""Whole-stripe property test: any mixed-type RecordBatch (nulls, empty
strings/lists, unicode, negative and 64-bit-boundary ints, dictionary- and
direct-encodable strings) must round-trip encode_stripe -> decode_stripe
bit-exactly, including under column projection."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from orc_spark.stripe import decode_stripe, encode_stripe

_ints = st.one_of(
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.integers(min_value=-100, max_value=100),
    st.sampled_from([0, 1, -1, 2**62, -(2**62), 2**31 - 1, -(2**31)]),
    st.none(),
)
_strings = st.one_of(
    st.text(max_size=12),
    st.sampled_from(["", "aaa", "aaa", "東京", "naïve", "x" * 40]),
    st.none(),
)
_tokens = st.one_of(
    st.lists(st.integers(min_value=0, max_value=2**31 - 1), max_size=8),
    st.none(),
)


@st.composite
def batches(draw):
    n = draw(st.integers(min_value=0, max_value=120))
    return pa.record_batch(
        [
            pa.array(draw(st.lists(_ints, min_size=n, max_size=n)), type=pa.int64()),
            pa.array(draw(st.lists(_strings, min_size=n, max_size=n)), type=pa.string()),
            pa.array(draw(st.lists(_tokens, min_size=n, max_size=n)), type=pa.list_(pa.int32())),
        ],
        names=["v", "s", "tokens"],
    )


@settings(max_examples=60, deadline=None)
@given(batches())
def test_stripe_roundtrip_mixed(batch):
    blob, footer = encode_stripe(batch)
    out = decode_stripe(blob, footer)
    assert out.num_rows == batch.num_rows
    for name in batch.schema.names:
        assert out.column(name).cast(batch.column(name).type).equals(
            batch.column(name)
        ), name


@settings(max_examples=25, deadline=None)
@given(batches())
def test_stripe_roundtrip_projection(batch):
    blob, footer = encode_stripe(batch)
    out = decode_stripe(blob, footer, columns=["s"])
    assert out.schema.names == ["s"]
    assert out.column("s").cast(pa.string()).equals(batch.column("s"))


def test_stripe_all_null_columns():
    batch = pa.record_batch(
        [
            pa.array([None, None], type=pa.int64()),
            pa.array([None, None], type=pa.string()),
            pa.array([None, None], type=pa.list_(pa.int32())),
        ],
        names=["v", "s", "tokens"],
    )
    blob, footer = encode_stripe(batch)
    out = decode_stripe(blob, footer)
    for name in batch.schema.names:
        assert out.column(name).null_count == 2


def test_stripe_int64_boundaries_roundtrip():
    vals = np.array(
        [0, 1, -1, 2**63 - 1, -(2**63), 2**62, -(2**62) - 1], dtype=np.int64
    )
    batch = pa.record_batch([pa.array(vals, type=pa.int64())], names=["v"])
    blob, footer = encode_stripe(batch)
    out = decode_stripe(blob, footer)
    assert np.array_equal(np.asarray(out.column("v")), vals)
