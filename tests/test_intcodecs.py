"""Frame-of-reference and standalone bit-pack stream codecs."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from orc_spark.codecs.intcodecs import (
    decode_int_stream,
    encode_int_stream,
)
from orc_spark.fixtures import codec_stress_columns

I64 = np.iinfo(np.int64)


@pytest.mark.parametrize("codec", ["rle2", "for", "bitpack"])
@pytest.mark.parametrize("name", list(codec_stress_columns(100).keys()))
def test_stress(codec, name):
    a = codec_stress_columns()[name]
    for signed in {True, bool(a.min(initial=0) < 0)}:
        if not signed and a.min(initial=0) < 0:
            continue
        enc = encode_int_stream(a, codec, signed)
        dec = decode_int_stream(enc, len(a), codec, signed)
        assert np.array_equal(dec, a), (codec, name, signed)


def test_for_beats_bitpack_on_offset_data():
    """FOR's reason to exist: large common offset, small local range."""
    rng = np.random.RandomState(0)
    a = (10**12 + rng.randint(0, 100, 10_000)).astype(np.int64)
    f = encode_int_stream(a, "for", True)
    b = encode_int_stream(a, "bitpack", True)
    assert len(f) < len(b) * 0.3


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(min_value=I64.min // 2, max_value=I64.max // 2), max_size=600),
    st.sampled_from(["for", "bitpack"]),
)
def test_property(xs, codec):
    a = np.array(xs, dtype=np.int64)
    enc = encode_int_stream(a, codec, True)
    assert np.array_equal(decode_int_stream(enc, len(a), codec, True), a)


def test_chooser_runs_real_cost_trial():
    """choose_int must pick by measured size, not a hard-wired default:
    rle2 wins on runs/deltas; on incompressible white noise all three are
    within a few header bytes and rle2 keeps the tie."""
    import numpy as np

    from orc_spark.chooser import choose_int

    rng = np.random.RandomState(9)
    assert choose_int(np.arange(10_000, dtype=np.int64))["codec"] == "rle2"
    noise = rng.randint(0, 2**31, 10_000).astype(np.int64)
    assert choose_int(noise)["codec"] in ("rle2", "for", "bitpack")
    # the chosen codec must actually be the smallest on the trial sample
    from orc_spark.codecs.intcodecs import encode_int_stream

    plan = choose_int(noise)
    sizes = {
        c: len(encode_int_stream(noise[:4096], c, plan["signed"]))
        for c in ("rle2", "for", "bitpack")
    }
    assert sizes[plan["codec"]] == min(sizes.values())
