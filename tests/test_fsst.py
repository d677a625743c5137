"""FSST round-trip + adversarial escape handling."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from orc_spark.codecs import fsst


def roundtrip(data: bytes) -> bytes:
    table = fsst.train(data)
    enc = fsst.compress(data, table)
    assert fsst.decompress(enc) == data
    return enc


def test_doc_ids():
    data = b"".join(f"doc-{i:010d}".encode() for i in range(2000))
    enc = roundtrip(data)
    assert len(enc) < len(data) * 0.5  # template strings compress hard


def test_escape_torture():
    # 0xff is both the escape code and a legal literal byte
    roundtrip(bytes([255] * 64))
    roundtrip(bytes([255, 0] * 64))
    roundtrip(bytes([0, 255] * 64))
    roundtrip(bytes([255, 255, 1, 255] * 50))


def test_empty_and_tiny():
    roundtrip(b"")
    roundtrip(b"x")
    roundtrip(b"\xff")


def test_random_bytes_roundtrip():
    rng = np.random.RandomState(7)
    roundtrip(rng.randint(0, 256, 4096).astype(np.uint8).tobytes())


def test_compress_with_empty_table():
    data = b"hello world"
    enc = fsst.compress(data, [])
    assert fsst.decompress(enc) == data


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=2048))
def test_property_roundtrip(data):
    table = fsst.train(data[:512])
    assert fsst.decompress(fsst.compress(data, table)) == data


def test_compress_buffer_shorter_than_symbol():
    """A reused table may hold a NUL-tailed symbol LONGER than a later
    chunk; zero-padded windows must not match past the end (regression:
    the tail-clear slice start went negative for n < L-1)."""
    table = [b"abcde\x00\x00\x00"]
    assert fsst.decompress(fsst.compress(b"abcde", table)) == b"abcde"
    assert fsst.decompress(fsst.compress(b"ab", table)) == b"ab"
    assert fsst.decompress(fsst.compress(b"", table)) == b""
