"""Reverse conformance: the REFERENCE reader (liborc via pyarrow.orc) must
decode OUR encoder's RLEv2 bytes bit-exactly. orcexport wraps our raw
streams in a minimal spec-conformant uncompressed ORC container; any
deviation of our encoder from the public RLEv2 spec surfaces as a liborc
read error or value mismatch. Forward direction (we decode liborc's bytes)
lives in test_rlev2_conformance.py — together they close the loop."""

import numpy as np
import pyarrow.orc as paorc
import pytest

from orc_spark.codecs.rlev2 import encode_rlev2
from orc_spark.fixtures import tokens_arrow
from orc_spark.orcexport import write_list_file, write_long_file


def _roundtrip_via_liborc(tmp_path, name, vals: np.ndarray) -> None:
    f = str(tmp_path / f"{name}.orc")
    write_long_file(f, encode_rlev2(vals, signed=True), len(vals))
    got = np.asarray(paorc.ORCFile(f).read().column("x"))
    assert np.array_equal(got, vals), name


def test_liborc_reads_our_short_repeat(tmp_path):
    _roundtrip_via_liborc(tmp_path, "rep", np.full(4096, 42, dtype=np.int64))


def test_liborc_reads_our_direct(tmp_path):
    rng = np.random.default_rng(7)
    _roundtrip_via_liborc(
        tmp_path, "direct", rng.integers(-(1 << 40), 1 << 40, 5000, dtype=np.int64)
    )


def test_liborc_reads_our_delta(tmp_path):
    base = np.arange(5000, dtype=np.int64) * 3 + 17
    _roundtrip_via_liborc(tmp_path, "delta", base)
    rng = np.random.default_rng(8)
    _roundtrip_via_liborc(
        tmp_path, "deltaish", base + rng.integers(0, 4, 5000, dtype=np.int64)
    )


def test_liborc_reads_our_patched_base(tmp_path):
    rng = np.random.default_rng(9)
    vals = rng.integers(0, 1 << 10, 4096, dtype=np.int64)
    vals[rng.choice(4096, 40, replace=False)] += 1 << 35
    _roundtrip_via_liborc(tmp_path, "patched", vals)


def test_liborc_reads_our_negatives_and_boundaries(tmp_path):
    _roundtrip_via_liborc(
        tmp_path,
        "bounds",
        np.array(
            [0, -1, 1, 2**62, -(2**62), 123456789, -987654321] * 100,
            dtype=np.int64,
        ),
    )


@pytest.mark.parametrize("seed", range(4))
def test_liborc_reads_our_fuzz(tmp_path, seed):
    rng = np.random.default_rng(100 + seed)
    n = int(rng.integers(100, 8000))
    w = int(rng.integers(1, 50))
    vals = rng.integers(-(1 << w), 1 << w, n, dtype=np.int64)
    if rng.random() < 0.5:
        vals[rng.choice(n, max(1, n // 200), replace=False)] += 1 << min(w + 20, 62)
    _roundtrip_via_liborc(tmp_path, f"fuzz{seed}", vals)


def test_liborc_reads_our_string_direct(tmp_path):
    import pyarrow as pa

    from orc_spark.codecs import strings as scodec
    from orc_spark.orcexport import write_string_direct_file

    vals = ["doc_%05d" % i for i in range(3000)] + ["", "東京", "naïve"]
    parts = scodec.encode_direct(pa.array(vals, type=pa.large_string()), use_fsst=False)
    f = str(tmp_path / "sdir.orc")
    write_string_direct_file(f, parts["LENGTH"], parts["DATA"], len(vals))
    assert paorc.ORCFile(f).read().column("x").to_pylist() == vals


def test_liborc_reads_our_string_dictionary(tmp_path):
    import pyarrow as pa

    from orc_spark.codecs import strings as scodec
    from orc_spark.orcexport import write_string_dict_file

    vals = (["alpha", "beta", "gamma", "delta"] * 800)[:3000]
    parts, dsize = scodec.encode_dictionary(
        pa.array(vals, type=pa.large_string()), use_fsst=False
    )
    f = str(tmp_path / "sdict.orc")
    write_string_dict_file(
        f, parts["DATA"], parts["DICTIONARY_DATA"], parts["DICT_LENGTH"], len(vals), dsize
    )
    assert paorc.ORCFile(f).read().column("x").to_pylist() == vals


def test_liborc_reads_our_fuzzed_batches(tmp_path):
    """Whole-batch fuzz: random null-free mixed batches through
    write_batch_file, read back by liborc, value-identical."""
    import pyarrow as pa

    from orc_spark.orcexport import write_batch_file

    for seed in range(5):
        rng = np.random.default_rng(500 + seed)
        n = int(rng.integers(1, 3000))
        ints = rng.integers(-(1 << 50), 1 << 50, n, dtype=np.int64)
        words = ["w%d" % v for v in rng.integers(0, 50, n)]
        lens = rng.integers(0, 12, n)
        flat = rng.integers(0, 1 << 30, int(lens.sum()), dtype=np.int64)
        offs = np.zeros(n + 1, dtype=np.int32)
        offs[1:] = np.cumsum(lens, dtype=np.int32)
        lists = pa.ListArray.from_arrays(
            pa.array(offs, type=pa.int32()),
            pa.array(flat.astype(np.int32), type=pa.int32()),
        )
        batch = pa.record_batch(
            [pa.array(ints), pa.array(words, type=pa.string()), lists],
            names=["v", "s", "tokens"],
        )
        f = str(tmp_path / f"batch{seed}.orc")
        write_batch_file(f, batch)
        t = paorc.ORCFile(f).read()
        assert np.array_equal(np.asarray(t.column("v")), ints)
        assert t.column("s").to_pylist() == words
        got = t.column("tokens").combine_chunks()
        assert np.array_equal(np.asarray(got.value_lengths()), lens)
        assert np.array_equal(
            np.asarray(got.flatten(), dtype=np.int64), flat
        )


def test_byte_rle_shapes():
    """Byte-RLE encoder unit shapes: runs >=3 become (len-3, byte); short
    segments become literal groups; long runs/literals split at 130/128."""
    from orc_spark.orcexport import byte_rle

    assert byte_rle(b"") == b""
    assert byte_rle(b"\x07" * 3) == bytes([0, 7])
    assert byte_rle(b"\x07" * 130) == bytes([127, 7])
    assert byte_rle(b"\x07" * 131) == bytes([127, 7, 256 - 1, 7])
    assert byte_rle(b"\x01\x02") == bytes([256 - 2, 1, 2])
    assert byte_rle(bytes(range(130))) == bytes(
        [256 - 128, *range(128), 256 - 2, 128, 129]
    )


def test_liborc_reads_our_null_batches(tmp_path):
    """PRESENT streams (Byte-RLE validity bitmaps): random null patterns in
    every column type, read back by liborc with identical nulls+values."""
    import pyarrow as pa

    from orc_spark.orcexport import write_batch_file

    for seed in range(3):
        rng = np.random.default_rng(700 + seed)
        n = int(rng.integers(1, 2500))
        ints = [
            int(v) if rng.random() > 0.3 else None
            for v in rng.integers(-(1 << 40), 1 << 40, n)
        ]
        words = [
            ("w%d" % v) if rng.random() > 0.25 else None
            for v in rng.integers(0, 60, n)
        ]
        lists = [
            list(map(int, rng.integers(0, 1000, int(rng.integers(0, 8)))))
            if rng.random() > 0.2
            else None
            for _ in range(n)
        ]
        batch = pa.record_batch(
            [
                pa.array(ints, type=pa.int64()),
                pa.array(words, type=pa.string()),
                pa.array(lists, type=pa.list_(pa.int32())),
            ],
            names=["v", "s", "tokens"],
        )
        f = str(tmp_path / f"nulls{seed}.orc")
        write_batch_file(f, batch)
        t = paorc.ORCFile(f).read()
        assert t.column("v").to_pylist() == ints
        assert t.column("s").to_pylist() == words
        assert t.column("tokens").to_pylist() == lists


def test_liborc_reads_our_all_null_column(tmp_path):
    import pyarrow as pa

    from orc_spark.orcexport import write_batch_file

    f = str(tmp_path / "allnull.orc")
    write_batch_file(
        f, pa.record_batch([pa.array([None] * 10, type=pa.int64())], names=["v"])
    )
    assert paorc.ORCFile(f).read().column("v").null_count == 10


def test_liborc_reads_our_canonical_token_streams(tmp_path):
    """The flagship shape: the canonical table's tokens column as
    list<int> — our LENGTH and child DATA streams, read by liborc."""
    col = tokens_arrow(3000)["tokens"].combine_chunks()
    lens = np.asarray(col.value_lengths(), dtype=np.int64)
    flat = np.asarray(col.flatten(), dtype=np.int64)
    f = str(tmp_path / "tokens.orc")
    write_list_file(
        f,
        encode_rlev2(lens, signed=False),
        encode_rlev2(flat, signed=True),
        len(lens),
    )
    got = paorc.ORCFile(f).read().column("x").combine_chunks()
    assert np.array_equal(np.asarray(got.value_lengths()), lens)
    assert np.array_equal(np.asarray(got.flatten(), dtype=np.int64), flat)


def test_compression_frame_chunking_and_original_escape():
    """ORC compression chunks: >64 KiB input splits into multiple chunks;
    incompressible chunks are stored original (low header bit set) — the
    decoder must accept a mix of both in one stream."""
    from orc_spark.orcexport import _BLOCK, compression_frame

    rng = np.random.default_rng(1)
    incompressible = rng.integers(0, 256, _BLOCK + 1000, dtype=np.uint8).tobytes()
    framed = compression_frame(incompressible, "zstd")
    h0 = int.from_bytes(framed[:3], "little")
    assert h0 & 1, "random bytes should be stored original"
    assert (h0 >> 1) == _BLOCK
    # an original chunk costs exactly header + raw bytes
    second = framed[3 + _BLOCK :]
    assert (int.from_bytes(second[:3], "little") >> 1) == len(second) - 3
    compressible = b"ab" * (_BLOCK)  # 2 blocks, both compress
    framed2 = compression_frame(compressible, "zstd")
    assert len(framed2) < len(compressible) // 10
    assert compression_frame(b"", "zstd") == b""


def test_liborc_reads_our_compressed_multichunk(tmp_path):
    """A single stripe whose streams span many 64 KiB chunks, with an
    incompressible column forcing original-escape chunks mid-stream —
    liborc must read every value back bit-equal."""
    import pyarrow as pa

    from orc_spark.orcexport import write_batch_file

    rng = np.random.default_rng(9)
    n = 120_000
    noise = rng.integers(-(1 << 62), 1 << 62, n, dtype=np.int64)  # incompressible
    runs = np.repeat(np.arange(n // 100, dtype=np.int64), 100)  # compressible
    words = ["tok%04d" % v for v in rng.integers(0, 30, n)]
    batch = pa.record_batch(
        [pa.array(noise), pa.array(runs), pa.array(words, type=pa.string())],
        names=["noise", "runs", "s"],
    )
    f = str(tmp_path / "multi.orc")
    write_batch_file(f, batch)
    orc = paorc.ORCFile(f)
    assert str(orc.compression).upper() == "ZSTD"
    t = orc.read()
    assert np.array_equal(np.asarray(t.column("noise")), noise)
    assert np.array_equal(np.asarray(t.column("runs")), runs)
    assert t.column("s").to_pylist() == words


def test_liborc_reads_our_float_double_timestamp(tmp_path):
    """The reference reader decodes our FLOAT/DOUBLE (raw IEEE LE) and
    TIMESTAMP (seconds-from-2015 + trailing-zero nanos) streams bit-exactly,
    including NaN/inf/-0.0, nulls, pre-2015 and epoch-0 instants."""
    import pyarrow as pa

    from orc_spark.orcexport import write_batch_file

    rng = np.random.RandomState(3)
    n = 1000
    d = rng.normal(50, 9, n)
    d[5], d[6], d[7] = np.nan, np.inf, -0.0
    us = np.arange(n, dtype=np.int64) * 1_000_003 + 1_700_000_000_000_000
    us[0] = 1_420_070_400_000_000  # the ORC timestamp epoch itself
    us[1] = 1_420_070_399_999_999  # 1us before it (negative seconds + nanos)
    us[2] = 999_999_123_456        # 1970s
    us[3] = 0
    batch = pa.record_batch(
        {
            "d": pa.array(d, type=pa.float64()),
            "f": pa.array(rng.normal(0, 1, n).astype(np.float32), type=pa.float32()),
            "ts": pa.array(us, type=pa.int64()).cast(pa.timestamp("us")),
            "dn": pa.array(
                [None if i % 9 == 0 else i * 0.25 for i in range(n)], type=pa.float64()
            ),
            "emb": pa.array(
                [rng.normal(0, 1, 8).astype(np.float32).tolist() for _ in range(n)],
                type=pa.list_(pa.float32()),
            ),
        }
    )
    f = str(tmp_path / "newtypes.orc")
    write_batch_file(f, batch)
    got = paorc.ORCFile(f).read()
    for name in ("d", "f"):
        a = np.asarray(batch.column(name).to_numpy(zero_copy_only=False))
        b = np.asarray(got.column(name).combine_chunks().to_numpy(zero_copy_only=False))
        w = "u8" if a.dtype == np.float64 else "u4"
        assert np.array_equal(a.view(w), b.view(w)), name
    ns = got.column("ts").combine_chunks().cast(pa.int64()).to_pylist()
    assert ns == [x * 1000 for x in us.tolist()]
    assert got.column("dn").combine_chunks().to_pylist() == batch.column("dn").to_pylist()
    assert got.column("emb").combine_chunks().to_pylist() == batch.column("emb").to_pylist()


def test_format_nanos_matches_liborc_writer(tmp_path):
    """Cross-check our SECONDARY nano formatting against what liborc's own
    writer emits for the same instants (probe-derived code = zeros-1)."""
    import pyarrow as pa

    from orc_spark import orcmeta
    from orc_spark.codecs.rlev2 import decode_rlev2
    from orc_spark.orcexport import _format_nanos

    vals = [
        1_700_000_000_123_456,
        1_700_000_000_120_000,
        1_700_000_000_000_000,
        1_700_000_000_100_000,
        1_420_070_399_999_999,
    ]
    ts = pa.array(vals, type=pa.int64()).cast(pa.timestamp("us"))
    ref = str(tmp_path / "ref.orc")
    paorc.write_table(pa.table({"ts": ts}), ref, compression="uncompressed")
    st = orcmeta.parse(ref)[0]
    theirs = decode_rlev2(
        orcmeta.stream_bytes(ref, st, 1, "SECONDARY"), len(vals), signed=False
    )
    nanos = (np.asarray(vals, dtype=np.int64) % 1_000_000) * 1000
    assert np.array_equal(_format_nanos(nanos), theirs)
