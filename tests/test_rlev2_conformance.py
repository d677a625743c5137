"""Conformance: OUR decoder must decode the REFERENCE writer's actual bytes.

Golden vectors are cut live from liborc (ORC C++ via pyarrow.orc) files using
the footer parser in orc_spark.orcmeta — the strategy prescribed by SURVEY.md
§5.1 (the reference repo itself is empty; liborc is the behavioral oracle named
by BASELINE.json:2).
"""

import numpy as np
import pyarrow as pa
import pyarrow.orc as po
import pytest

from orc_spark import orcmeta
from orc_spark.codecs.rlev2 import decode_rlev2
from orc_spark.fixtures import codec_stress_columns, stress_strings, tokens_arrow


def write_orc(tmp_path, name, arr: pa.Array, threshold=0.8):
    f = str(tmp_path / f"{name}.orc")
    po.write_table(
        pa.table({"c": arr}),
        f,
        compression="uncompressed",
        dictionary_key_size_threshold=threshold,
    )
    return f


@pytest.mark.parametrize("name", ["int_constant", "tiny_repeat", "int_increasing", "int_small_range", "int_outliers", "int_random64"])
def test_decode_liborc_int_streams(tmp_path, name):
    vals = codec_stress_columns()[name]
    f = write_orc(tmp_path, name, pa.array(vals, type=pa.int64()))
    stripes = orcmeta.parse(f)
    got = []
    for s in stripes:
        raw = orcmeta.stream_bytes(f, s, 1, "DATA")
        got.append(decode_rlev2(raw, s["rows"], signed=True))
    assert np.array_equal(np.concatenate(got), vals)


def test_decode_liborc_encodings_observed(tmp_path):
    """liborc's ColumnEncoding decisions on the probe suite (PROBE-1)."""
    cols = codec_stress_columns()
    f = write_orc(tmp_path, "const", pa.array(cols["int_constant"], type=pa.int64()))
    assert orcmeta.parse(f)[0]["encodings"][1][0] == "DIRECT_V2"  # ints never dict

    strs = stress_strings()
    f = write_orc(tmp_path, "low", pa.array(strs["str_low_card"], type=pa.string()))
    enc, dsize = orcmeta.parse(f)[0]["encodings"][1]
    assert enc == "DICTIONARY_V2" and dsize == 4

    f = write_orc(tmp_path, "high", pa.array(strs["str_high_card"], type=pa.string()))
    assert orcmeta.parse(f)[0]["encodings"][1][0] == "DIRECT_V2"  # rejected at 0.8

    f = write_orc(tmp_path, "high1", pa.array(strs["str_high_card"], type=pa.string()), threshold=1.0)
    enc, dsize = orcmeta.parse(f)[0]["encodings"][1]
    assert enc == "DICTIONARY_V2" and dsize == 50000


def test_decode_liborc_length_stream(tmp_path):
    """LENGTH streams are unsigned RLEv2 — decode a real string column's."""
    strs = stress_strings()["str_high_card"]
    f = write_orc(tmp_path, "lens", pa.array(strs, type=pa.string()))
    s = orcmeta.parse(f)[0]
    raw = orcmeta.stream_bytes(f, s, 1, "LENGTH")
    lens = decode_rlev2(raw, s["rows"], signed=False)
    assert np.array_equal(lens, np.array([len(x) for x in strs]))


def test_decode_liborc_dictionary_index_stream(tmp_path):
    """Dictionary index DATA streams are unsigned RLEv2 over sorted-dict ids."""
    strs = stress_strings()["str_low_card"]
    f = write_orc(tmp_path, "dict", pa.array(strs, type=pa.string()))
    s = orcmeta.parse(f)[0]
    idx = decode_rlev2(orcmeta.stream_bytes(f, s, 1, "DATA"), s["rows"], signed=False)
    dict_blob = orcmeta.stream_bytes(f, s, 1, "DICTIONARY_DATA")
    dlens = decode_rlev2(
        orcmeta.stream_bytes(f, s, 1, "LENGTH"), s["encodings"][1][1], signed=False
    )
    offs = np.zeros(len(dlens) + 1, dtype=np.int64)
    offs[1:] = np.cumsum(dlens)
    words = [dict_blob[offs[i] : offs[i + 1]].decode() for i in range(len(dlens))]
    decoded = np.array([words[i] for i in idx])
    assert np.array_equal(decoded, strs)


def test_decode_liborc_tokens_list_streams(tmp_path):
    """The real thing: list<int32> tokens column — LENGTH + child DATA."""
    tbl = tokens_arrow(500)
    f = str(tmp_path / "tokens.orc")
    po.write_table(
        pa.table({"tokens": tbl["tokens"]}),
        f,
        compression="uncompressed",
        dictionary_key_size_threshold=0.8,
    )
    s = orcmeta.parse(f)[0]
    lens = decode_rlev2(orcmeta.stream_bytes(f, s, 1, "LENGTH"), s["rows"], signed=False)
    flat = tbl["tokens"].combine_chunks().flatten().to_numpy()
    child = decode_rlev2(
        orcmeta.stream_bytes(f, s, 2, "DATA"), len(flat), signed=True
    )
    assert np.array_equal(child, flat)
    expect_lens = np.asarray(tbl["tokens"].combine_chunks().value_lengths())
    assert np.array_equal(lens, expect_lens)


def _liborc_roundtrip(tmp_path, name, vals: np.ndarray) -> None:
    f = write_orc(tmp_path, name, pa.array(vals, type=pa.int64()))
    stripes = orcmeta.parse(f)
    got = []
    for s in stripes:
        raw = orcmeta.stream_bytes(f, s, 1, "DATA")
        got.append(decode_rlev2(raw, s["rows"], signed=True))
    assert np.array_equal(np.concatenate(got), vals), name


def test_decode_liborc_patched_gap255_dummy_entries(tmp_path):
    """PATCHED_BASE patch-list gaps are 8-bit; liborc bridges gaps > 255 with
    dummy (gap=255, patch=0) entries. Craft blocks whose outliers sit > 255
    apart so the writer must emit them, and decode the real bytes."""
    rng = np.random.default_rng(42)
    vals = rng.integers(0, 1 << 10, 4096, dtype=np.int64)
    # one outlier at the start and one at the end of each 512-block: the
    # inter-patch gap inside a block is 510 (> 255 -> dummy entry)
    for b in range(8):
        vals[b * 512 + 0] = (1 << 30) + b
        vals[b * 512 + 511] = (1 << 30) + 1000 + b
    _liborc_roundtrip(tmp_path, "gap255", vals)


def test_decode_liborc_boundary_bases(tmp_path):
    """Bases near the 64-bit extremes. liborc picks PATCHED from the ZIGZAG
    width spread, so huge-base blocks always zigzag to ~uniform 62-63 bits
    and come out DIRECT at the widest closed widths — itself a boundary path
    worth conforming on. The reachable PATCHED-with-negative-base case
    (sign-magnitude base byte) is exercised separately below."""
    rng = np.random.default_rng(43)
    cases = [
        ("hi_pos", (1 << 61) + rng.integers(0, 1 << 8, 2048, dtype=np.int64)),
        ("lo_neg", -(1 << 61) + rng.integers(0, 1 << 8, 2048, dtype=np.int64)),
    ]
    for name, base_vals in cases:
        v = base_vals.copy()
        v[::512] += 1 << 20
        _liborc_roundtrip(tmp_path, name, v)


def test_decode_liborc_patched_negative_base(tmp_path):
    """PATCHED_BASE with a negative block minimum: the base byte is
    sign-magnitude ([ORCv1]); verified non-vacuous — liborc emits a 0b10
    header for this shape (small signed values + huge positive outliers)."""
    rng = np.random.default_rng(9)
    v = rng.integers(-(1 << 9), 1 << 9, 1024, dtype=np.int64)
    v[100] += 1 << 30
    v[600] += 1 << 30
    _liborc_roundtrip(tmp_path, "neg_base", v)


def test_decode_liborc_patched_fuzz(tmp_path):
    """Randomized PATCHED_BASE-leaning shapes: mostly-narrow blocks with a
    few huge outliers at random positions, random base offsets (incl.
    negative), decoded from real liborc bytes. Deterministic seeds."""
    for seed in range(6):
        rng = np.random.default_rng(1000 + seed)
        n = int(rng.integers(1024, 6000))
        base = int(rng.integers(-(1 << 40), 1 << 40))
        vals = base + rng.integers(0, 1 << int(rng.integers(4, 16)), n, dtype=np.int64)
        n_out = int(rng.integers(1, 30))
        pos = rng.choice(n, size=n_out, replace=False)
        vals[pos] += rng.integers(1 << 20, 1 << 45, n_out, dtype=np.int64)
        _liborc_roundtrip(tmp_path, f"fuzz{seed}", vals)
