"""Two-reader fuzz of the ORC interchange writer (orcexport).

test_orc_export_conformance.py proves liborc (the C++ reference reader)
decodes our containers; this file widens that with hypothesis-driven string
corpora — unicode, empties, embedded NUL/control bytes, shared prefixes,
skewed repetition — through BOTH string encodings (DIRECT_V2 and
DICTIONARY_V2) and the compressed batch container, then re-checks a fixed
tricky corpus with Spark's Java ORC reader. Two independent readers disagree
with a writer more often than one: liborc and orc-core share no code, so a
container both read back value-identically is conformant in practice, not
just against one implementation's leniencies."""

import numpy as np
import pyarrow as pa
import pyarrow.orc as paorc
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from orc_spark.codecs import strings as scodec
from orc_spark.orcexport import (
    OrcFileWriter,
    write_string_dict_file,
    write_string_direct_file,
)

# bytes-level alphabet: printable ASCII + NUL + control + multi-byte UTF-8
_text = st.text(
    alphabet=st.one_of(
        st.characters(min_codepoint=32, max_codepoint=126),
        st.sampled_from("\x00\x01\n\t東京naïve🙂ß"),
    ),
    max_size=24,
)
# low-cardinality pools force real dictionary reuse; plain lists cover the
# high-cardinality DIRECT side
_corpus = st.one_of(
    st.lists(_text, min_size=1, max_size=400),
    st.lists(st.sampled_from(["", "a", "ab", "東京", "w\x00x", "repeat"]),
             min_size=1, max_size=400),
)


@settings(max_examples=40, deadline=None)
@given(_corpus)
def test_liborc_reads_fuzzed_string_direct(tmp_path_factory, vals):
    f = str(tmp_path_factory.mktemp("fz") / "d.orc")
    parts = scodec.encode_direct(
        pa.array(vals, type=pa.large_string()), use_fsst=False
    )
    write_string_direct_file(f, parts["LENGTH"], parts["DATA"], len(vals))
    assert paorc.ORCFile(f).read().column("x").to_pylist() == vals


@settings(max_examples=40, deadline=None)
@given(_corpus)
def test_liborc_reads_fuzzed_string_dictionary(tmp_path_factory, vals):
    f = str(tmp_path_factory.mktemp("fz") / "dd.orc")
    parts, dsize = scodec.encode_dictionary(
        pa.array(vals, type=pa.large_string()), use_fsst=False
    )
    write_string_dict_file(
        f, parts["DATA"], parts["DICTIONARY_DATA"], parts["DICT_LENGTH"],
        len(vals), dsize,
    )
    assert paorc.ORCFile(f).read().column("x").to_pylist() == vals


@settings(max_examples=25, deadline=None)
@given(_corpus, st.booleans(), st.integers(0, 2**32 - 1))
def test_liborc_reads_fuzzed_compressed_batches(tmp_path_factory, words, nulls, seed):
    """Mixed string+int batch with optional nulls through the zstd container
    (multi-stripe: the same batch twice, so stripe offsets/indexes are
    exercised past the first stripe)."""
    rng = np.random.default_rng(seed)
    n = len(words)
    ints = rng.integers(-(1 << 40), 1 << 40, n, dtype=np.int64)
    s_arr = pa.array(words, type=pa.string())
    i_arr = pa.array(ints)
    if nulls and n > 1:
        mask = rng.random(n) < 0.3
        s_arr = pa.array([None if m else w for m, w in zip(mask, words)],
                         type=pa.string())
        # explicit type: an all-None draw must exercise the all-null-int64
        # export path, not collapse to Arrow's `null` type
        i_arr = pa.array([None if m else int(v) for m, v in zip(~mask, ints)],
                         type=pa.int64())
    batch = pa.record_batch([s_arr, i_arr], names=["s", "v"])
    f = str(tmp_path_factory.mktemp("fz") / "b.orc")
    w = OrcFileWriter(f, compression="zstd")
    w.add_stripe(batch)
    w.add_stripe(batch)
    w.close()
    got = paorc.ORCFile(f).read()
    assert got.column("s").to_pylist() == s_arr.to_pylist() * 2
    assert got.column("v").to_pylist() == i_arr.to_pylist() * 2


def test_liborc_reads_all_null_columns(tmp_path):
    """Typed all-null columns (PRESENT all zeros, empty DATA streams) must
    still export — found by the hypothesis fuzz above when a null-mask draw
    covered a whole column."""
    batch = pa.record_batch(
        [
            pa.array([None, None, None], type=pa.int64()),
            pa.array([None, None, None], type=pa.string()),
            pa.array(["x", None, "y"], type=pa.string()),
        ],
        names=["v", "s", "t"],
    )
    f = str(tmp_path / "allnull.orc")
    w = OrcFileWriter(f, compression="zstd")
    w.add_stripe(batch)
    w.close()
    got = paorc.ORCFile(f).read()
    assert got.column("v").to_pylist() == [None, None, None]
    assert got.column("s").to_pylist() == [None, None, None]
    assert got.column("t").to_pylist() == ["x", None, "y"]


# deterministic tricky corpus for the (slow-to-start) Java reader: every
# shape the hypothesis strategies above probe, pinned
_TRICKY = [
    ["", "", ""],
    ["a\x00b", "\x00", "nul\x00tail\x00"],
    ["東京", "naïve", "🙂🙂🙂", "ß", ""],
    ["shared_prefix_%04d" % i for i in range(300)],
    (["hot"] * 200) + ["cold_%d" % i for i in range(20)],
    ["\n\t\x01", " ", "  ", "x" * 2000],
]


def test_java_reader_reads_our_string_containers(spark, tmp_path):
    """spark.read.orc (orc-core, the Java reference reader — independent of
    liborc) over the pinned tricky corpus, all three container shapes."""
    for i, vals in enumerate(_TRICKY):
        arr = pa.array(vals, type=pa.large_string())
        fd = str(tmp_path / f"direct{i}.orc")
        p = scodec.encode_direct(arr, use_fsst=False)
        write_string_direct_file(fd, p["LENGTH"], p["DATA"], len(vals))
        fk = str(tmp_path / f"dict{i}.orc")
        pd_, dsize = scodec.encode_dictionary(arr, use_fsst=False)
        write_string_dict_file(
            fk, pd_["DATA"], pd_["DICTIONARY_DATA"], pd_["DICT_LENGTH"],
            len(vals), dsize,
        )
        fz = str(tmp_path / f"zstd{i}.orc")
        w = OrcFileWriter(fz, compression="zstd")
        w.add_stripe(pa.record_batch([pa.array(vals, type=pa.string())], names=["x"]))
        w.close()
        for f in (fd, fk, fz):
            got = [r["x"] for r in spark.read.orc(f).collect()]
            assert got == vals, (f, i)
