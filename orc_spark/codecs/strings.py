"""String column codecs: dictionary (DICTIONARY_V2-style) and direct, with
optional FSST on the byte payload.

Mirrors the ORC writer's string handling observed in SURVEY.md [PROBE-1]:
- dictionary: sorted distinct values; DICTIONARY_DATA (concat bytes) + dict
  LENGTH stream + RLEv2-unsigned index DATA stream; chosen when
  distinct/total <= threshold (Java ORC default 0.8);
- direct: LENGTH stream + concatenated DATA bytes.
FSST is our addition (BASELINE.json:14) applied to whichever byte payload wins.

All functions operate on numpy object/str arrays or pyarrow StringArray
buffers; the heavy path (offsets/bytes) is vectorized via pyarrow.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import fsst
from .rlev2 import decode_rlev2, encode_rlev2


def to_offsets_bytes(values) -> tuple[np.ndarray, np.ndarray]:
    """Any string sequence -> (int64 offsets[n+1], uint8 data)."""
    arr = pa.array(values, type=pa.large_string()) if not isinstance(values, pa.Array) else values
    if pa.types.is_string(arr.type):
        arr = arr.cast(pa.large_string())
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int64, count=len(arr) + 1 + arr.offset)[
        arr.offset :
    ]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8) if arr.buffers()[2] is not None else np.empty(0, np.uint8)
    # normalize to zero-based offsets over the sliced data
    base = offs[0]
    return (offs - base).astype(np.int64), data[base : offs[-1]]


def dictionary_parts(values) -> tuple[np.ndarray, list[bytes]]:
    """(indices into sorted distinct list, sorted distinct byte strings)."""
    arr = pa.array(values, type=pa.large_string()) if not isinstance(values, pa.Array) else values
    enc = arr.dictionary_encode()
    dict_vals = enc.dictionary.to_pylist()
    idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(np.array(dict_vals, dtype=object))
    rank = np.empty_like(order)
    rank[order] = np.arange(len(order))
    return rank[idx], [dict_vals[i].encode() for i in order]


def encode_direct(values, use_fsst: bool, table: list[bytes] | None = None) -> dict[str, bytes]:
    offs, data = to_offsets_bytes(values)
    lens = np.diff(offs)
    payload = fsst_wrap(data, use_fsst, table)
    return {"LENGTH": encode_rlev2(lens, signed=False), "DATA": payload}


def decode_direct(streams: dict[str, bytes], n: int, used_fsst: bool) -> pa.Array:
    lens = decode_rlev2(streams["LENGTH"], n, signed=False)
    data = fsst_unwrap(streams["DATA"], used_fsst)
    offs = np.zeros(n + 1, dtype=np.int64)
    offs[1:] = np.cumsum(lens)
    return pa.Array.from_buffers(
        pa.large_string(), n, [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(data)]
    )


def encode_dictionary(
    values, use_fsst: bool, table: list[bytes] | None = None
) -> tuple[dict[str, bytes], int]:
    idx, words = dictionary_parts(values)
    blob = b"".join(words)
    wl = np.array([len(w) for w in words], dtype=np.int64)
    return (
        {
            "DATA": encode_rlev2(idx, signed=False),
            "DICTIONARY_DATA": fsst_wrap(np.frombuffer(blob, dtype=np.uint8), use_fsst, table),
            "DICT_LENGTH": encode_rlev2(wl, signed=False),
        },
        len(words),
    )


def decode_dictionary(
    streams: dict[str, bytes], n: int, dict_size: int, used_fsst: bool
) -> pa.Array:
    idx = decode_rlev2(streams["DATA"], n, signed=False)
    blob = fsst_unwrap(streams["DICTIONARY_DATA"], used_fsst)
    wl = decode_rlev2(streams["DICT_LENGTH"], dict_size, signed=False)
    offs = np.zeros(dict_size + 1, dtype=np.int64)
    offs[1:] = np.cumsum(wl)
    dict_arr = pa.Array.from_buffers(
        pa.large_string(),
        dict_size,
        [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(blob)],
    )
    return pa.DictionaryArray.from_arrays(pa.array(idx, type=pa.int64()), dict_arr).cast(
        pa.large_string()
    )


def fsst_wrap(data: np.ndarray, use_fsst: bool, table: list[bytes] | None = None) -> bytes:
    if not use_fsst or len(data) == 0:
        return bytes(data)
    if table is None:
        table = fsst.train(data[: 1 << 16])
    return fsst.compress(data, table)


def fsst_unwrap(buf: bytes, used_fsst: bool) -> np.ndarray:
    if not used_fsst:
        return np.frombuffer(buf, dtype=np.uint8)
    return np.frombuffer(fsst.decompress(buf), dtype=np.uint8)
