"""LEB128 varints + zigzag, scalar (per-run headers) and vectorized (arrays).

ORC uses unsigned LEB128 ("base-128 varint") and zigzag for signed values
([ORCv1]). Scalar helpers run once per <=512-value run — never per value.
"""

from __future__ import annotations

import numpy as np


def zigzag_scalar(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else v << 1


def unzigzag_scalar(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def zigzag(arr: np.ndarray) -> np.ndarray:
    """int64 array -> uint64 zigzag codes, vectorized."""
    a = arr.astype(np.int64, copy=False)
    return ((a << np.int64(1)) ^ (a >> np.int64(63))).view(np.uint64)


def unzigzag(arr: np.ndarray) -> np.ndarray:
    """uint64 zigzag codes -> int64, vectorized."""
    u = arr.astype(np.uint64, copy=False)
    return ((u >> np.uint64(1)).view(np.int64)) ^ -((u & np.uint64(1)).view(np.int64))


def write_uvarint(out: bytearray, v: int) -> None:
    if v < 0:
        raise ValueError("uvarint requires v >= 0")
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def write_svarint(out: bytearray, v: int) -> None:
    write_uvarint(out, zigzag_scalar(v))


def read_uvarint(buf, i: int) -> tuple[int, int]:
    r = 0
    s = 0
    while True:
        x = buf[i]
        i += 1
        r |= (x & 0x7F) << s
        if not x & 0x80:
            return r, i
        s += 7


def read_svarint(buf, i: int) -> tuple[int, int]:
    u, i = read_uvarint(buf, i)
    return unzigzag_scalar(u), i
