"""General-purpose block compression wrapper over encoded streams.

ORC wraps encoded streams in 64 KiB zlib/zstd blocks; Spark's ORC default is
zstd (SURVEY.md [PROBE-3/4]). We compress each stream as one block (streams
are already stripe-sized) and record the choice per stream in the stripe
footer: 'none' | 'zstd' | 'zlib'. zstd comes from pyarrow's bundled codec; no
external deps.
"""

from __future__ import annotations

import zlib

import pyarrow as pa

# level 1 measured BOTH smaller and 4.5x faster than level 3 on RLEv2-packed
# token streams (1.3552 vs 1.3948 B/tok, 25 vs 112 ms per 8.1M tokens —
# zstd's fast mode fits bit-packed runs better than the deeper matchers)
_ZSTD_LEVEL = 1
_zstd_c = pa.Codec("zstd", _ZSTD_LEVEL)
_zstd_d = pa.Codec("zstd")


def compress(data: bytes, codec: str) -> bytes:
    if codec == "none" or len(data) == 0:
        return data
    if codec == "zstd":
        return _zstd_c.compress(data, asbytes=True)
    if codec == "zlib":
        return zlib.compress(data, 6)
    raise ValueError(f"unknown compression codec {codec!r}")


def decompress(data: bytes, codec: str, raw_len: int) -> bytes:
    if codec == "none" or raw_len == 0:
        return data
    if codec == "zstd":
        return _zstd_d.decompress(data, raw_len, asbytes=True)
    if codec == "zlib":
        return zlib.decompress(data)
    raise ValueError(f"unknown compression codec {codec!r}")


def maybe_compress(data: bytes, codec: str = "zstd", min_gain: float = 0.95) -> tuple[bytes, str]:
    """Compress only when it actually shrinks the stream by >= (1-min_gain)."""
    if codec == "none" or len(data) < 64:
        return data, "none"
    c = compress(data, codec)
    if len(c) < len(data) * min_gain:
        return c, codec
    return data, "none"
