"""Vectorized big-endian bit-packing + the ORC closed-width table.

Bit layout matches ORC RLEv2 ([ORCv1], probe-confirmed in SURVEY.md Appendix A):
values are written MSB-first, consecutively, crossing byte boundaries; the final
partial byte is zero-padded on the right. All kernels are numpy-vectorized
(unpackbits/packbits) — no per-value Python.
"""

from __future__ import annotations

import bisect

import numpy as np

# ORC's closed set of 32 widths for the 5-bit width field ([ORCv1] "Direct").
CLOSED_WIDTHS: tuple[int, ...] = tuple(range(1, 25)) + (26, 28, 30, 32, 40, 48, 56, 64)

_WIDTH_TO_CODE = {w: c for c, w in enumerate(CLOSED_WIDTHS)}

_POW2 = np.uint64(1) << np.arange(0, 64, dtype=np.uint64)  # 2^0 .. 2^63


def closest_width(w: int) -> int:
    """Round width up to the nearest entry of the closed table (min 1)."""
    if w <= 1:
        return 1
    return CLOSED_WIDTHS[bisect.bisect_left(CLOSED_WIDTHS, w)]


def encode_width(w: int) -> int:
    """5-bit code for an exact closed width."""
    return _WIDTH_TO_CODE[w]


def decode_width(code: int) -> int:
    return CLOSED_WIDTHS[code]


def bit_length(values: np.ndarray) -> np.ndarray:
    """Per-element bit length of a non-negative integer array (0 for 0).

    Exact for the full 64-bit range (no float log2 edge cases).
    """
    if values.dtype in (np.uint32, np.uint16, np.uint8):
        # always < 2^53: frexp directly, no uint64 widening copy
        _, e = np.frexp(values.astype(np.float64))
        return e.astype(np.int64)
    v = values.astype(np.uint64, copy=False)
    if v.size and int(v.max()) < (1 << 53):
        # float64 represents integers < 2^53 exactly; frexp's exponent IS the
        # bit length (frexp(8) -> (0.5, 4); frexp(0) -> (0, 0)). ~10x faster
        # than searchsorted on large arrays.
        _, e = np.frexp(v.astype(np.float64))
        return e.astype(np.int64)
    # searchsorted(bins, x, 'right') == number of bins <= x, which IS
    # bit_length: x=0 -> 0, x=1 -> 1, x=184 -> 8, x >= 2^63 -> 64. Exact over
    # the full uint64 range (no float log2 edge cases).
    return np.searchsorted(_POW2, v, side="right").astype(np.int64)


def bit_length_u8(values: np.ndarray) -> np.ndarray:
    """Per-element bit length as uint8 — the low-traffic kernel for the
    per-VALUE stats pass of the encoder (the hot loop at high core counts,
    where the box is DRAM-bound, not CPU-bound).

    For uint32 inputs below 2^24 the bit length is read straight off the
    float32 exponent field (float32 represents those integers exactly;
    biased exponent - 126 == bit_length, with 0 clamping to 0). That is one
    4-byte temp and three in-place passes instead of frexp's float64
    widening + mantissa array + int64 exponent: ~10x faster and ~5x less
    memory traffic, measured. Larger/wider inputs fall back to the exact
    generic path."""
    if values.size == 0:
        return np.empty(0, dtype=np.uint8)
    if values.dtype in (np.uint32, np.uint16, np.uint8) and int(values.max()) < (
        1 << 24
    ):
        bits = values.astype(np.float32).view(np.int32)
        np.right_shift(bits, 23, out=bits)
        np.subtract(bits, 126, out=bits)
        np.maximum(bits, 0, out=bits)  # value 0 -> exponent field 0 -> clamp
        return bits.astype(np.uint8)
    return bit_length(values).astype(np.uint8)


def _container(width: int) -> tuple[str, int]:
    if width <= 8:
        return ">u1", 1
    if width <= 16:
        return ">u2", 2
    if width <= 32:
        return ">u4", 4
    return ">u8", 8


def pack(values: np.ndarray, width: int, mask_values: bool = True) -> bytes:
    """Pack values at `width` bits, MSB-first (high bits above `width` masked).

    mask_values=False skips the masking copy — callers that derived `width`
    from the values' own max bit length (every DIRECT/DELTA/FOR path) pass
    False; only PATCHED_BASE low-bits packing relies on the mask to drop the
    patched high bits."""
    n = len(values)
    if n == 0 or width == 0:
        return b""
    if values.dtype == np.uint32 and width <= 32:
        # native narrow path: no uint64 widening at all
        v32 = values
        if width < 32 and mask_values:
            v32 = v32 & np.uint32((1 << width) - 1)
        if (n * width) % 32 == 0 and n >= 4096:
            return _pack_aligned_lanes(v32, width, 32)
        v = v32.astype(np.uint64)
    else:
        v = values.astype(np.uint64, copy=False)
        if width < 64 and mask_values:
            v = v & ((np.uint64(1) << np.uint64(width)) - np.uint64(1))
    if width <= 32 and (n * width) % 32 == 0 and n >= 4096:
        # 32-bit lanes: identical MSB-first byte stream (big-endian word
        # chunking is chunk-size-invariant), half the memory traffic of the
        # 64-bit path — token streams pack at ~16-bit widths, making this
        # the hottest kernel in the encode pipeline
        return _pack_aligned_lanes(v.astype(np.uint32), width, 32)
    if (n * width) % 64 == 0 and n >= 4096:
        return _pack_aligned(v, width)
    dt, nbytes = _container(width)
    b = v.astype(dt).view(np.uint8).reshape(n, nbytes)
    bits = np.unpackbits(b, axis=1)[:, nbytes * 8 - width :]
    return np.packbits(bits.ravel()).tobytes()


def _pack_aligned_lanes(v: np.ndarray, w: int, word: int) -> bytes:
    """Shift-or lane packing into `word`-bit big-endian words (word in
    {32, 64}); requires len*w % word == 0 and w <= word.

    The output is np.empty, NOT np.zeros: every word group has a known first
    writer lane (tracked in `written`), which stores with `=` instead of
    `|=` — dropping the whole-buffer zeroing pass. At ~2 B/token of packed
    output that pass is pure DRAM traffic, the binding resource at high
    core counts (the zeroing showed up in the pinned 4-core profile)."""
    import math

    dt = np.uint32 if word == 32 else np.uint64
    n = len(v)
    P = math.lcm(word, w) // w
    L = (P * w) // word
    nwords = (n * w) // word
    out = np.empty(nwords, dtype=dt)
    written = [False] * L  # per word-group: has its first lane stored yet?
    for r in range(P):
        sel = v[r::P]
        if not len(sel):
            break
        bo = r * w
        wi = bo // word
        sh = word - w - (bo % word)
        dst = out[wi::L][: len(sel)]
        if sh >= 0:
            if written[wi % L]:
                dst |= sel << dt(sh)
            else:
                np.left_shift(sel, dt(sh), out=dst)
                written[wi % L] = True
        else:
            # lane spans two word groups: low part into wi, high into wi+1.
            # wi is always already written here (some earlier lane started
            # it — a lane only spills after the word has prior content), but
            # wi+1 may be fresh.
            dst |= sel >> dt(-sh)
            dst2 = out[wi + 1 :: L][: len(sel)]
            if written[(wi + 1) % L]:
                dst2 |= sel << dt(word + sh)
            else:
                np.left_shift(sel, dt(word + sh), out=dst2)
                written[(wi + 1) % L] = True
    # no ragged-tail case: n*w % word == 0 forces n % P == 0 (P is
    # word/gcd(word,w)), so every lane has exactly n/P rows and every output
    # word was stored by its first-writer lane above
    return out.astype(">u4" if word == 32 else ">u8").tobytes()


def _pack_aligned(v: np.ndarray, w: int) -> bytes:
    """Shift-or lane packing, no bool expansion. Requires len*w % 64 == 0.

    Values are striped into P = lcm(64,w)/w lanes whose bit offsets repeat
    every L = P*w/64 output words; each lane is 1-2 vectorized shift/or ops.
    O(n) work in <=128 numpy calls regardless of n.
    """
    import math

    n = len(v)
    P = math.lcm(64, w) // w
    L = (P * w) // 64
    nwords = (n * w) // 64
    # np.empty + first-writer stores (see _pack_aligned_lanes): n % P == 0 is
    # implied by the alignment precondition, so every word group has a known
    # first lane and the zeroing pass is unnecessary
    out = np.empty(nwords, dtype=np.uint64)
    written = [False] * L
    for r in range(P):
        sel = v[r::P]
        if not len(sel):
            break
        bo = r * w
        wi = bo // 64
        sh = 64 - w - (bo % 64)
        dst = out[wi::L][: len(sel)]
        if sh >= 0:
            if written[wi]:
                dst |= sel << np.uint64(sh)
            else:
                np.left_shift(sel, np.uint64(sh), out=dst)
                written[wi] = True
        else:
            dst |= sel >> np.uint64(-sh)  # wi already written (bits before bo)
            dst2 = out[wi + 1 :: L][: len(sel)]
            if written[wi + 1]:
                dst2 |= sel << np.uint64(64 + sh)
            else:
                np.left_shift(sel, np.uint64(64 + sh), out=dst2)
                written[wi + 1] = True
    return out.astype(">u8").tobytes()


def packed_size(n: int, width: int) -> int:
    return (n * width + 7) // 8


def unpack(buf, n: int, width: int) -> np.ndarray:
    """Unpack `n` values of `width` bits from `buf` -> uint64 array."""
    if n == 0 or width == 0:
        return np.zeros(n, dtype=np.uint64)
    if width <= 32 and (n * width) % 32 == 0 and n >= 64:
        # lane shift-mask extraction: inverse of _pack_aligned_lanes. Each of
        # the P = lcm(32,w)/w lanes costs ~2 numpy calls on n/P elements, so
        # it only beats the unpackbits path when lanes are few (w divides a
        # word cleanly) or n is large enough to amortize the call overhead.
        import math

        P = math.lcm(32, width) // width
        if 2 * P + 2 < 12 or n // P >= 1024:
            return _unpack_aligned_lanes(buf, n, width)
    need = packed_size(n, width)
    raw = np.frombuffer(buf, dtype=np.uint8, count=need)
    bits = np.unpackbits(raw)[: n * width].reshape(n, width)
    dt, nbytes = _container(width)
    full = np.zeros((n, nbytes * 8), dtype=np.uint8)
    full[:, nbytes * 8 - width :] = bits
    return np.packbits(full, axis=1).reshape(n, nbytes).view(dt).ravel().astype(np.uint64)


def unpack_u32(buf, n: int, width: int) -> np.ndarray:
    """unpack() variant returning uint32 (width <= 32) — skips the uint64
    widening of the generic API for narrow decode paths."""
    assert width <= 32
    if n == 0 or width == 0:
        return np.zeros(n, dtype=np.uint32)
    if (n * width) % 32 == 0 and n >= 64:
        import math

        P = math.lcm(32, width) // width
        if 2 * P + 2 < 12 or n // P >= 1024:
            return _unpack_aligned_lanes(buf, n, width, widen=False)
    return unpack(buf, n, width).astype(np.uint32)


def _unpack_aligned_lanes(buf, n: int, w: int, widen: bool = True) -> np.ndarray:
    """Extract n w-bit values from 32-bit big-endian words (n*w % 32 == 0)."""
    import math

    word = 32
    nwords = (n * w) // word
    words = np.frombuffer(buf, dtype=">u4", count=nwords).astype(np.uint32)
    P = math.lcm(word, w) // w
    L = (P * w) // word
    out = np.empty(n, dtype=np.uint32)
    mask = np.uint32((1 << w) - 1) if w < 32 else np.uint32(0xFFFFFFFF)
    for r in range(P):
        cnt = len(out[r::P])
        if not cnt:
            break
        bo = r * w
        wi = bo // word
        sh = word - w - (bo % word)
        src = words[wi::L][:cnt]
        if sh >= 0:
            vals = (src >> np.uint32(sh)) & mask
        else:
            hi = src << np.uint32(-sh)
            lo = words[wi + 1 :: L][:cnt] >> np.uint32(word + sh)
            vals = (hi | lo) & mask
        out[r::P] = vals
    return out.astype(np.uint64) if widen else out


def varpack_rows(
    values: np.ndarray, row_lengths: np.ndarray, widths: np.ndarray
) -> tuple[bytes, np.ndarray, np.ndarray]:
    """Bulk-pack variable-width rows in one vectorized pass.

    Row i consists of row_lengths[i] consecutive entries of `values`, each
    packed at widths[i] bits; every row is independently byte-aligned (so a
    row's slice equals pack(row_values, widths[i])). Returns
    (blob, row_byte_offsets, row_byte_lengths). Replaces per-row pack() calls
    whose numpy dispatch overhead dominates for small rows.
    """
    nrows = len(row_lengths)
    E = len(values)
    row_lengths = row_lengths.astype(np.int64, copy=False)
    widths = widths.astype(np.int64, copy=False)
    row_bytes = (row_lengths * widths + 7) // 8
    row_off = np.zeros(nrows, dtype=np.int64)
    if nrows:
        row_off[1:] = np.cumsum(row_bytes)[:-1]
    total_bytes = int(row_off[-1] + row_bytes[-1]) if nrows else 0
    if E == 0 or total_bytes == 0:
        return b"", row_off, row_bytes
    w_per = np.repeat(widths, row_lengths)  # width of each entry
    # exclusive cumsum of entry widths, reset at row starts
    cum = np.cumsum(w_per) - w_per
    starts = np.zeros(nrows, dtype=np.int64)
    starts[1:] = np.cumsum(row_lengths)[:-1]
    nonempty = row_lengths > 0
    row_cum0 = np.zeros(nrows, dtype=np.int64)
    row_cum0[nonempty] = cum[starts[nonempty]]
    within = cum - np.repeat(row_cum0, row_lengths)
    entry_bit_off = np.repeat(row_off * 8, row_lengths) + within
    total_w = int(w_per.sum())
    intra = np.arange(total_w, dtype=np.int64) - np.repeat(cum, w_per)
    dst = np.repeat(entry_bit_off, w_per) + intra
    src_row = np.repeat(np.arange(E, dtype=np.int64), w_per)
    src_col = np.repeat(64 - w_per, w_per) + intra
    bits64 = np.unpackbits(
        values.astype(">u8").view(np.uint8).reshape(E, 8), axis=1
    )
    flat = np.zeros(total_bytes * 8, dtype=np.uint8)
    flat[dst] = bits64[src_row, src_col]
    return np.packbits(flat).tobytes(), row_off, row_bytes


def pack_many(blocks: np.ndarray, width: int, mask_values: bool = True) -> list[bytes]:
    """Pack each row of a 2-D array at `width` bits in ONE vectorized call.

    All rows share the same length L, so each packed chunk is exactly
    packed_size(L, width) bytes when L*width % 8 == 0 (true for L=512 and any
    closed width); caller must guarantee that. Returns one bytes per row.
    """
    nb, L = blocks.shape
    if nb == 0:
        return []
    per = L * width
    assert per % 8 == 0, "pack_many requires byte-aligned rows"
    blob = pack(blocks.ravel(), width, mask_values=mask_values)
    step = per // 8
    return [blob[i * step : (i + 1) * step] for i in range(nb)]
