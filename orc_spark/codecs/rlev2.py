"""ORC RLEv2 integer codec — vectorized numpy encoder/decoder, from scratch.

Wire format per the public ORC v1 spec ([ORCv1]) and probe-confirmed against
liborc (SURVEY.md Appendix A/B):

  SHORT_REPEAT  00WWWRRR                      W+1 value byte-width, R+3 repeats
  DIRECT        01WWWWWL LLLLLLLL             closed 5-bit width, 9-bit len-1
  PATCHED_BASE  10WWWWWL LLLLLLLL BBBPPPPP GGGNNNNN
  DELTA         11WWWWWL LLLLLLLL             W=0 => fixed delta

The decoder parses any conformant stream (validated against golden vectors cut
from real liborc files in tests/test_rlev2_conformance.py). The encoder makes
its sub-encoding decision per 512-value block with all statistics computed
vectorized across blocks; only per-RUN header assembly touches Python ints
(~n/512 iterations, never per value).

`signed=False` streams skip zigzag (our own extension, recorded in our stripe
footer; liborc int columns are always signed).
"""

from __future__ import annotations

import numpy as np

from .bitpack import (
    bit_length,
    bit_length_u8,
    closest_width,
    decode_width,
    encode_width,
    pack,
    pack_many,
    packed_size,
    unpack,
    unpack_u32,
    varpack_rows,
)
from .varint import (
    read_svarint,
    read_uvarint,
    unzigzag,
    write_svarint,
    write_uvarint,
    zigzag,
)

BLOCK = 512

# LUTs over actual widths 0..64 -> closed width / 5-bit code (vectorized map).
_CLOSED_LUT = np.array([closest_width(w) for w in range(65)], dtype=np.int64)
_CODE_LUT = np.array([encode_width(closest_width(w)) for w in range(65)], dtype=np.int64)


def _uvarint_len(u: np.ndarray) -> np.ndarray:
    """Byte length of the LEB128 encoding, vectorized (uint64 in)."""
    return np.maximum(1, (bit_length(u) + 6) // 7)


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

def encode_rlev2(arr, signed: bool = True) -> bytes:
    a = np.ascontiguousarray(arr)
    n = len(a)
    if n == 0:
        return b""
    # narrow fast path: unsigned streams whose values fit 31 bits (token ids,
    # lengths) run the whole stats+pack pipeline in uint32 — half the memory
    # traffic, which is what the encoder is bound by at high core counts
    narrow = (
        not signed
        and a.dtype in (np.int32, np.uint32, np.int16, np.uint16)
        and int(a.min()) >= 0
        and int(a.max()) < (1 << 31)
    )
    if narrow:
        a32 = a.view(np.uint32) if a.dtype == np.int32 else a.astype(np.uint32, copy=False)
        nb = n // BLOCK
        chunks: list[bytes] = []
        if nb:
            chunks.extend(
                _encode_full_blocks(a32[: nb * BLOCK].reshape(nb, BLOCK), False, narrow=True)
            )
        tail = a32[nb * BLOCK :]
        if len(tail):
            chunks.append(_encode_block_scalar(tail.astype(np.int64), False))
        return b"".join(chunks)
    a = a.astype(np.int64, copy=False)
    nb = n // BLOCK
    chunks = []
    if nb:
        chunks.extend(_encode_full_blocks(a[: nb * BLOCK].reshape(nb, BLOCK), signed))
    tail = a[nb * BLOCK :]
    if len(tail):
        chunks.append(_encode_block_scalar(tail, signed))
    return b"".join(chunks)


def _encode_full_blocks(M: np.ndarray, signed: bool, narrow: bool = False) -> list[bytes]:
    """M: (B, 512) int64, or uint32 with values < 2^31 when narrow=True
    (then signed is False and every dtype-sensitive step stays 32-bit)."""
    B = M.shape[0]
    with np.errstate(over="ignore"):
        if narrow:
            zz = M  # uint32, already non-negative
        else:
            zz = zigzag(M) if signed else M.view(np.uint64)

        # --- DIRECT cost -------------------------------------------------
        zzmax = zz.max(axis=1)
        w_dir = _CLOSED_LUT[bit_length(zzmax)]
        cost_direct = 2 + 64 * w_dir  # 512*w/8

        # block min/max in the VALUE domain (narrow: zz IS M; wide signed:
        # zz is zigzagged, so take real extremes separately — wide is rare)
        base = M.min(axis=1)
        Mmax = zzmax.view(M.dtype) if (narrow or not signed) else M.max(axis=1)

        # --- DELTA eligibility + cost ------------------------------------
        # endpoint monotonicity screen BEFORE materializing the full (B, 511)
        # diff array: a monotone (or constant) block's first/last values ARE
        # its extremes, and per-block min/max already exist — so the screen
        # reads 2 columns instead of a strided sample (whose 64 B cache-line
        # stride would re-read the whole array from DRAM). No false
        # negatives; false positives just run the exact per-block diff.
        # Typical token streams: ~0 candidates.
        Msigned = M.view(np.int32) if narrow else M
        first, last = M[:, 0], M[:, -1]
        cand = ((first == base) & (last == Mmax)) | (
            (first == Mmax) & (last == base)
        )
        cidx = np.nonzero(cand)[0]

        fd = np.zeros(B, dtype=np.int64)
        const_delta = np.zeros(B, dtype=bool)
        mono_ok = np.zeros(B, dtype=bool)
        diffsC = None  # full diffs for candidate blocks only
        if len(cidx):
            # narrow: diff on the int32 view (values < 2^31 so deltas fit
            # int32); uint32 diff would wrap on decreasing runs
            diffsC = np.diff(Msigned[cidx], axis=1)  # (C, 511)
            dminC = diffsC.min(axis=1)
            dmaxC = diffsC.max(axis=1)
            fdC = diffsC[:, 0]
            # int64-overflow guard: diffs only trustworthy when the block's
            # value range fits in 63 bits (always true in narrow mode)
            if narrow:
                range_ok = np.ones(len(cidx), dtype=bool)
            else:
                range_ok = (
                    Mmax[cidx].view(np.uint64) - base[cidx].view(np.uint64)
                ) < (np.uint64(1) << np.uint64(63))
            fd[cidx] = fdC
            const_delta[cidx] = (dminC == dmaxC) & range_ok
            mono_ok[cidx] = ((dminC >= 0) | ((dmaxC <= 0) & (fdC < 0))) & range_ok
        if narrow:
            base_enc = M[:, 0].astype(np.uint64)
        else:
            base_enc = zigzag(M[:, 0]) if signed else M[:, 0].view(np.uint64)
        vl_base = _uvarint_len(base_enc)
        vl_fd = _uvarint_len(zigzag(fd))
        cost_delta_fixed = np.where(const_delta, 2 + vl_base + vl_fd, 1 << 30)

        # delta-packed stats only for eligible blocks (lazy: monotone blocks
        # are rare in token streams, and abs() over all diffs is a big copy)
        w_dp = np.zeros(B, dtype=np.int64)
        cost_delta_packed = np.full(B, 1 << 30, dtype=np.int64)
        dp_mask = mono_ok & ~const_delta
        dp_idx = np.nonzero(dp_mask)[0]
        if len(dp_idx):
            dp_in_c = np.nonzero(dp_mask[cidx])[0]
            dabs = np.abs(diffsC[dp_in_c, 1:])
            dabs_max = (
                dabs.view(np.uint32) if narrow else dabs.view(np.uint64)
            ).max(axis=1)
            w_dp[dp_idx] = _CLOSED_LUT[np.maximum(bit_length(dabs_max.astype(np.uint64)), 2)]  # width 1 invalid in DELTA
            cost_delta_packed[dp_idx] = (
                2 + vl_base[dp_idx] + vl_fd[dp_idx] + (510 * w_dp[dp_idx] + 7) // 8
            )

        # --- PATCHED_BASE estimate ---------------------------------------
        if narrow:
            reduced = M - base[:, None]  # uint32, exact (M >= base)
        else:
            reduced = M.view(np.uint64) - base[:, None].view(np.uint64)
        # bit lengths straight to uint8 (float32-exponent kernel) + partition
        # (two order statistics, not a full sort) — the per-value stats pass
        # is the hot loop at 100-core concurrency, where DRAM bandwidth is
        # the binding constraint, so every pass here is width-minimal
        blr = bit_length_u8(reduced.reshape(-1)).reshape(B, BLOCK)
        # single-kth partition (cheaper than two order statistics): the top-32
        # slice then contains the 32 largest, so its max IS the row max
        part = np.partition(blr, BLOCK - 32, axis=1)
        wp_raw = np.maximum(part[:, BLOCK - 32].astype(np.int64), 1)  # <=31 above
        wp = _CLOSED_LUT[wp_raw]
        w100 = part[:, BLOCK - 32 :].max(axis=1).astype(np.int64)
        # any blr > wp (>= the rank-(BLOCK-32) order statistic) lives in the
        # top-32 positions of the partitioned row: count 32 values, not 512
        npatch_est = (part[:, BLOCK - 32 :] > wp.astype(np.uint8)[:, None]).sum(axis=1)
        pw_est = _CLOSED_LUT[np.maximum(w100 - wp, 1)]
        if narrow:
            bw = np.minimum((bit_length(base.astype(np.uint64)) + 1 + 7) // 8, 8)
        else:
            bw = np.minimum((bit_length(np.abs(base).view(np.uint64)) + 1 + 7) // 8, 8)
        bw = np.maximum(bw, 1)
        cfb_est = _CLOSED_LUT[np.minimum(8 + pw_est, 64)]
        cost_patched = np.where(
            (w100 > wp)
            & (npatch_est > 0)
            & (npatch_est <= 31)
            & (wp + pw_est <= 64)
            & (narrow | (base > np.iinfo(np.int64).min)),  # abs(base) overflow
            4 + bw + 64 * wp + (npatch_est * cfb_est + 7) // 8,
            1 << 30,
        )

        costs = np.stack([cost_delta_fixed, cost_delta_packed, cost_direct, cost_patched])
        choice = np.argmin(costs, axis=0)

    out: list[bytes | None] = [None] * B

    # DIRECT: group by width, one pack call per width
    dir_idx = np.nonzero(choice == 2)[0]
    if len(dir_idx):
        for w in np.unique(w_dir[dir_idx]):
            idx = dir_idx[w_dir[dir_idx] == w]
            hdr = bytes([0x40 | (encode_width(int(w)) << 1) | 1, 0xFF])
            for i, body in zip(idx, pack_many(zz[idx], int(w), mask_values=False)):
                out[i] = hdr + body

    # DELTA fixed
    for i in np.nonzero(choice == 0)[0]:
        buf = bytearray([0xC0 | 1, 0xFF])
        _write_base(buf, int(M[i, 0]), signed)
        write_svarint(buf, int(fd[i]))
        out[i] = bytes(buf)

    # DELTA packed (delta-chosen blocks are always screen candidates, so
    # their full diff rows exist in diffsC)
    for i in np.nonzero(choice == 1)[0]:
        w = int(w_dp[i])
        buf = bytearray([0xC0 | (encode_width(w) << 1) | 1, 0xFF])
        _write_base(buf, int(M[i, 0]), signed)
        write_svarint(buf, int(fd[i]))
        dline = np.abs(diffsC[np.searchsorted(cidx, i), 1:])
        body = pack(dline.view(np.uint32) if narrow else dline.view(np.uint64), w, mask_values=False)
        out[i] = bytes(buf) + body

    # PATCHED_BASE — fully vectorized across blocks: per-block widths/gaps via
    # reduceat over one flat nonzero pass, low bits via pack_many per width
    # group, patch entries via one varpack_rows call. The final loop only
    # concatenates precomputed byte slices.
    pat_idx = np.nonzero(choice == 3)[0]
    if len(pat_idx):
        with np.errstate(over="ignore"):
            blrP = blr[pat_idx]
            wpP = wp[pat_idx]
            maskP = blrP > wpP.astype(np.uint8)[:, None]
            counts = maskP.sum(axis=1)
            rows, cols = np.nonzero(maskP)
            starts = np.zeros(len(pat_idx), dtype=np.int64)
            starts[1:] = np.cumsum(counts)[:-1]
            prev = np.empty_like(cols)
            prev[1:] = cols[:-1]
            prev[starts] = 0  # first patch's gap is its absolute index
            gaps = (cols - prev).astype(np.uint64)
            redP = reduced[pat_idx]
            pv = redP[rows, cols].astype(np.uint64) >> wpP[rows].astype(np.uint64)
            # gaps > 255 don't fit the 8-bit gap field: split with (255, 0)
            # dummy entries, exactly as the ORC writer does
            if bool((gaps > 255).any()):
                ndum = np.maximum(
                    (gaps.astype(np.int64) - 1) // 255, 0
                )
                e = ndum + 1
                ecum = np.cumsum(e) - e
                tot = int(e.sum())
                idx = np.repeat(np.arange(len(gaps)), e)
                pos_in = np.arange(tot) - np.repeat(ecum, e)
                last = pos_in == np.repeat(ndum, e)
                gaps = np.where(
                    last, gaps[idx] - np.uint64(255) * ndum[idx].astype(np.uint64),
                    np.uint64(255),
                )
                pv = np.where(last, pv[idx], np.uint64(0))
                rows = rows[idx]
                counts = np.add.reduceat(e, starts)
                starts = np.zeros(len(pat_idx), dtype=np.int64)
                starts[1:] = np.cumsum(counts)[:-1]
            maxgap = np.maximum.reduceat(gaps, starts)
            pw = _CLOSED_LUT[np.maximum(np.maximum.reduceat(bit_length(pv), starts), 1)]
            pgw = np.maximum(bit_length(maxgap), 1)
            ok = (counts <= 31) & (wpP + pw <= 64) & (pgw <= 8)
            # ineligible rows (gap needs dummy entries / width overflow): DIRECT
            for k in np.nonzero(~ok)[0]:
                i = pat_idx[k]
                w = int(w_dir[i])
                hdr = bytes([0x40 | (encode_width(w) << 1) | 1, 0xFF])
                out[i] = hdr + pack(zz[i], w, mask_values=False)
            okk = np.nonzero(ok)[0]
            if len(okk):
                sel_entries = ok[rows]  # keep only entries of ok rows
                cfb = _CLOSED_LUT[pgw + pw]
                entries = (gaps << np.repeat(pw, counts).astype(np.uint64)) | pv
                eblob, eoff, elen = varpack_rows(
                    entries[sel_entries], counts[okk], cfb[okk]
                )
                # pack() masks to width, so the patched high bits drop out
                # without a separate lowP = reduced & mask pass
                lowSel = redP[okk]
                low_chunks: dict[int, bytes] = {}
                for w in np.unique(wpP[okk]):
                    g = np.nonzero(wpP[okk] == w)[0]
                    for gi, body in zip(g, pack_many(lowSel[g], int(w))):
                        low_chunks[int(gi)] = body
                # headers (4 bytes) vectorized
                bwP = bw[pat_idx][okk]
                hdrs = np.empty((len(okk), 4), dtype=np.uint8)
                hdrs[:, 0] = 0x80 | (_CODE_LUT[wpP[okk]] << 1) | 1
                hdrs[:, 1] = 0xFF
                hdrs[:, 2] = ((bwP - 1) << 5) | _CODE_LUT[pw[okk]]
                hdrs[:, 3] = ((pgw[okk] - 1) << 5) | counts[okk]
                # base bytes: big-endian magnitude, MSB = sign
                baseP = base[pat_idx][okk]
                mag = np.abs(baseP).astype(">u8").view(np.uint8).reshape(-1, 8)
                neg = np.nonzero(baseP < 0)[0]
                mag = mag.copy()
                mag[neg, 8 - bwP[neg]] |= 0x80
                for k in range(len(okk)):
                    i = pat_idx[okk[k]]
                    bwk = int(bwP[k])
                    out[i] = (
                        hdrs[k].tobytes()
                        + mag[k, 8 - bwk :].tobytes()
                        + low_chunks[k]
                        + eblob[eoff[k] : eoff[k] + elen[k]]
                    )

    return out  # type: ignore[return-value]


def _write_base(buf: bytearray, base: int, signed: bool) -> None:
    if signed:
        write_svarint(buf, base)
    else:
        write_uvarint(buf, base)


def _encode_block_scalar(block: np.ndarray, signed: bool) -> bytes:
    """Tail blocks (< 512 values) and tiny arrays."""
    L = len(block)
    vals = block.astype(np.int64, copy=False)
    with np.errstate(over="ignore"):
        zz = zigzag(vals) if signed else vals.view(np.uint64)
        range_ok = (
            int(vals.max()) - int(vals.min()) < 1 << 63 if L else True
        )
        if L >= 3 and range_ok and (vals == vals[0]).all():
            if L <= 10:
                # SHORT_REPEAT
                v = int(zz[0])
                w = max(1, (int(bit_length(np.array([v], dtype=np.uint64))[0]) + 7) // 8)
                hdr = ((w - 1) << 3) | (L - 3)
                return bytes([hdr]) + v.to_bytes(w, "big")
            buf = bytearray([0xC0 | ((L - 1) >> 8), (L - 1) & 0xFF])
            _write_base(buf, int(vals[0]), signed)
            write_svarint(buf, 0)
            return bytes(buf)
        if L >= 3 and range_ok:
            diffs = np.diff(vals)
            if diffs.min() == diffs.max():
                buf = bytearray([0xC0 | ((L - 1) >> 8), (L - 1) & 0xFF])
                _write_base(buf, int(vals[0]), signed)
                write_svarint(buf, int(diffs[0]))
                return bytes(buf)
            if (diffs >= 0).all() or ((diffs <= 0).all() and diffs[0] < 0):
                dabs = np.abs(diffs[1:]).view(np.uint64)
                w = closest_width(max(2, int(bit_length(dabs).max()) if len(dabs) else 2))
                w_dir = closest_width(max(1, int(bit_length(zz).max())))
                cost_delta = 4 + (max(0, L - 2) * w + 7) // 8
                cost_dir = 2 + (L * w_dir + 7) // 8
                if cost_delta < cost_dir:
                    buf = bytearray(
                        [0xC0 | (encode_width(w) << 1) | ((L - 1) >> 8), (L - 1) & 0xFF]
                    )
                    _write_base(buf, int(vals[0]), signed)
                    write_svarint(buf, int(diffs[0]))
                    return bytes(buf) + pack(dabs, w, mask_values=False)
        # DIRECT fallback
        w = closest_width(max(1, int(bit_length(zz).max())))
        hdr = bytes([0x40 | (encode_width(w) << 1) | ((L - 1) >> 8), (L - 1) & 0xFF])
        return hdr + pack(zz, w, mask_values=False)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

def decode_rlev2(buf, n: int, signed: bool = True, dtype=np.int64) -> np.ndarray:
    """Decode `n` values from an RLEv2 stream (ours or liborc's).

    Two-phase batched decode: a light header scan collects every full
    512-value DIRECT / PATCHED_BASE run (the overwhelmingly common shapes
    from our encoder) into per-width groups, then each group is gathered and
    unpacked in ONE vectorized call — turning ~n/512 small unpack calls into
    a handful of large ones. Odd-length runs, SHORT_REPEAT, and DELTA decode
    inline as before, so any conformant stream (including liborc's) still
    parses. `dtype=np.int32` is the narrow output path for streams whose
    footer stats prove 0 <= min <= max < 2^31: half the output traffic and
    no int64 widening on the hot DIRECT path."""
    if dtype == np.int32 and signed:
        raise ValueError("narrow int32 decode requires an unsigned stream")
    out = np.empty(n, dtype=dtype)
    mv = memoryview(buf).cast("B")  # pa.Buffer memoryviews are signed by default
    i = 0
    filled = 0
    dir_runs: list[tuple[int, int, int]] = []  # (width, byte_off, out_off)
    pat_runs: list[tuple] = []  # (w, base, pw, pll, cfb, low_off, patch_off, out_off)
    with np.errstate(over="ignore"):
        while filled < n:
            hdr = mv[i]
            kind = hdr >> 6
            if kind == 0:  # SHORT_REPEAT
                w = ((hdr >> 3) & 7) + 1
                rep = (hdr & 7) + 3
                v = int.from_bytes(mv[i + 1 : i + 1 + w], "big")
                if signed:
                    v = (v >> 1) ^ -(v & 1)
                out[filled : filled + rep] = v
                filled += rep
                i += 1 + w
            elif kind == 1:  # DIRECT
                w = decode_width((hdr >> 1) & 0x1F)
                L = (((hdr & 1) << 8) | mv[i + 1]) + 1
                i += 2
                nbytes = packed_size(L, w)
                if L == BLOCK:
                    dir_runs.append((w, i, filled))
                else:
                    vals = unpack(mv[i : i + nbytes], L, w)
                    out[filled : filled + L] = (
                        unzigzag(vals) if signed else vals.view(np.int64)
                    )
                i += nbytes
                filled += L
            elif kind == 3:  # DELTA
                wcode = (hdr >> 1) & 0x1F
                L = (((hdr & 1) << 8) | mv[i + 1]) + 1
                i += 2
                if signed:
                    base, i = read_svarint(mv, i)
                else:
                    base, i = read_uvarint(mv, i)
                fd, i = read_svarint(mv, i)
                if wcode == 0:
                    seg = base + fd * np.arange(L, dtype=np.int64)
                else:
                    w = decode_width(wcode)
                    nbytes = packed_size(L - 2, w)
                    d = unpack(mv[i : i + nbytes], L - 2, w).view(np.int64)
                    i += nbytes
                    sign = -1 if fd < 0 else 1
                    deltas = np.empty(L - 1, dtype=np.int64)
                    deltas[0] = fd
                    deltas[1:] = sign * d
                    seg = np.empty(L, dtype=np.int64)
                    seg[0] = base
                    seg[1:] = base + np.cumsum(deltas)
                out[filled : filled + L] = seg
                filled += L
            else:  # PATCHED_BASE
                w = decode_width((hdr >> 1) & 0x1F)
                L = (((hdr & 1) << 8) | mv[i + 1]) + 1
                bw = ((mv[i + 2] >> 5) & 7) + 1
                pw = decode_width(mv[i + 2] & 0x1F)
                pgw = ((mv[i + 3] >> 5) & 7) + 1
                pll = mv[i + 3] & 0x1F
                i += 4
                raw = int.from_bytes(mv[i : i + bw], "big")
                msb = 1 << (bw * 8 - 1)
                base = -(raw & (msb - 1)) if raw & msb else raw
                i += bw
                nbytes = packed_size(L, w)
                cfb = closest_width(pgw + pw)
                pbytes = packed_size(pll, cfb) if pll else 0
                if L == BLOCK:
                    pat_runs.append((w, base, pw, pll, cfb, i, i + nbytes, filled))
                    i += nbytes + pbytes
                else:
                    vals = unpack(mv[i : i + nbytes], L, w)
                    i += nbytes
                    if pll:
                        entries = unpack(mv[i : i + pbytes], pll, cfb)
                        i += pbytes
                        gaps = (entries >> np.uint64(pw)).astype(np.int64)
                        patches = entries & ((np.uint64(1) << np.uint64(pw)) - np.uint64(1))
                        pos = np.cumsum(gaps)
                        vals[pos] |= patches << np.uint64(w)
                    out[filled : filled + L] = vals.view(np.int64) + np.int64(base)
                filled += L
    if filled != n:
        raise ValueError(f"RLEv2 stream decoded {filled} values, expected {n}")
    if dir_runs or pat_runs:
        _decode_batched(mv, out, dir_runs, pat_runs, signed)
    return out


def _extract_patches(buf8: np.ndarray, sel: list) -> tuple | None:
    """Vectorized patch-list extraction for a group of full PATCHED_BASE runs
    (the tail of the two-phase decode — previously a per-run Python loop of
    ~n/512 small unpack+cumsum calls, the last per-block loop on the decode
    hot path for outlier-heavy data).

    Every patch entry is a cfb-bit big-endian field at bit j*cfb of its run's
    byte-aligned patch list. All entries of all runs extract in one pass: an
    8-byte gather window per entry, big-endian u64 combine, shift/mask (cfb
    <= 40 always fits the top of the window; trailing window bytes past the
    field — including any clamped past the buffer end — are shifted out).
    Patch positions are per-run *inclusive* cumsums of the gap fields,
    computed as one segmented cumsum.

    Returns (run_row, pos, patches) concatenated over runs with pll > 0, or
    None when no run carries patches."""
    rows = np.array([k for k, r in enumerate(sel) if r[3]], dtype=np.int64)
    if not len(rows):
        return None
    pw = np.array([sel[k][2] for k in rows], dtype=np.int64)
    pll = np.array([sel[k][3] for k in rows], dtype=np.int64)
    cfb = np.array([sel[k][4] for k in rows], dtype=np.int64)
    poff = np.array([sel[k][6] for k in rows], dtype=np.int64)
    n_entries = int(pll.sum())
    rid = np.repeat(np.arange(len(rows)), pll)
    starts = np.r_[0, np.cumsum(pll)[:-1]]
    j = np.arange(n_entries, dtype=np.int64) - np.repeat(starts, pll)
    bitoff = j * cfb[rid]
    byte = poff[rid] + (bitoff >> 3)
    win = buf8[np.minimum(byte[:, None] + np.arange(8), len(buf8) - 1)]
    u = np.ascontiguousarray(win).view(">u8")[:, 0].astype(np.uint64)
    sh = (64 - cfb[rid] - (bitoff & 7)).astype(np.uint64)
    cfb_e = cfb[rid].astype(np.uint64)
    # cfb == 64 is reachable (e.g. pw=56 + pgw=8) and numpy's shift by the
    # full word width is UNDEFINED — build the mask branch-free without a
    # 64-bit shift. (sh stays safe: cfb=64 forces bitoff % 8 == 0, sh = 0.)
    mask = np.where(
        cfb_e >= 64,
        np.uint64(0xFFFFFFFFFFFFFFFF),
        (np.uint64(1) << (cfb_e & np.uint64(63))) - np.uint64(1),
    )
    entries = (u >> sh) & mask
    pw_e = pw[rid].astype(np.uint64)
    gaps = (entries >> pw_e).astype(np.int64)
    patches = entries & ((np.uint64(1) << pw_e) - np.uint64(1))
    c = np.cumsum(gaps)
    pos = c - np.repeat(c[starts] - gaps[starts], pll)
    return rows[rid], pos, patches


def _decode_batched(
    mv, out: np.ndarray, dir_runs: list, pat_runs: list, signed: bool
) -> None:
    """Vectorized execution of collected full-block runs: per width group,
    one fancy-index gather of the packed bytes + one unpack + one scatter.
    The narrow (int32 out, width <= 32, unsigned) groups stay in uint32 end
    to end — no int64 widening anywhere on the path."""
    buf8 = np.frombuffer(mv, dtype=np.uint8)
    narrow_out = out.dtype == np.int32 and not signed
    span = np.arange(BLOCK, dtype=np.int64)
    with np.errstate(over="ignore"):
        if dir_runs:
            dr = np.array(dir_runs, dtype=np.int64)
            for w in np.unique(dr[:, 0]):
                g = dr[dr[:, 0] == w]
                nbytes = packed_size(BLOCK, int(w))
                mat = buf8[g[:, 1, None] + np.arange(nbytes)]
                idx = (g[:, 2, None] + span).ravel()
                if narrow_out and w <= 32:
                    out[idx] = unpack_u32(mat.ravel(), len(g) * BLOCK, int(w)).view(
                        np.int32
                    )
                else:
                    vals = unpack(mat.ravel(), len(g) * BLOCK, int(w))
                    out[idx] = unzigzag(vals) if signed else vals.view(np.int64)
        if pat_runs:
            ws = np.array([r[0] for r in pat_runs], dtype=np.int64)
            for w in np.unique(ws):
                sel = [r for r in pat_runs if r[0] == w]
                nbytes = packed_size(BLOCK, int(w))
                starts = np.array([r[5] for r in sel], dtype=np.int64)
                mat = buf8[starts[:, None] + np.arange(nbytes)]
                bases = np.array([r[1] for r in sel], dtype=np.int64)
                # narrow patched path: values < 2^31 and base >= 0 (by the
                # caller's stats gate), so low bits, patches, and the base
                # addition all fit uint32 with no wrap. A foreign stream with
                # inaccurate footer stats could still carry w + pw > 32 (the
                # patch shift would overflow the uint32 lane), so such groups
                # fall back to the int64 path instead of decoding garbage.
                maxwp = max(int(r[0]) + (int(r[2]) if r[3] else 0) for r in sel)
                nrw = (
                    narrow_out
                    and w < 32
                    and maxwp <= 32
                    and bases.min(initial=0) >= 0
                )
                if nrw:
                    vals = unpack_u32(mat.ravel(), len(sel) * BLOCK, int(w)).reshape(
                        len(sel), BLOCK
                    )
                else:
                    vals = unpack(mat.ravel(), len(sel) * BLOCK, int(w)).reshape(
                        len(sel), BLOCK
                    )
                pr = _extract_patches(buf8, sel)
                if pr is not None:
                    rk, pos, patches = pr
                    flat = rk * BLOCK + pos  # unique positions: gaps are
                    # strictly positive within a run after the first entry,
                    # so fancy-index |= never double-writes
                    if nrw:
                        vals.ravel()[flat] |= patches.astype(np.uint32) << np.uint32(w)
                    else:
                        vals.ravel()[flat] |= patches << np.uint64(w)
                outs = np.array([r[7] for r in sel], dtype=np.int64)
                tgt = (outs[:, None] + span).ravel()
                if nrw:
                    res32 = vals + bases.astype(np.uint32)[:, None]
                    out[tgt] = res32.view(np.int32).ravel()
                else:
                    res = vals.view(np.int64) + bases[:, None]
                    out[tgt] = res.ravel()
