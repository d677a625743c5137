"""FSST — Fast Static Symbol Table byte-string compression, from scratch.

Named by the north rule (BASELINE.json:6,14) as part of the codec menu; ORC
itself has no FSST, so the format here is ours, modeled on the published FSST
design (Boncz/Neumann/Leis, VLDB 2020 — see PAPERS.md): up to 255 symbols of
1..8 bytes; code 255 is the escape marker (next byte is a literal).

Implementation notes (sandbox: numpy only, no compiled kernel):
- symbol matching is vectorized: an 8-byte sliding window as uint64 compared
  against every symbol prefix (<=255 vector ops over the buffer);
- the greedy longest-match parse is vectorized by pointer doubling over the
  hop graph hop[i] = i + bestlen[i] (log2(n) gather rounds mark the token
  heads) — no per-token Python anywhere in the codec;
- decode is fully vectorized (escape-run parity analysis + gather).

Serialized stream: [uvarint n_sym][n_sym lengths (1B each)][concat symbol
bytes][encoded codes...].
"""

from __future__ import annotations

import numpy as np

from .varint import read_uvarint, write_uvarint

MAX_SYMBOLS = 255
ESCAPE = 255


def _windows(data: np.ndarray) -> np.ndarray:
    """uint64 big-endian 8-byte window starting at each position (zero-padded)."""
    n = len(data)
    pad = np.zeros(n + 8, dtype=np.uint8)
    pad[:n] = data
    w = np.zeros(n, dtype=np.uint64)
    for k in range(8):
        w = (w << np.uint64(8)) | pad[k : k + n].astype(np.uint64)
    return w


def _match_table(data: np.ndarray, symbols: list[bytes]) -> tuple[np.ndarray, np.ndarray]:
    """Per-position longest symbol match: (bestlen, bestcode). bestcode=ESCAPE
    where no symbol matches (emit escape + literal).

    One pass per symbol LENGTH (<=8), not per symbol (<=255): same-length
    symbols have distinct prefixes, so a single sorted-array searchsorted
    resolves all of them at once (length-1 symbols via a 256-entry LUT).
    Lengths ascend so longer matches overwrite shorter — identical matching
    semantics to the per-symbol loop, ~20x fewer full-buffer vector ops
    (this was the compress throughput bottleneck)."""
    n = len(data)
    bestlen = np.ones(n, dtype=np.int64)
    bestcode = np.full(n, ESCAPE, dtype=np.int64)
    if n == 0 or not symbols:
        return bestlen, bestcode
    w = _windows(data)
    by_len: dict[int, list[tuple[int, int]]] = {}
    for c, s in enumerate(symbols):
        p = int.from_bytes(s, "big")
        by_len.setdefault(len(s), []).append((p, c))
    for L in sorted(by_len):
        pairs = sorted(by_len[L])
        if L == 1:
            lut = np.full(256, -1, dtype=np.int64)
            for p, c in pairs:
                lut[p] = c
            codes = lut[data]
            m = codes >= 0
        else:
            pref = w >> np.uint64((8 - L) * 8)
            ps = np.array([p for p, _ in pairs], dtype=np.uint64)
            cs = np.array([c for _, c in pairs], dtype=np.int64)
            idx = np.minimum(np.searchsorted(ps, pref), len(ps) - 1)
            m = ps[idx] == pref
            # max(..., 0): when the buffer is shorter than L-1 a bare
            # n-L+1 slice start would go negative and leave LEADING
            # positions matchable against zero-padded windows (a NUL-tailed
            # symbol longer than the remaining data would then corrupt the
            # round-trip)
            m[max(n - L + 1, 0) :] = False  # would run past the end
            codes = cs[idx]
        bestlen[m] = L
        bestcode[m] = codes[m]
    return bestlen, bestcode


def _token_starts(bestlen: np.ndarray) -> np.ndarray:
    """Positions where greedy left-to-right tokens start — the orbit of 0
    under hop[i] = i + bestlen[i], computed by pointer doubling (log2(n)
    vectorized gather rounds) instead of a per-token Python walk. Escape
    positions have bestlen 1, so the hop graph needs no special casing."""
    n = len(bestlen)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    hop = np.minimum(np.arange(n, dtype=np.int64) + bestlen, n)
    H = np.append(hop, n)  # sentinel: n hops to itself
    A = np.zeros(n + 1, dtype=bool)
    A[0] = True
    steps = 1
    while steps < n:
        # invariant: A marks heads within the first `steps` hops and H is
        # hop^steps — one round doubles both
        A[H[A]] = True
        H = H[H]
        steps <<= 1
    return np.nonzero(A[:n])[0]


def _parse(bestlen: np.ndarray, bestcode: np.ndarray, data: np.ndarray) -> bytes:
    """Greedy token emission, fully vectorized (no per-token Python)."""
    heads = _token_starts(bestlen)
    if len(heads) == 0:
        return b""
    hc = bestcode[heads]
    esc = hc == ESCAPE
    out_lens = np.where(esc, 2, 1)
    offs = np.cumsum(out_lens) - out_lens
    out = np.empty(int(offs[-1] + out_lens[-1]), dtype=np.uint8)
    out[offs] = hc.astype(np.uint8)  # ESCAPE == 255 writes the marker itself
    eidx = np.nonzero(esc)[0]
    out[offs[eidx] + 1] = data[heads[eidx]]
    return out.tobytes()


def train(sample: bytes | np.ndarray, iterations: int = 4) -> list[bytes]:
    """Greedy symbol-table construction: repeatedly parse the sample with the
    current table and promote the highest-gain (frequency x saved-bytes)
    single bytes and adjacent-token concatenations (<=8 bytes)."""
    data = np.frombuffer(bytes(sample), dtype=np.uint8) if not isinstance(sample, np.ndarray) else sample
    if len(data) == 0:
        return []
    data = data[: 1 << 16]  # cap training cost
    symbols: list[bytes] = []
    for _ in range(iterations):
        bestlen, bestcode = _match_table(data, symbols)
        starts = _token_starts(bestlen)
        tok_len = bestlen[starts]
        w = _windows(data)
        gains: dict[bytes, int] = {}
        # candidate 1: current tokens themselves (reinforce kept symbols,
        # promote frequent single bytes out of escape)
        for L in range(1, 9):
            sel = starts[tok_len == L]
            if not len(sel):
                continue
            keys, cnt = np.unique(w[sel] >> np.uint64((8 - L) * 8), return_counts=True)
            for k, c in zip(keys.tolist(), cnt.tolist()):
                s = int(k).to_bytes(L, "big")
                # escape costs 2 bytes/occurrence; a code costs 1
                saved = (L + 1 if L == 1 else L) - 1
                gains[s] = gains.get(s, 0) + int(c) * saved
        # candidate 2: concatenations of adjacent tokens (<=8 bytes)
        if len(starts) > 1:
            pair_len = tok_len[:-1] + tok_len[1:]
            okp = pair_len <= 8
            ps = starts[:-1][okp]
            pl = pair_len[okp]
            for L in np.unique(pl):
                sel = ps[pl == L]
                keys, cnt = np.unique(w[sel] >> np.uint64((8 - int(L)) * 8), return_counts=True)
                for k, c in zip(keys.tolist(), cnt.tolist()):
                    if c < 2:
                        continue
                    s = int(k).to_bytes(int(L), "big")
                    gains[s] = gains.get(s, 0) + int(c) * (int(L) - 1)
        symbols = [s for s, _ in sorted(gains.items(), key=lambda kv: -kv[1])[:MAX_SYMBOLS]]
    return symbols


def compress(data: bytes | np.ndarray, symbols: list[bytes]) -> bytes:
    arr = np.frombuffer(bytes(data), dtype=np.uint8) if not isinstance(data, np.ndarray) else data
    header = bytearray()
    write_uvarint(header, len(symbols))
    header += bytes(len(s) for s in symbols)
    header += b"".join(symbols)
    bestlen, bestcode = _match_table(arr, symbols)
    return bytes(header) + _parse(bestlen, bestcode, arr)


def _read_table(mv, i: int) -> tuple[list[bytes], int]:
    nsym, i = read_uvarint(mv, i)
    lens = bytes(mv[i : i + nsym])
    i += nsym
    syms = []
    for L in lens:
        syms.append(bytes(mv[i : i + L]))
        i += L
    return syms, i


def decompress(buf: bytes) -> bytes:
    """Fully vectorized decode: escape-run parity -> token heads -> gather."""
    mv = memoryview(buf).cast("B")
    symbols, i = _read_table(mv, 0)
    codes = np.frombuffer(mv[i:], dtype=np.uint8)
    n = len(codes)
    if n == 0:
        return b""
    is_esc_marker = np.zeros(n, dtype=bool)
    is_literal = np.zeros(n, dtype=bool)
    m255 = codes == ESCAPE
    if m255.any():
        # maximal runs of 255s: every run starts at a token boundary (a
        # non-255 byte before a run is either a standalone token or the
        # literal of the previous run's odd trailing escape — both end a
        # token). Within a run of length m: positions s, s+2, ... are escape
        # markers; odd offsets are literals; if m is odd, the byte AFTER the
        # run is a literal too.
        d = np.diff(m255.astype(np.int8))
        run_starts = np.nonzero(d == 1)[0] + 1
        if m255[0]:
            run_starts = np.r_[0, run_starts]
        run_ends = np.nonzero(d == -1)[0] + 1  # exclusive
        if m255[-1]:
            run_ends = np.r_[run_ends, n]
        for s, e in zip(run_starts.tolist(), run_ends.tolist()):
            m = e - s
            is_esc_marker[s:e:2] = True
            is_literal[s + 1 : e : 2] = True
            if m % 2 == 1:
                if e >= n:
                    raise ValueError("malformed FSST stream: dangling escape")
                is_literal[e] = True
    # token heads: escape markers plus non-consumed non-255 positions
    is_head = (~is_literal) & (is_esc_marker | ~m255)
    heads = np.nonzero(is_head)[0]
    head_codes = codes[heads]
    esc = head_codes == ESCAPE
    # output lengths per token
    symlen = np.array([len(s) for s in symbols] + [0] * (256 - len(symbols)), dtype=np.int64)
    out_lens = np.where(esc, 1, symlen[head_codes])
    if (out_lens == 0).any():
        raise ValueError("malformed FSST stream: unknown symbol code")
    offs = np.zeros(len(heads) + 1, dtype=np.int64)
    offs[1:] = np.cumsum(out_lens)
    out = np.empty(offs[-1], dtype=np.uint8)
    # literals
    lit_tok = np.nonzero(esc)[0]
    out[offs[lit_tok]] = codes[heads[lit_tok] + 1]
    # symbols: gather from flattened table
    sym_tok = np.nonzero(~esc)[0]
    if len(sym_tok):
        flat = np.frombuffer(b"".join(symbols), dtype=np.uint8)
        sym_off = np.zeros(len(symbols), dtype=np.int64)
        sym_off[1:] = np.cumsum(symlen[: len(symbols)])[:-1]
        tl = out_lens[sym_tok]
        tot = int(tl.sum())
        cum = np.cumsum(tl) - tl
        intra = np.arange(tot, dtype=np.int64) - np.repeat(cum, tl)
        src = np.repeat(sym_off[head_codes[sym_tok]], tl) + intra
        dst = np.repeat(offs[sym_tok], tl) + intra
        out[dst] = flat[src]
    return out.tobytes()
