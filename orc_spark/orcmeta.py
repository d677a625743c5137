"""Minimal ORC footer/stripe-footer parser for UNCOMPRESSED files.

Written from the public ORC v1 spec ([ORCv1]) during the SURVEY.md probes
(Appendix A, PROBE-1). Used as the golden-vector extractor: it slices raw
RLEv2/dictionary streams out of real liborc files so tests can assert that OUR
decoder decodes the REFERENCE writer's actual bytes (SURVEY.md §5.1).

The reference repo (/root/reference, ugm616/orc) is empty — liborc via
pyarrow.orc is the operative reference implementation (BASELINE.json:2).
"""

from __future__ import annotations

ENC = {0: "DIRECT", 1: "DICTIONARY", 2: "DIRECT_V2", 3: "DICTIONARY_V2"}
STREAM = {
    0: "PRESENT",
    1: "DATA",
    2: "LENGTH",
    3: "DICTIONARY_DATA",
    4: "DICTIONARY_COUNT",
    5: "SECONDARY",
    6: "ROW_INDEX",
    7: "BLOOM_FILTER",
    8: "BLOOM_FILTER_UTF8",
}


def _varint(b: bytes, i: int) -> tuple[int, int]:
    r = 0
    s = 0
    while True:
        x = b[i]
        i += 1
        r |= (x & 0x7F) << s
        if not x & 0x80:
            return r, i
        s += 7


def _fields(b: bytes):
    i = 0
    while i < len(b):
        key, i = _varint(b, i)
        fn, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _varint(b, i)
            yield fn, v
        elif wt == 2:
            ln, i = _varint(b, i)
            yield fn, b[i : i + ln]
            i += ln
        elif wt == 5:
            yield fn, b[i : i + 4]
            i += 4
        elif wt == 1:
            yield fn, b[i : i + 8]
            i += 8
        else:
            raise ValueError(f"wire type {wt}")


def parse(path: str) -> list[dict]:
    """Per-stripe stream directory + column encodings of an uncompressed ORC file.

    Each returned dict: {'rows', 'streams': [(column, kind, length, offset)],
    'encodings': [(kind, dictionarySize)]}. Stream offsets are absolute file
    offsets so callers can slice raw stream bytes directly.
    """
    data = open(path, "rb").read()
    ps_len = data[-1]
    ps = data[-1 - ps_len : -1]
    footer_len = None
    comp = None
    for fn, v in _fields(ps):
        if fn == 1:
            footer_len = v
        if fn == 2:
            comp = v
    if comp not in (None, 0):
        raise ValueError(f"file must be uncompressed, got codec {comp}")
    footer = data[-1 - ps_len - footer_len : -1 - ps_len]
    stripes = []
    for fn, v in _fields(footer):
        if fn == 3:
            s = {}
            for f2, v2 in _fields(v):
                s[
                    {1: "offset", 2: "indexLength", 3: "dataLength", 4: "footerLength", 5: "numberOfRows"}.get(
                        f2, f2
                    )
                ] = v2
            stripes.append(s)
    out = []
    for s in stripes:
        sf_off = s["offset"] + s.get("indexLength", 0) + s.get("dataLength", 0)
        sf = data[sf_off : sf_off + s["footerLength"]]
        streams = []
        encodings = []
        # index streams (ROW_INDEX/BLOOM_*) live in the index region at the
        # stripe start; data streams follow after indexLength
        idx_cursor = s["offset"]
        data_cursor = s["offset"] + s.get("indexLength", 0)
        for fn, v in _fields(sf):
            if fn == 1:
                d = {}
                for f2, v2 in _fields(v):
                    d[{1: "kind", 2: "column", 3: "length"}.get(f2, f2)] = v2
                kind = STREAM.get(d.get("kind", -1), d.get("kind"))
                length = d.get("length", 0)
                if kind in ("ROW_INDEX", "BLOOM_FILTER", "BLOOM_FILTER_UTF8"):
                    streams.append((d.get("column", 0), kind, length, idx_cursor))
                    idx_cursor += length
                else:
                    streams.append((d.get("column", 0), kind, length, data_cursor))
                    data_cursor += length
            elif fn == 2:
                d = {"kind": 0}
                for f2, v2 in _fields(v):
                    d[{1: "kind", 2: "dictionarySize"}.get(f2, f2)] = v2
                encodings.append((ENC.get(d["kind"], d["kind"]), d.get("dictionarySize", 0)))
        out.append({"rows": s.get("numberOfRows"), "streams": streams, "encodings": encodings})
    return out


def stream_bytes(path: str, stripe: dict, column: int, kind: str) -> bytes:
    """Raw bytes of one stream of one stripe (uncompressed files only)."""
    data = open(path, "rb").read()
    for col, k, length, off in stripe["streams"]:
        if col == column and k == kind:
            return data[off : off + length]
    raise KeyError(f"stream ({column}, {kind}) not found")
