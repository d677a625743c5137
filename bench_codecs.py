"""Single-thread per-column codec throughput vs liborc (BENCH.md §2).

Measures the ENGINE's full column path — stripe.encode_stripe /
decode_stripe on a one-column RecordBatch (stats, codec choice, zstd,
footer) — against liborc (pyarrow.orc, ORC C++) writing/reading the SAME
column with zstd, single thread both sides. int32 tokens reproduce the
original §2 row; float32 / float64 / timestamp cover the r4 column types
(VERDICT r4 #7 asked for these numbers).

This host's throughput swings with noisy neighbors (BENCH.md §3): each
measurement runs `reps` back-to-back and reports the BEST rep, and the
script prints a same-process memcpy control so readers can place the
numbers against the host's capacity that minute.

Usage: python bench_codecs.py [--n 8000000] [--reps 3]
Prints one JSON line per path plus the control.
"""

from __future__ import annotations

import argparse
import io
import json
import time

import numpy as np
import pyarrow as pa
import pyarrow.orc as paorc

from orc_spark.stripe import decode_stripe, encode_stripe


def _cols(n: int, seed: int = 42) -> dict[str, pa.Array]:
    rng = np.random.RandomState(seed)
    # zipf-ish token ids — the canonical stream (matches fixtures' shape)
    toks = (rng.zipf(1.3, n).astype(np.int64) % 50257).astype(np.int32)
    f32 = (rng.randn(n) * 12.5).astype(np.float32)
    f64 = rng.randn(n) * 1e4 + 5e4
    # time-ordered epoch micros with jitter — where DELTA shines, like a log
    ts = np.cumsum(rng.randint(1, 2_000_000, n)).astype(np.int64) + 1_700_000_000_000_000
    return {
        "int32_tokens": pa.array(toks, type=pa.int32()),
        "float32": pa.array(f32, type=pa.float32()),
        "float64": pa.array(f64, type=pa.float64()),
        "timestamp_us": pa.array(ts, type=pa.timestamp("us")),
    }


def _best(fn, reps: int) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def bench_engine(name: str, arr: pa.Array, reps: int) -> dict:
    rb = pa.RecordBatch.from_arrays([arr], [name])
    blob, footer = encode_stripe(rb)  # warm-up + bytes for decode
    enc_s = _best(lambda: encode_stripe(rb), reps)
    dec_s = _best(lambda: decode_stripe(blob, footer), reps)
    out = decode_stripe(blob, footer)
    assert out.column(0).equals(arr), f"{name}: decode != input"
    return {"enc_s": enc_s, "dec_s": dec_s, "bytes": len(blob)}


def bench_liborc(name: str, arr: pa.Array, reps: int) -> dict:
    t = pa.table({name: arr})

    def write() -> bytes:
        buf = io.BytesIO()
        paorc.write_table(t, buf, compression="zstd")
        return buf.getvalue()

    data = write()
    enc_s = _best(write, reps)
    dec_s = _best(lambda: paorc.read_table(io.BytesIO(data)), reps)
    return {"enc_s": enc_s, "dec_s": dec_s, "bytes": len(data)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8_000_000)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    # host-capacity control: single-thread big memcpy GB/s
    big = np.zeros(1 << 28, dtype=np.uint8)  # zeros: fault pages in before timing
    _ = big.copy()
    ctl = (1 << 28) / _best(lambda: big.copy(), 5) / 1e9
    print(json.dumps({"control_memcpy_gbs": round(ctl, 2), "n": args.n}))

    for name, arr in _cols(args.n).items():
        eng = bench_engine(name, arr, args.reps)
        ref = bench_liborc(name, arr, args.reps)
        mv = args.n / 1e6
        print(json.dumps({
            "path": name,
            "engine_enc_mvals_s": round(mv / eng["enc_s"], 1),
            "engine_dec_mvals_s": round(mv / eng["dec_s"], 1),
            "liborc_enc_mvals_s": round(mv / ref["enc_s"], 1),
            "liborc_dec_mvals_s": round(mv / ref["dec_s"], 1),
            "engine_bytes": eng["bytes"],
            "liborc_bytes": ref["bytes"],
        }))


if __name__ == "__main__":
    main()
