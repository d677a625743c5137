"""Deterministic fixture synthesis (FIXTURES.md F1/F2). No external data.

F1 canonical tokens table: the exact draw order matters for reproducibility —
(1) lognormal lengths, (2) ONE flat zipf draw sliced by cumulative offsets,
(3) source choice. BASELINE.md numbers were measured on tier='t-bench'.
"""

from __future__ import annotations

import numpy as np

VOCAB = 50257
SOURCES = ["cc", "web", "books", "wiki", "code"]

TIERS = {"t-unit": 200, "t-small": 2_000, "t-bench": 20_000}


def tokens_table(n_docs: int, seed: int = 42) -> dict[str, np.ndarray | list]:
    """Columns of the canonical table: doc_id, tokens (list of int32 arrays),
    n_tok, source. Matches BASELINE.json:15's input hint shape."""
    rng = np.random.RandomState(seed)
    lens = np.clip(rng.lognormal(5.5, 1.0, n_docs).astype(int), 1, 8192)
    flat = ((rng.zipf(1.2, int(lens.sum())) - 1) % VOCAB).astype(np.int32)
    offs = np.zeros(n_docs + 1, dtype=np.int64)
    offs[1:] = np.cumsum(lens)
    toks = [flat[offs[i] : offs[i + 1]] for i in range(n_docs)]
    src = rng.choice(SOURCES, n_docs)
    return {
        "doc_id": np.array([f"doc-{i:010d}" for i in range(n_docs)]),
        "tokens": toks,
        "n_tok": lens.astype(np.int32),
        "source": src,
        "_flat": flat,
        "_offsets": offs,
    }


def tokens_arrow(n_docs: int, seed: int = 42):
    """Same table as a pyarrow.Table (tokens as list<int32>)."""
    import pyarrow as pa

    t = tokens_table(n_docs, seed)
    tokens = pa.ListArray.from_arrays(
        pa.array(t["_offsets"], type=pa.int32()), pa.array(t["_flat"], type=pa.int32())
    )
    return pa.table(
        {
            "doc_id": pa.array(t["doc_id"], type=pa.string()),
            "tokens": tokens,
            "n_tok": pa.array(t["n_tok"], type=pa.int32()),
            "source": pa.array(t["source"], type=pa.string()),
        }
    )


def codec_stress_columns(n: int = 50_000, seed: int = 42) -> dict[str, np.ndarray]:
    """F2 single-column conformance/stress vectors (SURVEY.md [PROBE-1/2])."""
    rng = np.random.RandomState(seed)
    return {
        "int_constant": np.full(n, 7, dtype=np.int64),
        "tiny_repeat": np.full(8, 7, dtype=np.int64),
        "int_increasing": np.arange(n, dtype=np.int64),
        "int_small_range": rng.randint(0, 100, n).astype(np.int64),
        "int_outliers": np.where(
            rng.rand(n) < 0.01, 10**15, rng.randint(0, 512, n)
        ).astype(np.int64),
        "int_random64": rng.randint(-(2**62), 2**62, n).astype(np.int64),
    }


def stress_strings(n: int = 50_000, seed: int = 42) -> dict[str, np.ndarray]:
    rng = np.random.RandomState(seed)
    return {
        "str_low_card": rng.choice(["cc", "web", "books", "wiki"], n),
        "str_high_card": np.array([f"doc-{i:012x}" for i in range(n)]),
    }
