"""PRESENT (null) bitmap stream — elided when a column has no nulls, matching
the reference writer's behavior (SURVEY.md [PROBE-1]: liborc emits no PRESENT
stream on null-free columns).

Format (ours): MSB-first validity bits (1 = present) packed to bytes.
"""

from __future__ import annotations

import numpy as np


def encode_present(valid: np.ndarray) -> bytes:
    """bool array (True = present) -> packed bitmap."""
    return np.packbits(valid.astype(np.uint8)).tobytes()


def decode_present(buf: bytes, n: int) -> np.ndarray:
    return np.unpackbits(np.frombuffer(buf, dtype=np.uint8), count=n).astype(bool)
