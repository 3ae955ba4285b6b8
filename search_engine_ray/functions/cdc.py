"""Content-defined chunking (Gear-hash CDC, the FastCDC family).

Fixed-size chunking breaks under insertion: one added byte shifts every
later boundary. CDC places boundaries where a rolling hash of the last
64 bytes hits a mask, so edits only disturb the chunks they touch —
the standard trick behind storage dedup and sub-document duplicate
detection that survives edits (unlike line- or fixed-window hashing).

Hash: h_i = (2·h_{i-1} + gear[b_i]) mod 2^64 (Gear, Xia et al. FAST'16
"FastCDC"); a boundary falls AFTER byte i when (h_i & mask) == 0, subject
to min/max chunk-size clamps (min skips the mask test, max forces a cut).
The gear table derives from splitmix64 — deterministic everywhere.

Because the 2·h recurrence shifts old bytes out of the 64-bit word, h_i
depends on exactly the last 64 bytes:  h_i = Σ_{s=0..63} gear[b_{i-s}]·2^s.
`_gear_hashes` computes that closed form VECTORIZED (64 shifted adds over
the whole byte array — no per-byte Python); only the sparse boundary-
candidate walk (density 2^-avg_bits) runs as a loop.
"""

from __future__ import annotations

import numpy as np

from search_engine_ray.functions.hashing import mix64

_GEAR = mix64(np.arange(256, dtype=np.uint64))


def _gear_hashes(data: np.ndarray) -> np.ndarray:
    """h_i for every position of a uint8 array (closed-form window sum)."""
    g = _GEAR[data]
    h = np.zeros(len(data), np.uint64)
    for s in range(64):
        if s >= len(data):
            break
        # gear[b_{i-s}] << s, contributing to h_i for i >= s
        h[s:] += g[: len(g) - s] << np.uint64(s)
    return h


def gear_hash_scalar(data: bytes) -> list[int]:
    """Scalar spec of the same recurrence (property-test twin)."""
    out, h = [], 0
    for b in data:
        h = ((h << 1) + int(_GEAR[b])) & 0xFFFFFFFFFFFFFFFF
        out.append(h)
    return out


def cdc_boundaries(data: np.ndarray, min_size: int = 64, avg_bits: int = 7,
                   max_size: int = 512) -> np.ndarray:
    """Chunk END offsets (exclusive, ascending, last == len(data)) for one
    byte array. Boundary rule: first mask-hit at least ``min_size`` bytes
    after the previous cut, else a forced cut at ``max_size``; the tail
    remainder is always its own chunk."""
    n = len(data)
    if n == 0:
        return np.zeros(0, np.int64)
    if min_size < 1 or max_size < min_size:
        raise ValueError("require 1 <= min_size <= max_size")
    mask = np.uint64((1 << avg_bits) - 1)
    hits = np.flatnonzero((_gear_hashes(data) & mask) == 0) + 1  # end offsets
    cuts = []
    prev = 0
    while n - prev > min_size:
        # next admissible mask hit: >= prev + min_size, <= prev + max_size,
        # and strictly inside the buffer (a hit at n IS the tail)
        i = np.searchsorted(hits, prev + min_size, side="left")
        if i < len(hits) and hits[i] <= prev + max_size and hits[i] < n:
            prev = int(hits[i])
        elif n - prev > max_size:
            prev += max_size  # no admissible hit — forced cut
        else:
            break  # remainder has no hit and fits: it is the tail chunk
        cuts.append(prev)
    cuts.append(n)
    return np.asarray(cuts, np.int64)
