"""MinHash / SimHash sketches for near-duplicate detection (public
algorithms: Broder'97 minwise hashing; Charikar'02 simhash; banding per
Mining of Massive Datasets ch.3). Deterministic, vectorized.
"""

from __future__ import annotations

import numpy as np

from search_engine_ray.functions.hashing import mix64

_U64 = np.uint64
_MERSENNE61 = _U64((1 << 61) - 1)


class MinHasher:
    """num_perm universal hash functions h_i(x) = (a_i x + b_i) mod p over
    64-bit shingle hashes; signature = per-permutation minimum."""

    def __init__(self, num_perm: int = 128, seed: int = 1):
        rng = np.random.default_rng(seed)
        self.num_perm = num_perm
        self.a = rng.integers(1, int(_MERSENNE61), num_perm, dtype=np.uint64)
        self.b = rng.integers(0, int(_MERSENNE61), num_perm, dtype=np.uint64)

    def signature(self, shingle_hashes: np.ndarray) -> np.ndarray:
        """(n_shingles,) uint64 → (num_perm,) uint64 signature; empty input
        → all-max sentinel signature."""
        if len(shingle_hashes) == 0:
            return np.full(self.num_perm, _MASK_SENTINEL, dtype=np.uint64)
        x = (shingle_hashes.astype(_U64) % _MERSENNE61)[:, None]
        # (n, num_perm) — safe in uint64? a*x can overflow; use object-free
        # trick: compute in python-int-free float-free way via np.uint64 with
        # mod-mersenne reduction on 128-bit emulation is costly; instead use
        # numpy's uint64 wraparound + splitmix mixing, which preserves
        # min-wise uniformity for dedup purposes.
        hm = (x * self.a[None, :] + self.b[None, :]) & np.uint64(0xFFFFFFFFFFFFFFFF)
        hm = mix64(hm)
        return hm.min(axis=0)

    def jaccard_estimate(self, sig_a: np.ndarray, sig_b: np.ndarray) -> float:
        return float(np.mean(sig_a == sig_b))

    def signatures_batch(self, sh_offsets: np.ndarray, shingles: np.ndarray,
                         perm_block: int = 32) -> np.ndarray:
        """Whole-batch signatures: flat shingle layout (hashing.py
        batch_shingle_hashes) → (n_docs, num_perm) uint64 matrix.

        One (n_shingles × perm_block) matrix per permutation block with a
        segmented min (reduceat) per doc — no per-doc Python. perm_block
        bounds the temporary at n_shingles × perm_block × 8 bytes. Rows
        equal :meth:`signature` per doc (property-tested); empty docs get
        the all-max sentinel."""
        n_docs = len(sh_offsets) - 1
        out = np.full((n_docs, self.num_perm), _MASK_SENTINEL, dtype=np.uint64)
        if len(shingles) == 0 or n_docs == 0:
            return out
        counts = np.diff(sh_offsets)
        nonempty = counts > 0
        starts = sh_offsets[:-1][nonempty]
        x = (shingles.astype(_U64) % _MERSENNE61)[:, None]
        for p0 in range(0, self.num_perm, perm_block):
            p1 = min(p0 + perm_block, self.num_perm)
            hm = mix64(x * self.a[None, p0:p1] + self.b[None, p0:p1])
            # zero-width segments (empty docs) are excluded from `starts`,
            # so reduceat's [starts[i], starts[i+1]) spans are exactly the
            # non-empty docs' shingle runs
            out[nonempty, p0:p1] = np.minimum.reduceat(hm, starts, axis=0)
        return out


_MASK_SENTINEL = (1 << 64) - 1


def band_hashes(signature: np.ndarray, bands: int) -> np.ndarray:
    """Split signature into ``bands`` equal row-groups; hash each band →
    (bands,) uint64. Docs sharing any band hash are LSH candidates."""
    rows = len(signature) // bands
    sig = signature[: bands * rows].reshape(bands, rows)
    acc = np.zeros(bands, _U64)
    for j in range(rows):
        acc = acc * _U64(1099511628211) + mix64(sig[:, j])
    return mix64(acc)


def simhash64(token_hashes: np.ndarray, weights: np.ndarray | None = None) -> int:
    """Charikar simhash: weighted sign-sum of token-hash bits → 64-bit id."""
    if len(token_hashes) == 0:
        return 0
    bits = ((token_hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & _U64(1)).astype(np.int64)
    signs = bits * 2 - 1
    if weights is not None:
        signs = signs * weights[:, None].astype(np.int64)
    acc = signs.sum(axis=0)
    return int(((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


def hamming64(a: np.ndarray, b: int) -> np.ndarray:
    """Vectorized Hamming distance of uint64 array vs scalar."""
    x = a.astype(np.uint64) ^ np.uint64(b)
    return np.array([bin(int(v)).count("1") for v in x], dtype=np.int64)


def simhash_bands(values: np.ndarray, bands: int = 4) -> np.ndarray:
    """(n,) uint64 simhashes → (n, bands) band keys: equal band ⇒ candidate
    pair for hamming ≤ bands-1 (pigeonhole)."""
    width = 64 // bands
    mask = np.uint64((1 << width) - 1)
    out = np.empty((len(values), bands), np.uint64)
    v = values.astype(np.uint64)
    for i in range(bands):
        out[:, i] = (v >> np.uint64(i * width)) & mask
    return out
