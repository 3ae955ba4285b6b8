"""Blocked length-prefixed string dictionary — the memory-compact term
lookup structure the reference implements as an alternative to the hash map
(/root/reference/src/in_memory_dict/string_in_memory_dict.rs:1-175, live but
unused by its pipeline; SURVEY.md §2.5 J2).

Semantics mirrored: all terms (in sorted order) concatenated into one byte
string as [len-byte][utf-8 term]; every ``block_size``-th entry records its
byte offset (a block head). Lookup = binary search over block heads, then a
linear scan of ≤ block_size entries within the block; -1 for a missing term
(the reference returns -1 too, not a panic). Unlike the reference's u8
length byte (terms ≤ 255 bytes), lengths are VB-coded so arbitrary terms
work; per-term metadata (term_id, df) lives in parallel numpy arrays.

Memory: one contiguous bytes blob + 2 int64 arrays + n/block_size offsets —
several times smaller than a Python dict of str→tuple, which is what makes
it the at-scale dictionary representation for query actors
(``EngineConfig.dict_repr = "front_coded"``).
"""

from __future__ import annotations

import numpy as np

from search_engine_ray.functions.vb import vb_decode, vb_encode


class BlockedStringDict:
    """Build from terms in ascending byte order (the dictionary's sort
    order, dictionary/mod.rs:79-86 — case-sensitive bytes)."""

    def __init__(self, terms, term_ids, dfs, block_size: int = 16):
        self.block_size = block_size
        blob = bytearray()
        heads: list[int] = []
        prev = None
        for i, t in enumerate(terms):
            b = t.encode("utf-8")
            if prev is not None and b < prev:
                raise ValueError("terms must be in ascending byte order")
            prev = b
            if i % block_size == 0:
                heads.append(len(blob))
            blob += vb_encode(len(b))
            blob += b
        self.blob = bytes(blob)
        self.heads = np.asarray(heads, np.int64)
        self.term_ids = np.asarray(term_ids, np.int64)
        self.dfs = np.asarray(dfs, np.int64)
        self.n = len(self.term_ids)
        # decoded first term of each block, for the binary search
        self._head_terms = [self._term_at_offset(off)[0] for off in self.heads]

    def _term_at_offset(self, off: int) -> tuple[bytes, int]:
        """(term bytes, offset after the term)."""
        ln, read = vb_decode(self.blob, off)
        start = off + read
        return self.blob[start : start + ln], start + ln

    def lookup(self, term: str) -> int:
        """→ index of term (dense position in sorted order), or -1."""
        key = term.encode("utf-8")
        # binary search over block heads: rightmost block whose head ≤ key
        lo, hi = 0, len(self.heads) - 1
        if hi < 0:
            return -1
        blk = -1
        while lo <= hi:
            mid = (lo + hi) // 2
            if self._head_terms[mid] <= key:
                blk = mid
                lo = mid + 1
            else:
                hi = mid - 1
        if blk < 0:
            return -1
        # linear scan within the block (≤ block_size entries)
        off = int(self.heads[blk])
        base = blk * self.block_size
        for i in range(self.block_size):
            if base + i >= self.n:
                return -1
            t, nxt = self._term_at_offset(off)
            if t == key:
                return base + i
            if t > key:
                return -1
            off = nxt
        return -1

    def get_meta(self, term: str):
        """term → (term_id, df) or None (J1 semantics without the panic)."""
        i = self.lookup(term)
        if i < 0:
            return None
        return int(self.term_ids[i]), int(self.dfs[i])

    def lower_bound(self, key: str) -> int:
        """Index of the first term ≥ key (== n when every term < key).
        Block binary search + in-block scan, same access pattern as
        :meth:`lookup`."""
        kb = key.encode("utf-8")
        if self.n == 0:
            return 0
        lo, hi = 0, len(self.heads) - 1
        blk = -1
        while lo <= hi:
            mid = (lo + hi) // 2
            if self._head_terms[mid] <= kb:
                blk = mid
                lo = mid + 1
            else:
                hi = mid - 1
        if blk < 0:
            return 0  # every head > key ⇒ first term ≥ key is index 0
        off = int(self.heads[blk])
        base = blk * self.block_size
        for i in range(self.block_size):
            if base + i >= self.n:
                return self.n
            t, off = self._term_at_offset(off)
            if t >= kb:
                return base + i
        return min(base + self.block_size, self.n)

    def term_at(self, index: int) -> str:
        """Inverse lookup by dense index (block seek + scan)."""
        if not 0 <= index < self.n:
            raise IndexError(index)
        blk, within = divmod(index, self.block_size)
        off = int(self.heads[blk])
        for _ in range(within):
            _t, off = self._term_at_offset(off)
        return self._term_at_offset(off)[0].decode("utf-8")

    def __len__(self) -> int:
        return self.n

    def __iter__(self):
        off = 0
        for _ in range(self.n):
            t, off = self._term_at_offset(off)
            yield t.decode("utf-8")

    def nbytes(self) -> int:
        return len(self.blob) + self.heads.nbytes + self.term_ids.nbytes + self.dfs.nbytes
