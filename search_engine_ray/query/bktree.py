"""BK-tree over Levenshtein distance for fuzzy term lookup.

Mirrors the reference's use of the ``bk-tree`` crate
(/root/reference/src/my_bk_tree/mod.rs:3-26: add terms, find(key, d) returns
all terms within edit distance d). Built once per query engine from the
dictionary's terms (index_metadata.rs:33-35).
"""

from __future__ import annotations

import numpy as np


def levenshtein(a: str, b: str) -> int:
    """Classic edit distance (insert/delete/substitute, all cost 1)."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    # numpy row-rolling DP; the left-to-right insertion chain
    # cur[j] = min(cand[j'], j' <= j) + (j - j') is a prefix-min after
    # subtracting the column index (unit costs make it exact).
    prev = np.arange(len(b) + 1)
    bb = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    cols = np.arange(len(b) + 1)
    for i, ca in enumerate(a):
        cand = np.empty(len(b) + 1, dtype=np.int64)
        cand[0] = i + 1
        np.minimum(prev[:-1] + (bb != ord(ca)), prev[1:] + 1, out=cand[1:])
        prev = np.minimum.accumulate(cand - cols) + cols
    return int(prev[-1])


class BKTree:
    """Standard BK-tree: children keyed by distance to node term."""

    __slots__ = ("_root",)

    def __init__(self, terms=None):
        self._root: list | None = None  # [term, {dist: child}]
        if terms is not None:
            for t in terms:
                self.add(t)

    def add(self, term: str) -> None:
        if self._root is None:
            self._root = [term, {}]
            return
        node = self._root
        while True:
            d = levenshtein(term, node[0])
            if d == 0:
                return
            child = node[1].get(d)
            if child is None:
                node[1][d] = [term, {}]
                return
            node = child

    def find(self, key: str, max_dist: int) -> list[str]:
        """All stored terms within ``max_dist`` of key (unordered)."""
        if self._root is None:
            return []
        out: list[str] = []
        stack = [self._root]
        while stack:
            term, children = stack.pop()
            d = levenshtein(key, term)
            if d <= max_dist:
                out.append(term)
            lo, hi = d - max_dist, d + max_dist
            for cd, child in children.items():
                if lo <= cd <= hi:
                    stack.append(child)
        return out
