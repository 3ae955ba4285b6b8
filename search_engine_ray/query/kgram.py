"""k-gram index for wildcard term search (Manning/Raghavan/Schütze, IIR §3.2).

The reference serves fuzzy lookups with a BK-tree built from the full
dictionary (`/root/reference/src/my_bk_tree/mod.rs:3-26`); wildcard patterns
(`s*`, `*er`, `f*t`) are the classic companion operator the reference never
grew. This module implements it the textbook way over the SAME vocabulary:

* every dictionary term is bounded as ``^term$`` and its k-grams (k=2)
  indexed as gram → sorted term-row postings over the sorted term list;
* a pattern's fixed segments contribute their k-grams, candidate rows are
  the intersection of those gram postings (smallest list first, exactly the
  min-df-first discipline of boolean AND);
* survivors are post-filtered with the compiled wildcard regex — k-gram
  intersection over-generates (e.g. pattern ``red*`` matches gram-set of
  ``retired``), the filter is mandatory, never optional.

Scale note: the gram map is built once per engine from the dictionary
(same lifecycle and O(vocab) cost as the BK-tree). At extreme vocabularies
the dictionary is already hive-partitioned by shard (stages/merge.py dict
slices); the gram map shards the same way — grams are computed per slice and
a wildcard fans out per shard like any dictionary probe, so nothing here
requires the whole vocabulary in one process.
"""

from __future__ import annotations

import re

import numpy as np


def wildcard_regex(pattern: str) -> "re.Pattern[str]":
    """Compile a ``*``-wildcard pattern to an anchored regex; every
    non-``*`` character is matched literally."""
    parts = pattern.split("*")
    return re.compile("".join(re.escape(p) + (".*" if i < len(parts) - 1 else "")
                              for i, p in enumerate(parts)) + "$")


def pattern_grams(pattern: str, k: int) -> list[str]:
    """k-grams every match must contain: grams of the fixed segments of
    ``^pattern$`` (segments shorter than k contribute nothing — the
    boundary anchors make pure-prefix/suffix patterns like ``s*`` still
    yield ``^s``)."""
    bounded = "^" + pattern + "$"
    grams: list[str] = []
    for seg in bounded.split("*"):
        for j in range(len(seg) - k + 1):
            grams.append(seg[j : j + k])
    return grams


class KGramIndex:
    """gram → sorted row ids over a SORTED term list."""

    def __init__(self, terms: list[str], k: int = 2):
        if list(terms) != sorted(terms):  # contract, not a sort fallback
            raise ValueError("KGramIndex requires a sorted term list")
        self.k = k
        self.terms = list(terms)
        buckets: dict[str, list[int]] = {}
        for i, t in enumerate(self.terms):
            bounded = "^" + t + "$"
            prev: set[str] = set()
            for j in range(len(bounded) - k + 1):
                g = bounded[j : j + k]
                if g not in prev:
                    prev.add(g)
                    buckets.setdefault(g, []).append(i)
        # rows were appended in ascending i — already sorted
        self._grams = {g: np.asarray(v, dtype=np.int64) for g, v in buckets.items()}

    def lookup(self, pattern: str) -> list[str]:
        """Terms matching the ``*``-wildcard pattern, ascending."""
        grams = pattern_grams(pattern, self.k)
        missing = [g for g in grams if g not in self._grams]
        if grams and missing:
            return []
        if grams:
            lists = sorted((self._grams[g] for g in grams), key=len)
            cand = lists[0]
            for arr in lists[1:]:
                if len(cand) == 0:
                    break
                cand = np.intersect1d(cand, arr, assume_unique=True)
        else:
            # no fixed segment of length >= k (e.g. "*"): scan everything
            cand = np.arange(len(self.terms), dtype=np.int64)
        rx = wildcard_regex(pattern)
        return [self.terms[i] for i in cand if rx.match(self.terms[i])]
