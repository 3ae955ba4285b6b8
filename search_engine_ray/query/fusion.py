"""Rank fusion: combine retrieval runs from different scorers.

Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009): given
rankings R_1..R_m over doc ids, score(d) = Σ_i 1/(K + rank_i(d)), summing
only over rankings that contain d. RRF is the standard way to fuse a
lexical run (BM25) with a dense/embedding run without score calibration —
ranks are comparable, raw scores are not. The reference engine has a single
scorer (tf·idf, scoring/mod.rs); fusion is the hybrid-retrieval extension a
modern serving stack layers on top.

K dampens the head of each ranking; 60 is the paper's (and the de-facto
industry) default. Everything here is driver-side over top-k pools — the
expensive parts (the runs themselves) are produced by the engine / a
Dataset ANN pass; fusion touches O(pool) ids.
"""

from __future__ import annotations


def rrf_fuse(
    rankings: list[list[int]], k: int = 10, K: int = 60
) -> list[tuple[int, float]]:
    """Fuse rankings (each a list of ids, best first) into the top-k by
    (RRF score desc, id asc) — the engine-wide tie contract."""
    scores: dict[int, float] = {}
    for ranking in rankings:
        for r, d in enumerate(ranking, start=1):
            scores[d] = scores.get(d, 0.0) + 1.0 / (K + r)
    out = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return [(int(d), float(s)) for d, s in out[:k]]
