"""Block-max WAND top-k BM25 over skip-pointered chunked postings.

The reference stores per-chunk ``max_doc_id`` and uses it to skip chunks
during boolean intersection (/root/reference/src/indexer/chunk.rs:9,
block.rs:73-86, query_processor.rs:32-52) — the precursor of block-max
pruning. This module completes the design the north star asks for: WAND
(Broder et al., CIKM'01) with block-max refinement (Ding & Suel,
SIGIR'11 — public algorithms), returning EXACTLY the same top-k as the
exhaustive scorer, ties included (pytest-enforced).

Chunk upper bound: per-posting BM25 contribution
    f(tf, dl) = idf · tf(k1+1) / (tf + k1(1-b+b·dl/avgdl))
is increasing in tf and decreasing in dl, and every posting has dl ≥ tf, so
    f(tf, dl) ≤ g(tf) = f(tf, tf),  g increasing
      ⇒ chunk_ub = idf · g(max_tf of chunk)     (safe, cheap: max_tf stored)
The skip condition is strict (< θ); candidates whose bound ties θ are fully
evaluated, which preserves exact tie semantics (score desc, doc_id asc).

Cursors decode a chunk's doc_ids/tfs only when the cursor actually lands in
it — max_doc_id positioning is metadata-only.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa

from search_engine_ray.functions.vb import decode_ascending, vb_decode_array

_INF = np.iinfo(np.int64).max


def _g(tf: float, k1: float, b: float, avgdl: float) -> float:
    """Upper envelope g(tf) = f(tf, dl=tf); see module docstring."""
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * tf / avgdl))


class TermCursor:
    """Lazy doc-at-a-time cursor over ONE term's chunk rows (already ordered
    by (salt, first_doc_id) — ascending disjoint doc ranges)."""

    __slots__ = ("first", "maxd", "max_tf", "doc_gaps", "tfs_col", "idf",
                 "k1", "b", "avgdl", "ci", "pi", "_docs", "_tfs",
                 "exhausted", "term_ub", "_chunk_ubs", "doc_length")

    def __init__(self, chunks: pa.Table, idf: float, k1: float, b: float,
                 avgdl: float, doc_length):
        chunks = chunks.combine_chunks().sort_by(
            [("salt", "ascending"), ("first_doc_id", "ascending"), ("chunk_seq", "ascending")]
        )
        self.first = chunks["first_doc_id"].to_numpy(zero_copy_only=False)
        self.maxd = chunks["max_doc_id"].to_numpy(zero_copy_only=False)
        self.max_tf = chunks["max_tf"].to_numpy(zero_copy_only=False)
        self.doc_gaps = chunks["doc_gaps"].combine_chunks() if isinstance(chunks["doc_gaps"], pa.ChunkedArray) else chunks["doc_gaps"]
        self.tfs_col = chunks["tfs"].combine_chunks() if isinstance(chunks["tfs"], pa.ChunkedArray) else chunks["tfs"]
        self.idf, self.k1, self.b, self.avgdl = idf, k1, b, avgdl
        self.doc_length = doc_length
        self.ci = 0
        self.pi = 0
        self._docs = None
        self._tfs = None
        self.exhausted = len(self.first) == 0
        self._chunk_ubs = idf * np.array(
            [_g(float(t), k1, b, avgdl) for t in self.max_tf], np.float64
        )
        self.term_ub = float(self._chunk_ubs.max()) if len(self._chunk_ubs) else 0.0

    # -- positioning --------------------------------------------------------
    def _load_chunk(self) -> None:
        self._docs = decode_ascending(self.doc_gaps[self.ci].as_py())
        self._tfs = np.asarray(self.tfs_col[self.ci].as_py(), np.int64)

    def doc(self) -> int:
        if self.exhausted:
            return _INF
        if self._docs is None:
            if self.pi == 0:
                # chunk head: first_doc_id metadata answers without decoding
                return int(self.first[self.ci])
            self._load_chunk()
        return int(self._docs[self.pi])

    def chunk_ub(self) -> float:
        """Upper bound of the CURRENT chunk (metadata only)."""
        return 0.0 if self.exhausted else float(self._chunk_ubs[self.ci])

    def chunk_boundary(self) -> int:
        """max_doc_id of the current chunk (metadata only)."""
        return _INF if self.exhausted else int(self.maxd[self.ci])

    def shallow_seek(self, target: int) -> None:
        """Move the CHUNK pointer to the first chunk whose max_doc_id ≥
        target without decoding (block-max positioning)."""
        if self.exhausted or self.maxd[self.ci] >= target:
            return
        j = int(np.searchsorted(self.maxd, target, side="left"))
        if j >= len(self.maxd):
            self.exhausted = True
            return
        if j != self.ci:
            self.ci = j
            self.pi = 0
            self._docs = None

    def next_geq(self, target: int) -> None:
        """Advance to the first posting with doc_id ≥ target."""
        if self.exhausted:
            return
        self.shallow_seek(target)
        if self.exhausted:
            return
        if self._docs is None:
            if self.pi == 0 and self.first[self.ci] >= target:
                return  # positioned at a chunk head that already satisfies
            self._load_chunk()
        pi = int(np.searchsorted(self._docs, target, side="left"))
        if pi >= len(self._docs):
            # target fell in a gap past this chunk's last doc — move on
            self.ci += 1
            self.pi = 0
            self._docs = None
            if self.ci >= len(self.first):
                self.exhausted = True
            else:
                self.next_geq(target)
            return
        self.pi = max(self.pi, pi)

    def advance(self) -> None:
        """Move past the current posting."""
        if self.exhausted:
            return
        if self._docs is None:
            self._load_chunk()
        self.pi += 1
        if self.pi >= len(self._docs):
            self.ci += 1
            self.pi = 0
            self._docs = None
            if self.ci >= len(self.first):
                self.exhausted = True

    # -- scoring ------------------------------------------------------------
    def score_current(self) -> float:
        if self._docs is None:
            self._load_chunk()
        tf = float(self._tfs[self.pi])
        dl = float(self.doc_length(int(self._docs[self.pi])))
        return self.idf * tf * (self.k1 + 1.0) / (
            tf + self.k1 * (1.0 - self.b + self.b * dl / self.avgdl)
        )


def wand_topk(cursors: list[TermCursor], k: int) -> list[tuple[int, float]]:
    """Exact top-k by (score desc, doc_id asc) via WAND + block-max.

    Heap entries are (score, -doc_id): the min-heap root is the current
    worst (lowest score; among ties the LARGER doc_id), so tie replacement
    matches the exhaustive scorer's contract exactly."""
    if k <= 0:
        return []
    cursors = [c for c in cursors if not c.exhausted]
    heap: list[tuple[float, int]] = []

    def theta() -> float:
        return heap[0][0] if len(heap) >= k else float("-inf")

    while True:
        active = [c for c in cursors if not c.exhausted]
        if not active:
            break
        active.sort(key=lambda c: c.doc())
        # pivot: first index where the cumulative term upper bound can reach
        # θ (θ = -inf while the heap is filling, so pivot = 0 then)
        t = theta()
        acc = 0.0
        pivot = -1
        for i, c in enumerate(active):
            acc += c.term_ub
            if acc >= t:
                pivot = i
                break
        if pivot < 0:
            break
        pivot_doc = active[pivot].doc()

        if active[0].doc() == pivot_doc:
            # every cursor whose current doc IS the pivot participates in
            # its score — extend past the pivot index (a suffix cursor can
            # sit at pivot_doc too; skipping without it partial-scores)
            end = pivot + 1
            while end < len(active) and active[end].doc() == pivot_doc:
                end += 1
            prefix = active[:end]
            # block-max check: chunk-level bounds of everything at the pivot
            for c in prefix:
                c.shallow_seek(pivot_doc)
            prefix_live = [c for c in prefix if not c.exhausted]
            block_ub = sum(c.chunk_ub() for c in prefix_live)
            if len(heap) >= k and block_ub < t:
                # nothing in these chunks can beat θ: advance the prefix
                # past the nearest chunk boundary, but never beyond the next
                # suffix cursor's document (its contribution was not counted)
                boundary = min((c.chunk_boundary() for c in prefix_live), default=_INF)
                nxt = active[end].doc() if end < len(active) else _INF
                target = max(min(boundary + 1, nxt), pivot_doc + 1)
                for c in prefix_live:
                    if c.doc() < target:
                        c.next_geq(target)
                continue
            # full evaluation of pivot_doc
            score = 0.0
            for c in active:
                if not c.exhausted and c.doc() == pivot_doc:
                    score += c.score_current()
            for c in active:
                if not c.exhausted and c.doc() == pivot_doc:
                    c.advance()
            entry = (score, -pivot_doc)
            if len(heap) < k:
                heapq.heappush(heap, entry)
            elif entry > heap[0]:
                heapq.heapreplace(heap, entry)
        else:
            # advance the earliest cursor up to the pivot document
            active[0].next_geq(pivot_doc)

    out = sorted(heap, key=lambda e: (-e[0], -e[1]))
    return [(-d, s) for s, d in out]


def maxscore_topk(cursors: list[TermCursor], k: int) -> list[tuple[int, float]]:
    """Exact top-k by (score desc, doc_id asc) via MAXSCORE (Turtle &
    Flood, IPM'95) with block-max refinement — the other classic
    dynamic-pruning strategy beside WAND, usually faster on short queries
    with one dominant term.

    Terms sort by ascending upper bound; the maximal prefix whose bound
    sum stays strictly below θ is NON-ESSENTIAL — a doc appearing only
    there can never enter the heap, so candidate docs come from the
    essential lists alone. Essential cursors at the candidate are bounded
    chunk-level (block-max) before full evaluation; non-essential terms
    are probed in descending-bound order with early termination once the
    remaining bound sum cannot reach θ. All skips are STRICT (< θ): a
    bound that ties θ is fully evaluated, preserving the exhaustive
    scorer's exact tie contract (score desc, doc_id asc) — same contract
    as :func:`wand_topk`, pytest-enforced equality."""
    if k <= 0:
        return []
    order = [i for i, c in enumerate(cursors) if not c.exhausted]
    if not order:
        return []
    # ascending-bound order for the essential split; REMEMBER each cursor's
    # original (query-term) position: per-doc contributions must sum in
    # term order so float summation matches the exhaustive scorer exactly
    # (bit-equal scores ⇒ identical tie order)
    order.sort(key=lambda i: cursors[i].term_ub)
    origin = order                      # sorted position -> original index
    cursors = [cursors[i] for i in order]
    m = len(cursors)
    prefix = [0.0] * (m + 1)  # prefix[i] = Σ term_ub of cursors[:i]
    for i, c in enumerate(cursors):
        prefix[i + 1] = prefix[i] + c.term_ub
    heap: list[tuple[float, int]] = []
    ness = 0  # cursors[:ness] are non-essential (prefix[ness+? ] < θ)

    while True:
        t = heap[0][0] if len(heap) >= k else float("-inf")
        while ness < m and prefix[ness + 1] < t:
            ness += 1
        ess = [c for c in cursors[ness:] if not c.exhausted]
        if not ess:
            break
        d = min(c.doc() for c in ess)
        at_d = [c for c in ess if c.doc() == d]
        # block-max check: chunk bounds of essential cursors AT d plus the
        # non-essential term-level bound sum
        bound = prefix[ness] + sum(c.chunk_ub() for c in at_d)
        if len(heap) >= k and bound < t:
            # nothing in these chunks (joined with every non-essential
            # term) reaches θ. Docs up to the nearest at-d chunk boundary
            # are covered by the same bound UNLESS another essential
            # cursor sits before it — cap the jump at that cursor's doc.
            boundary = min(c.chunk_boundary() for c in at_d)
            nxt = min((c.doc() for c in ess if c.doc() > d), default=_INF)
            target = max(min(boundary + 1, nxt), d + 1)
            for c in at_d:
                c.next_geq(target)
            continue
        # full evaluation of d: essential contributions first...
        contribs: list[tuple[int, float]] = []  # (original term pos, value)
        run = 0.0  # probe-order running sum, for pruning decisions only
        for j, c in enumerate(cursors[ness:], start=ness):
            if not c.exhausted and c.doc() == d:
                v = c.score_current()
                contribs.append((origin[j], v))
                run += v
                c.advance()
        # ...then non-essential probes, best bound first, early-exit when
        # even all remaining bounds cannot reach θ (strict, tie-exact)
        for i in range(ness - 1, -1, -1):
            if len(heap) >= k and run + prefix[i + 1] < t:
                break
            c = cursors[i]
            if c.exhausted:
                continue
            c.next_geq(d)
            if not c.exhausted and c.doc() == d:
                v = c.score_current()
                contribs.append((origin[i], v))
                run += v
        contribs.sort()
        score = 0.0
        for _, v in contribs:
            score += v
        entry = (score, -d)
        if len(heap) < k:
            heapq.heappush(heap, entry)
        elif entry > heap[0]:
            heapq.heapreplace(heap, entry)

    out = sorted(heap, key=lambda e: (-e[0], -e[1]))
    return [(-d, s) for s, d in out]
