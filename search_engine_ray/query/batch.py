"""Offline/batch retrieval: a Dataset of queries → actor pool of query
engines → results Dataset.

This is the Ray-shaped version of the reference's (dead) multi-threaded
query scoring ambition (/root/reference/src/search_engine/mod.rs:118-211):
each actor loads the index once (dictionary + BK-tree + doc lengths) in
``__init__`` and serves batches of queries; the pool scales horizontally.

Query row schema (FIXTURES.md §2):
    query_id:int64, query_text:string, mode:string, k:int32,
    prox_k:int32, edit_dist:int32
modes: boolean_and | tfidf_topk | bm25_topk | bm25_wand | bm25_maxscore | bm25_prox | bm25_blend |
       ql_topk | wildcard | search |
phrase | proximity | fuzzy (proximity takes the first two query tokens;
fuzzy takes the first token).

Result rows: (query_id, mode, rank, doc_id, score).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from search_engine_ray.config import EngineConfig


class QueryActor:
    def __init__(self, index_dir: str, config: EngineConfig | None = None):
        from search_engine_ray.query.engine import SearchEngine

        self.engine = SearchEngine(index_dir, config)

    def _run_one(self, text: str, mode: str, k: int, prox_k: int, edit_dist: int):
        eng = self.engine
        if mode == "boolean_and":
            return [(d, 0.0) for d in eng.boolean_and(text).tolist()[:k]]
        if mode == "tfidf_topk":
            return eng.tfidf_topk(text, k)
        if mode == "bm25_topk":
            return eng.bm25_topk(text, k)
        if mode == "bm25_wand":
            return eng.bm25_topk_wand(text, k)
        if mode == "bm25_maxscore":
            return eng.bm25_topk_maxscore(text, k)
        if mode == "bm25_prox":
            return eng.bm25_prox_topk(text, k)
        if mode == "bm25_blend":
            return eng.bm25_topk_blended(text, k)
        if mode == "phrase":
            return [(d, 0.0) for d in eng.phrase(text).tolist()[:k]]
        if mode == "proximity":
            words = text.split()
            if len(words) < 2:
                return []
            matches = eng.proximity(words[0], words[1], prox_k)
            seen: dict[int, int] = {}
            for d, _p1, _p2 in matches:
                seen[d] = seen.get(d, 0) + 1
            ranked = sorted(seen.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
            return [(d, float(n)) for d, n in ranked]
        if mode == "fuzzy":
            words = text.split()
            if not words:
                return []
            docs = eng.fuzzy_boolean(words[0], edit_dist)
            return [(int(d), 0.0) for d in docs.tolist()[:k]]
        if mode == "ql_topk":
            return eng.ql_topk(text, k)
        if mode == "wildcard":
            words = text.split()
            if not words:
                return []
            docs = eng.wildcard_boolean(words[0])
            return [(int(d), 0.0) for d in docs.tolist()[:k]]
        if mode == "search":
            return eng.search(text, k, fuzzy_distance=edit_dist)
        raise ValueError(f"unknown mode: {mode}")

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"query_id": [], "mode": [], "rank": [], "doc_id": [], "score": []}
        n = batch.num_rows
        cols = {c: batch[c].to_pylist() for c in batch.column_names}
        for i in range(n):
            qid = cols["query_id"][i]
            mode = cols["mode"][i]
            results = self._run_one(
                cols["query_text"][i],
                mode,
                int(cols.get("k", [10] * n)[i]),
                int(cols.get("prox_k", [3] * n)[i]),
                int(cols.get("edit_dist", [1] * n)[i]),
            )
            for rank, (doc_id, score) in enumerate(results, start=1):
                out["query_id"].append(qid)
                out["mode"].append(mode)
                out["rank"].append(rank)
                out["doc_id"].append(int(doc_id))
                out["score"].append(float(score))
        return pa.table(
            {
                "query_id": pa.array(out["query_id"], pa.int64()),
                "mode": pa.array(out["mode"], pa.string()),
                "rank": pa.array(out["rank"], pa.int64()),
                "doc_id": pa.array(out["doc_id"], pa.int64()),
                "score": pa.array(out["score"], pa.float64()),
            }
        )


def batch_query(queries_ds, index_dir: str, config: EngineConfig | None = None,
                concurrency=(1, 4), batch_size: int = 256):
    return queries_ds.map_batches(
        QueryActor,
        fn_constructor_args=(index_dir, config),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def make_query_set(num: int = 40, seed: int = 7) -> list[dict]:
    """Deterministic query set covering every mode (FIXTURES.md §2)."""
    rng = np.random.default_rng(seed)
    vocab = ["fast", "table", "merge", "spark", "query", "scan", "slow", "window",
             "sort", "key", "value", "hash", "stream", "batch", "line", "the",
             "group", "order", "filter", "big", "small", "row", "nonexistentzz"]
    modes = ["boolean_and", "tfidf_topk", "bm25_topk", "bm25_wand",
             "bm25_maxscore", "bm25_prox", "phrase", "proximity", "fuzzy",
             "ql_topk", "wildcard", "search"]
    out = []
    for i in range(num):
        mode = modes[i % len(modes)]
        n_words = 1 + int(rng.integers(1, 3))
        words = [vocab[int(rng.integers(0, len(vocab)))] for _ in range(n_words)]
        text = " ".join(words)
        if mode == "wildcard":
            text = words[0][:2] + "*"
        elif mode == "search" and len(words) > 1:
            # exercise DSL operators: MUST the second word, negate a fixed one
            text = f"{words[0]} +{words[1]} -nonexistentzz"
        out.append(
            {
                "query_id": i,
                "query_text": text,
                "mode": mode,
                "k": 2 if i % 5 == 0 else 10,  # k=2 = the reference's hard-coded k
                "prox_k": int(rng.integers(1, 5)),
                "edit_dist": 1 + int(i % 2),
            }
        )
    return out
