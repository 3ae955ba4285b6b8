"""Ranking functions.

tf·idf reproduces the reference's live formulas bit-for-bit in float32
(/root/reference/src/scoring/mod.rs:34-48):
    df  = len(postings)                 (f32)
    tf  = len(positions)                (f32)
    idf = log10(N / df)                 (f32 math)
    w   = tf * idf                      (f32)
scores accumulate per doc over the query's distinct terms; ties break by
ascending doc_id (the reference's heap treats equal scores as equal,
scoring/mod.rs:12-31 — pop order unspecified; our contract pins it,
SURVEY.md §7.4).

BM25 is the serving default the reference never finished (BASELINE.md):
parameters frozen at k1=1.2, b=0.75; idf = ln((N - df + 0.5)/(df + 0.5) + 1)
(the non-negative Robertson/Lucene variant), computed in float64 so the
DuckDB oracle can reproduce it exactly.
"""

from __future__ import annotations

import numpy as np


def tfidf_idf(df: int, num_docs: int) -> np.float32:
    """scoring/mod.rs:42-44 in f32."""
    return np.float32(np.log10(np.float32(num_docs) / np.float32(df)))


def tfidf_weights(tfs: np.ndarray, df: int, num_docs: int) -> np.ndarray:
    """scoring/mod.rs:46-48: per-posting w = tf * idf, f32."""
    return tfs.astype(np.float32) * tfidf_idf(df, num_docs)


def bm25_idf(df: int, num_docs: int) -> float:
    return float(np.log((num_docs - df + 0.5) / (df + 0.5) + 1.0))


def bm25_weights(
    tfs: np.ndarray,
    doc_lengths: np.ndarray,
    df: int,
    num_docs: int,
    avgdl: float,
    k1: float = 1.2,
    b: float = 0.75,
) -> np.ndarray:
    tf = tfs.astype(np.float64)
    dl = doc_lengths.astype(np.float64)
    denom = tf + k1 * (1.0 - b + b * dl / avgdl)
    return bm25_idf(df, num_docs) * tf * (k1 + 1.0) / denom


def topk_docs(doc_ids: np.ndarray, scores: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Top-k by (score desc, doc_id asc); accepts unaggregated (doc, score)
    pairs and sums per doc first (accumulation pattern of
    search_engine/mod.rs:57-69)."""
    if len(doc_ids) == 0:
        return doc_ids[:0], scores[:0]
    uniq, inv = np.unique(doc_ids, return_inverse=True)
    agg = np.zeros(len(uniq), dtype=scores.dtype)
    np.add.at(agg, inv, scores)
    order = np.lexsort((uniq, -agg))  # score desc, then doc_id asc
    order = order[:k]
    return uniq[order], agg[order]
