"""Brute-force oracle: a pure-Python dict-of-lists index + query evaluator
over raw (doc_id, text) pairs, implementing the same semantics as the engine
(and the reference's formulas) with none of the machinery. Used by tests for
rank-identity (SURVEY.md §5, FIXTURES.md §3) — float32 tf·idf to match the
reference's f32 scoring (/root/reference/src/scoring/mod.rs:7-48)."""

from __future__ import annotations

import numpy as np

from search_engine_ray.functions.tokenizer import Tokenizer


class OracleIndex:
    def __init__(self, docs: dict[int, str], tokenizer: Tokenizer | None = None,
                 k1: float = 1.2, b: float = 0.75):
        self.tokenizer = tokenizer or Tokenizer()
        self.k1, self.b = k1, b
        self.postings: dict[str, dict[int, list[int]]] = {}
        self.doc_lengths: dict[int, int] = {}
        for doc_id, text in docs.items():
            per_doc, doc_len = self.tokenizer.doc_postings(doc_id, text or "")
            self.doc_lengths[doc_id] = doc_len
            for term, positions in per_doc.items():
                self.postings.setdefault(term, {})[doc_id] = positions
        self.num_docs = len(docs)
        self.avgdl = (sum(self.doc_lengths.values()) / self.num_docs) if docs else 0.0

    # dictionary facts -------------------------------------------------------
    def df(self, term: str) -> int:
        return len(self.postings.get(term, {}))

    def terms_sorted(self) -> list[str]:
        return sorted(self.postings)

    def term_ids(self) -> dict[str, int]:
        return {t: i + 1 for i, t in enumerate(self.terms_sorted())}

    # queries ----------------------------------------------------------------
    def _qterms(self, query: str) -> list[str]:
        seen: dict[str, None] = {}
        for tok in self.tokenizer.tokenize(query):
            seen.setdefault(tok.word, None)
        return list(seen)

    def boolean_and(self, query: str) -> list[int]:
        terms = self._qterms(query)
        if not terms or any(t not in self.postings for t in terms):
            return []
        docs = set(self.postings[terms[0]])
        for t in terms[1:]:
            docs &= set(self.postings[t])
        return sorted(docs)

    def tfidf_topk(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        scores: dict[int, np.float32] = {}
        for t in self._qterms(query):
            plist = self.postings.get(t)
            if not plist:
                continue
            idf = np.float32(np.log10(np.float32(self.num_docs) / np.float32(len(plist))))
            for doc_id, positions in plist.items():
                w = np.float32(np.float32(len(positions)) * idf)
                scores[doc_id] = np.float32(scores.get(doc_id, np.float32(0)) + w)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return [(d, float(s)) for d, s in ranked[:k]]

    def bm25_topk(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        scores: dict[int, float] = {}
        for t in self._qterms(query):
            plist = self.postings.get(t)
            if not plist:
                continue
            df = len(plist)
            idf = float(np.log((self.num_docs - df + 0.5) / (df + 0.5) + 1.0))
            for doc_id, positions in plist.items():
                tf = float(len(positions))
                dl = float(self.doc_lengths[doc_id])
                w = idf * tf * (self.k1 + 1.0) / (tf + self.k1 * (1.0 - self.b + self.b * dl / self.avgdl))
                scores[doc_id] = scores.get(doc_id, 0.0) + w
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return [(d, float(s)) for d, s in ranked[:k]]

    def phrase(self, query: str) -> list[int]:
        words = [t.word for t in self.tokenizer.tokenize(query)]
        if not words:
            return []
        if any(w not in self.postings for w in words):
            return []
        docs = set(self.postings[words[0]])
        for w in words[1:]:
            docs &= set(self.postings[w])
        out = []
        for d in sorted(docs):
            starts = self.postings[words[0]][d]
            position_sets = [set(self.postings[w][d]) for w in words]
            if any(all(s + i in position_sets[i] for i in range(1, len(words))) for s in starts):
                out.append(d)
        return out

    def proximity(self, term1: str, term2: str, k: int) -> list[tuple[int, int, int]]:
        t1 = self.tokenizer.normalize(term1)
        t2 = self.tokenizer.normalize(term2)
        p1, p2 = self.postings.get(t1, {}), self.postings.get(t2, {})
        out = []
        for d in sorted(set(p1) & set(p2)):
            for a in p1[d]:
                for b in p2[d]:
                    if b > a and b - a <= k:
                        out.append((d, a, b))
        return out

    def fuzzy(self, term: str, edit_distance: int) -> list[str]:
        from search_engine_ray.query.bktree import levenshtein

        key = self.tokenizer.normalize(term)
        return sorted(t for t in self.postings if levenshtein(key, t) <= edit_distance)
