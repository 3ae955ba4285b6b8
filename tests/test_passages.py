"""Passage (chunk-level) retrieval: provenance mapping + collapsing."""

import numpy as np
import pytest

from search_engine_ray.pipelines.passages import (
    PassageEngine,
    build_passage_index,
    parse_passage_url,
    passage_url,
)

DOCS = [
    # doc 0: the needle sits in the SECOND window (tokens 8..15)
    {"doc_id": 0, "text": "alpha beta gamma delta epsilon zeta eta theta "
                          "needle iota kappa lam mu nu xi omicron"},
    {"doc_id": 1, "text": "needle needle needle pi rho sigma tau upsilon"},
    {"doc_id": 2, "text": "phi chi psi omega one two three four"},
    {"doc_id": 3, "text": "short doc"},
]


def test_url_roundtrip():
    u = passage_url(12, 3)
    assert u == "passage://000000000012/000003"
    assert parse_passage_url(u) == (12, 3)
    # url rank order == (doc, chunk) lexicographic order
    assert passage_url(2, 0) < passage_url(10, 0) < passage_url(10, 1)


@pytest.fixture(scope="module")
def pe(tmp_path_factory, ray_session):
    import ray.data

    out = str(tmp_path_factory.mktemp("psg"))
    ds = ray.data.from_items(DOCS, override_num_blocks=2)
    build_passage_index(ds, out, window=8, overlap=2)
    return PassageEngine(out)


class TestPassageRetrieval:
    def test_chunk_stats(self, pe):
        # windows of 8 step 6: doc0 (16 toks) → 3 chunks, doc1 (8) → 1,
        # doc2 (8) → 1, doc3 (2) → 1
        assert pe.engine.num_docs == 6

    def test_provenance_and_ranking(self, pe):
        hits = pe.bm25_topk("needle", k=10)
        assert [(d, c) for d, c, _ in hits[:1]] == [(1, 0)]  # tf=3 chunk wins
        # doc 0's needle lives in its middle/late windows, never chunk 0
        doc0 = [(d, c) for d, c, _ in hits if d == 0]
        assert doc0 and all(c > 0 for _, c in doc0)
        assert all(s > 0 for _, _, s in hits)

    def test_per_doc_collapsing(self, pe):
        full = pe.bm25_topk("needle", k=10)
        one = pe.bm25_topk_per_doc("needle", k=10, per_doc=1)
        docs = [d for d, _, _ in one]
        assert len(docs) == len(set(docs))  # at most one passage per doc
        # collapsed list preserves full-ranking order of its survivors
        pos = {(d, c): i for i, (d, c, _) in enumerate(full)}
        idxs = [pos[(d, c)] for d, c, _ in one]
        assert idxs == sorted(idxs)
        # each surviving passage is its doc's best-ranked one
        first = {}
        for d, c, _ in full:
            first.setdefault(d, c)
        assert all(first[d] == c for d, c, _ in one)

    def test_no_match(self, pe):
        assert pe.bm25_topk("nonexistentzz", k=5) == []
