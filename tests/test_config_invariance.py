"""Partition-shape invariance: the SAME corpus indexed under different
sharding/chunking/salting configurations must answer every query
identically — doc_ids, scores, phrase sets, postings roundtrips. This is
the property that makes results reproducible across cluster sizes (the
north rule's rank-identity across N and 4N nodes)."""

import numpy as np
import pytest

from search_engine_ray.config import EngineConfig
from search_engine_ray.pipelines.build import build_index
from search_engine_ray.query.engine import SearchEngine
from search_engine_ray.sources.webpages import generate_webpages

CONFIGS = [
    EngineConfig(min_rows_per_file=None),  # defaults: 32 shards / 8 units / 128 chunk
    EngineConfig(index_shards=8, merge_units=2, min_rows_per_file=None),
    EngineConfig(index_shards=4, merge_units=4, chunk_size=16, min_rows_per_file=None),
    EngineConfig(index_shards=16, merge_units=8, salt_span=64, min_rows_per_file=None),
]

QUERIES = ["bababa cababa", "dababa", "fababa gababa bababa", "zzz bababa"]


@pytest.fixture(scope="module")
def engines(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("cfg")
    corpus = generate_webpages(1500, vocab_size=800, tokens_per_doc=50, seed=21)
    corpus = corpus.materialize()
    engs = []
    for i, cfg in enumerate(CONFIGS):
        out = str(root / f"idx{i}")
        build_index(corpus, out, cfg)
        engs.append(SearchEngine(out, cfg, build_bktree=False))
    return engs


class TestConfigInvariance:
    @pytest.mark.parametrize("q", QUERIES)
    def test_bm25_identical(self, engines, q):
        base = engines[0].bm25_topk(q, 10)
        for eng in engines[1:]:
            assert eng.bm25_topk(q, 10) == base

    @pytest.mark.parametrize("q", QUERIES)
    def test_wand_identical(self, engines, q):
        base = engines[0].bm25_topk_wand(q, 10)
        for eng in engines[1:]:
            assert eng.bm25_topk_wand(q, 10) == base

    @pytest.mark.parametrize("q", QUERIES[:2])
    def test_boolean_and_phrase_identical(self, engines, q):
        base_b = engines[0].boolean_and(q)
        base_p = engines[0].phrase(q)
        for eng in engines[1:]:
            np.testing.assert_array_equal(eng.boolean_and(q), base_b)
            np.testing.assert_array_equal(eng.phrase(q), base_p)

    def test_postings_roundtrip_identical(self, engines):
        # every term's decoded postings (docs, tfs, positions) must agree
        # across chunk sizes and salt spans
        terms = [t for t in ["bababa", "cababa", "dababa", "fababa"]
                 if engines[0].lookup(t)]
        assert terms
        for t in terms:
            base = engines[0].get_postings(t)
            for eng in engines[1:]:
                tp = eng.get_postings(t)
                np.testing.assert_array_equal(tp.doc_ids, base.doc_ids, err_msg=t)
                np.testing.assert_array_equal(tp.tfs, base.tfs, err_msg=t)
                np.testing.assert_array_equal(tp.pos_values, base.pos_values, err_msg=t)
                np.testing.assert_array_equal(tp.pos_offsets, base.pos_offsets, err_msg=t)

    def test_dictionaries_identical(self, engines):
        import pyarrow.parquet as pq

        base = pq.read_table(engines[0].paths.dictionary,
                             columns=["term", "term_id", "df"]).sort_by("term")
        for eng in engines[1:]:
            other = pq.read_table(eng.paths.dictionary,
                                  columns=["term", "term_id", "df"]).sort_by("term")
            assert base.equals(other)
