"""RRF fusion and retrieval-effectiveness metrics (pure kernels)."""

import math

import pytest

from search_engine_ray.query.evaluate import eval_queries, eval_ranking
from search_engine_ray.query.fusion import rrf_fuse


class TestRRF:
    def test_paper_formula(self):
        out = dict(rrf_fuse([[1, 2], [2, 3]], k=10, K=60))
        assert out[1] == pytest.approx(1 / 61)
        assert out[2] == pytest.approx(1 / 62 + 1 / 61)
        assert out[3] == pytest.approx(1 / 62)

    def test_order_and_ties(self):
        # 5 and 7 get identical contributions → id asc breaks the tie
        got = rrf_fuse([[5, 7]], k=10, K=60)
        assert got[0][0] == 5
        got = rrf_fuse([[7], [5]], k=10, K=60)
        assert [d for d, _ in got] == [5, 7]

    def test_k_truncates(self):
        assert len(rrf_fuse([[1, 2, 3, 4]], k=2)) == 2

    def test_consensus_beats_single_head(self):
        # a doc ranked 2nd in BOTH runs outscores each run's unique head
        got = rrf_fuse([[1, 9], [2, 9]], k=3)
        assert got[0][0] == 9

    def test_empty(self):
        assert rrf_fuse([], k=5) == []
        assert rrf_fuse([[], []], k=5) == []


class TestEval:
    def test_perfect_ranking(self):
        m = eval_ranking([1, 2, 3], [1, 2, 3], k=3)
        assert m == {"p_at_k": 1.0, "recall_at_k": 1.0, "mrr_at_k": 1.0, "ndcg_at_k": 1.0}

    def test_known_values(self):
        # top-5 = [a X b X X], rel = {a, b, c}: hits at ranks 1 and 3
        m = eval_ranking([10, 99, 11, 98, 97], [10, 11, 12], k=5)
        assert m["p_at_k"] == pytest.approx(2 / 5)
        assert m["recall_at_k"] == pytest.approx(2 / 3)
        assert m["mrr_at_k"] == pytest.approx(1.0)
        dcg = 1 / math.log2(2) + 1 / math.log2(4)
        idcg = sum(1 / math.log2(i + 1) for i in (1, 2, 3))
        assert m["ndcg_at_k"] == pytest.approx(dcg / idcg)

    def test_no_hits_and_empty_qrels(self):
        m = eval_ranking([1, 2], [9], k=2)
        assert m == {"p_at_k": 0.0, "recall_at_k": 0.0, "mrr_at_k": 0.0, "ndcg_at_k": 0.0}
        m = eval_ranking([1, 2], [], k=2)
        assert m["recall_at_k"] == 0.0 and m["ndcg_at_k"] == 0.0

    def test_mrr_cut_at_k(self):
        # first relevant sits at rank 3, beyond k=2 → MRR@2 is 0
        assert eval_ranking([8, 9, 1], [1], k=2)["mrr_at_k"] == 0.0
        assert eval_ranking([8, 9, 1], [1], k=3)["mrr_at_k"] == pytest.approx(1 / 3)

    def test_idcg_caps_at_k(self):
        # 100 relevant docs, k=2, both hits → NDCG must be 1.0 (IDCG over
        # min(|rel|, k)), not penalized for unreachable relevance mass
        m = eval_ranking([1, 2], list(range(1, 101)), k=2)
        assert m["ndcg_at_k"] == pytest.approx(1.0)

    def test_macro_average(self):
        runs = [([1], [1]), ([2], [3])]
        m = eval_queries(runs, k=1)
        assert m["p_at_k"] == pytest.approx(0.5)
        assert m["mrr_at_k"] == pytest.approx(0.5)
        assert eval_queries([], k=1)["ndcg_at_k"] == 0.0
