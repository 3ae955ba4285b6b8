"""MAXSCORE ≡ exhaustive BM25 (exact, ties included) + pruning behavior.

Companion of test_wand.py: maxscore_topk shares TermCursor with WAND and
must reproduce bm25_topk exactly (docs AND scores, tie order included).
"""

import numpy as np
import pytest

from search_engine_ray.config import EngineConfig
from search_engine_ray.functions.textproc import synthesize_html
from search_engine_ray.pipelines.build import build_index
from search_engine_ray.query.engine import SearchEngine
from search_engine_ray.sources.webpages import _url_for


@pytest.fixture(scope="module")
def engine(tmp_path_factory, ray_session):
    import ray.data

    rng = np.random.default_rng(23)
    vocab = [f"w{i}" for i in range(60)]
    texts = []
    for i in range(400):
        n = int(rng.integers(5, 60))
        words = [vocab[min(int(rng.zipf(1.3)) - 1, 59)] for _ in range(n)]
        texts.append(" ".join(words))
    texts[7] = texts[5]      # identical docs → exact score ties
    texts[101] = texts[100]
    rows = [{"url": _url_for(i), "html": synthesize_html(t).encode()} for i, t in enumerate(texts)]
    out = str(tmp_path_factory.mktemp("maxscore_idx"))
    build_index(ray.data.from_items(rows, override_num_blocks=4), out,
                EngineConfig(chunk_size=16, salt_span=64))
    return SearchEngine(out)


QUERIES = [
    "w0", "w1", "w0 w1", "w0 w1 w2", "w3 w7 w12", "w20 w40",
    "w0 w5 w10 w15 w20", "w50", "w59 w58 w57", "w2 w4 w8 w16 w32",
    "w1 w1 w1", "nonexistent", "w0 nonexistent w1",
    # the MAXSCORE sweet spot: one dominant rare term + stopword-class terms
    "w59 w0", "w0 w1 w59",
]


@pytest.mark.parametrize("q", QUERIES)
@pytest.mark.parametrize("k", [1, 3, 10, 50])
def test_maxscore_equals_exhaustive(engine, q, k):
    exhaustive = engine.bm25_topk(q, k)
    got = engine.bm25_topk_maxscore(q, k)
    assert [d for d, _ in got] == [d for d, _ in exhaustive], q
    np.testing.assert_allclose(
        [s for _, s in got], [s for _, s in exhaustive], rtol=1e-12
    )


@pytest.mark.parametrize("q", ["w0 w1 w2", "w59 w0", "w3 w7 w12"])
def test_maxscore_equals_wand(engine, q):
    assert engine.bm25_topk_maxscore(q, 10) == engine.bm25_topk_wand(q, 10)


def test_maxscore_prunes_nonessential(tmp_path_factory, ray_session):
    """With one rare high-idf term and one stopword-class term, the stopword
    list must become non-essential once the heap fills: most of its chunks
    are never decoded (probes only touch candidate docs from the rare
    list)."""
    import ray.data

    from search_engine_ray.query.wand import TermCursor

    # 'common' in every doc; 'rare' in a handful of early docs
    texts = []
    for i in range(600):
        base = f"common pad{i} x y"
        if i < 5:
            base += " rare rare"
        texts.append(base)
    rows = [{"url": _url_for(i), "html": synthesize_html(t).encode()} for i, t in enumerate(texts)]
    out = str(tmp_path_factory.mktemp("maxscore_prune_idx"))
    build_index(ray.data.from_items(rows, override_num_blocks=2), out,
                EngineConfig(chunk_size=16))
    eng = SearchEngine(out, build_bktree=False)

    decoded = {"n": 0}
    orig = TermCursor._load_chunk

    def counting(self):
        decoded["n"] += 1
        orig(self)

    TermCursor._load_chunk = counting
    try:
        got = eng.bm25_topk_maxscore("rare common", 3)
        assert got == eng.bm25_topk("rare common", 3)
        n_common = eng.get_chunks("common").num_rows
        # exhaustive would decode every 'common' chunk (~600/16 ≈ 38);
        # MAXSCORE must touch only a handful
        assert decoded["n"] <= max(4, n_common // 4), (decoded["n"], n_common)
    finally:
        TermCursor._load_chunk = orig


def test_maxscore_empty_and_missing_terms(engine):
    assert engine.bm25_topk_maxscore("nonexistent", 10) == []


def test_k_zero_returns_empty(engine):
    assert engine.bm25_topk_maxscore("w0 w1", 0) == []
    assert engine.bm25_topk_wand("w0 w1", 0) == []
