"""Proximity-boosted BM25 (engine.bm25_prox_topk)."""

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

    texts = [
        "alpha beta filler filler",            # adjacent pair (md=1)
        "alpha filler filler filler beta",     # far pair (md=4)
        "alpha filler beta filler alpha",      # md=1 (beta to 2nd alpha? no: |2-0|=2, |2-4|=2) -> md=2
        "alpha only here",
        "beta lonely text",
        "gamma delta words",
    ]
    rows = [{"url": _url_for(i), "html": synthesize_html(t).encode()}
            for i, t in enumerate(texts)]
    out = str(tmp_path_factory.mktemp("prox_idx"))
    build_index(ray.data.from_items(rows), out, EngineConfig())
    return SearchEngine(out)


def _spec(eng, query, w):
    """Scalar spec: bm25 + w * sum_pairs (idf_i+idf_j)/md^2."""
    from search_engine_ray.query.scoring import bm25_idf

    terms = eng.query_terms(query)
    base = dict(eng.bm25_topk(query, k=1000))
    tps = [(t, eng.get_postings(t)) for t in terms]
    tps = [(t, tp) for t, tp in tps if tp is not None and tp.df]
    for x in range(len(tps)):
        for y in range(x + 1, len(tps)):
            ta, tb = tps[x][1], tps[y][1]
            idf = (bm25_idf(ta.df, eng.num_docs)
                   + bm25_idf(tb.df, eng.num_docs))
            for d in ta.doc_ids:
                pa, pb = ta.positions_for_doc(int(d)), tb.positions_for_doc(int(d))
                if pa is None or pb is None:
                    continue
                md = min(abs(int(i) - int(j)) for i in pa for j in pb)
                base[int(d)] = base.get(int(d), 0.0) + w * idf / max(md, 1) ** 2
    return base


@pytest.mark.parametrize("q,w", [("alpha beta", 1.0), ("alpha beta", 0.25),
                                 ("alpha beta gamma", 1.0), ("alpha", 1.0),
                                 ("nonexistent", 1.0)])
def test_matches_scalar_spec(engine, q, w):
    got = engine.bm25_prox_topk(q, k=100, w=w)
    want = _spec(engine, q, w)
    assert {d for d, _ in got} == set(want)
    for d, s in got:
        assert s == pytest.approx(want[d], rel=1e-9), d
    # ranked (score desc, doc asc)
    ss = [(-s, d) for d, s in got]
    assert ss == sorted(ss)


def test_proximity_changes_ranking(engine):
    # docs 1 and 2 share both terms with similar tf; md=1 vs md=4 —
    # the adjacent doc must get the larger boost
    plain = dict(engine.bm25_topk("alpha beta", k=10))
    boosted = dict(engine.bm25_prox_topk("alpha beta", k=10, w=1.0))
    gain = {d: boosted[d] - plain[d] for d in plain if d in boosted}
    assert gain[1] > gain[2] > 0
    # single-term docs get no boost
    assert gain.get(4, 0.0) == pytest.approx(0.0)
