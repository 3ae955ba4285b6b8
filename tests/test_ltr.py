"""LTR feature extraction (query/ltr.py) against engine primitives."""

import numpy as np
import pytest

from search_engine_ray.config import EngineConfig
from search_engine_ray.functions.textproc import synthesize_html
from search_engine_ray.pipelines.build import build_index
from search_engine_ray.query.engine import SearchEngine
from search_engine_ray.query.ltr import ltr_features
from search_engine_ray.sources.webpages import _url_for


@pytest.fixture(scope="module")
def engine(tmp_path_factory, ray_session):
    import ray.data

    texts = [
        "alpha beta gamma alpha",
        "beta beta delta",
        "alpha epsilon",
        "zeta eta theta",
        "alpha beta alpha beta gamma",
    ]
    rows = [{"url": _url_for(i), "html": synthesize_html(t).encode()}
            for i, t in enumerate(texts)]
    out = str(tmp_path_factory.mktemp("ltr_idx"))
    build_index(ray.data.from_items(rows), out, EngineConfig())
    return SearchEngine(out)


def test_bm25_column_matches_engine(engine):
    feats = ltr_features(engine, "alpha beta").to_pandas()
    want = dict(engine.bm25_topk("alpha beta", k=100))
    got = dict(zip(feats["doc_id"], feats["bm25"]))
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-12)


def test_counts_and_coverage(engine):
    feats = ltr_features(engine, "alpha beta").to_pandas().set_index("doc_id")
    # docs 1,5 have both terms; 2 has beta only; 3 has alpha only
    assert feats.loc[1, "n_matched"] == 2 and feats.loc[1, "coverage"] == 1.0
    assert feats.loc[2, "n_matched"] == 1 and feats.loc[2, "coverage"] == 0.5
    assert feats.loc[5, "sum_tf"] == 4.0      # alpha x2 + beta x2
    assert feats.loc[5, "max_tf"] == 2.0
    assert feats.loc[1, "doc_len"] == 4
    assert 4 not in feats.index                # no query terms in doc 4


def test_absent_terms_count_in_coverage_denominator(engine):
    feats = ltr_features(engine, "alpha nonexistentzz").to_pandas()
    assert (feats["coverage"] == 0.5).all()    # 1 matched of 2 query terms


def test_idf_aggregates(engine):
    from search_engine_ray.query.scoring import bm25_idf

    feats = ltr_features(engine, "alpha delta").to_pandas().set_index("doc_id")
    idf_a = bm25_idf(3, engine.num_docs)   # alpha df=3
    idf_d = bm25_idf(1, engine.num_docs)   # delta df=1
    assert feats.loc[2, "sum_idf"] == pytest.approx(idf_d)      # delta only
    assert feats.loc[1, "min_idf"] == pytest.approx(idf_a)
    assert feats.loc[1, "max_idf"] == pytest.approx(idf_a)


def test_batch_ltr_features(engine, ray_session):
    import pyarrow as pa
    import ray.data

    from search_engine_ray.query.ltr import batch_ltr_features

    qs = ray.data.from_arrow(pa.table({
        "query_id": pa.array([10, 11, 12], pa.int64()),
        "query_text": pa.array(["alpha beta", "delta", "nonexistentzz"])}))
    out = batch_ltr_features(qs, engine.paths.out_dir).to_pandas()
    # per-query slices equal the local function
    for qid, text in [(10, "alpha beta"), (11, "delta")]:
        want = ltr_features(engine, text).to_pandas()
        got = (out[out["query_id"] == qid].drop(columns="query_id")
               .sort_values("doc_id").reset_index(drop=True))
        want = want.sort_values("doc_id").reset_index(drop=True)
        assert got.equals(want), qid
    assert (out["query_id"] != 12).all()   # no-hit query emits nothing


def test_empty_query_and_no_hits(engine):
    assert ltr_features(engine, "nonexistentzz").num_rows == 0
    t = ltr_features(engine, "")
    assert t.num_rows == 0
    assert t.schema.names[0] == "doc_id"


def test_query_predictors(engine):
    import math

    from search_engine_ray.query.evaluate import query_predictors
    from search_engine_ray.query.scoring import bm25_idf

    p = query_predictors(engine, "alpha nonexistentzz")
    assert p["n_terms"] == 2.0 and p["n_indexed"] == 1.0
    idf_a = bm25_idf(3, engine.num_docs)
    assert p["sum_idf"] == pytest.approx(idf_a)
    assert p["avg_idf"] == p["max_idf"] == pytest.approx(idf_a)
    # alpha ctf = 4 (2+1+... docs 1,3,5 contain alpha with tfs 2,1,2 → 5)
    tp = engine.get_postings("alpha")
    ctf = float(tp.tfs.sum())
    big_t = float(engine.stats["total_tokens"])
    assert p["avg_ictf"] == pytest.approx(math.log2(big_t / ctf))
    assert p["max_scq"] == pytest.approx(
        (1 + math.log(ctf)) * math.log(1 + engine.num_docs / tp.df))

    zero = query_predictors(engine, "nonexistentzz qqq")
    assert zero["n_indexed"] == 0.0 and zero["sum_idf"] == 0.0


def test_bm25_topk_sorted(engine):
    eng = engine
    # n_chars-like numeric attr over docs 1..5 (engine ids)
    eng.set_doc_sort_attr("size", [1, 2, 3, 5], [10.0, 40.0, 20.0, 40.0])
    rows = eng.bm25_topk_sorted("alpha beta", k=10, attr="size")
    ids = [d for d, _, _ in rows]
    # matching docs: 1,2,3,5; order by size desc, doc asc: 2(40),5(40),3(20),1(10)
    assert ids == [2, 5, 3, 1]
    assert [v for _, v, _ in rows] == [40.0, 40.0, 20.0, 10.0]
    # bm25 values match the exhaustive scorer per doc
    want = dict(eng.bm25_topk("alpha beta", k=100))
    for d, _, s in rows:
        assert s == pytest.approx(want[d], rel=1e-12)
    # ascending + missing-last: doc 5 absent from this attr
    eng.set_doc_sort_attr("size2", [1, 2, 3], [3.0, 1.0, 2.0])
    rows2 = eng.bm25_topk_sorted("alpha beta", k=10, attr="size2",
                                 descending=False)
    assert [d for d, _, _ in rows2] == [2, 3, 1, 5]
    assert np.isnan(rows2[-1][1])


def test_min_pair_md_feature(engine):
    feats = ltr_features(engine, "alpha beta").to_pandas().set_index("doc_id")
    # doc 1: "alpha beta gamma alpha" → alpha@{0,3}, beta@{1}: md = 1
    assert feats.loc[1, "min_pair_md"] == 1
    # doc 5: "alpha beta alpha beta gamma" → md = 1
    assert feats.loc[5, "min_pair_md"] == 1
    # single-term docs → 0
    assert feats.loc[2, "min_pair_md"] == 0
    assert feats.loc[3, "min_pair_md"] == 0


def test_bm25_topk_range(engine):
    eng = engine
    eng.set_doc_sort_attr("sz", [1, 2, 3, 4, 5], [10, 20, 30, 40, 50])
    full = dict(eng.bm25_topk("alpha beta", k=100))      # docs 1,2,3,5
    got = eng.bm25_topk_range("alpha beta", k=100, attr="sz", lo=15, hi=35)
    assert {d for d, _ in got} == {2, 3}
    for d, s in got:
        assert s == pytest.approx(full[d], rel=1e-12)
    # unbounded range == plain bm25
    all_r = eng.bm25_topk_range("alpha beta", k=100, attr="sz")
    assert all_r == eng.bm25_topk("alpha beta", k=100)
    # empty range
    assert eng.bm25_topk_range("alpha beta", k=10, attr="sz", lo=99, hi=5) == []


def test_ltr_training_rows(engine):
    from search_engine_ray.query.ltr import ltr_training_rows

    t = ltr_training_rows(engine, "alpha beta", [1, 5]).to_pandas()
    lab = t.set_index("doc_id")["label"]
    assert lab.loc[1] == 1 and lab.loc[5] == 1
    assert lab.loc[2] == 0 and lab.loc[3] == 0
    # empty relevance set → all zeros; features unchanged
    t0 = ltr_training_rows(engine, "alpha beta", []).to_pandas()
    assert (t0["label"] == 0).all()
    assert t.drop(columns="label").equals(t0.drop(columns="label"))


def test_ltr_actor_empty_block_keeps_schema(engine):
    import pyarrow as pa

    from search_engine_ray.query.ltr import LtrFeatureActor, ltr_features

    actor = LtrFeatureActor(engine.paths.out_dir)
    out = actor(pa.table({"query_id": pa.array([], pa.int64()),
                          "query_text": pa.array([], pa.string())}))
    want = ["query_id"] + ltr_features(engine, "alpha").schema.names
    assert out.schema.names == want and out.num_rows == 0


def test_bm25_topk_corrected(engine):
    # misspelled terms correct through the BK-tree and rerun
    res, terms, corrected = engine.bm25_topk_corrected("allpha betta", k=10)
    assert corrected and set(terms) == {"alpha", "beta"}
    assert res == engine.bm25_topk("alpha beta", k=10)
    # a well-spelled query never triggers correction
    res2, terms2, c2 = engine.bm25_topk_corrected("alpha beta", k=10)
    assert not c2 and res2 == engine.bm25_topk("alpha beta", k=10)
    # hopeless garbage: no correction possible → empty, corrected=False
    res3, terms3, c3 = engine.bm25_topk_corrected("zzzzqqqqxxxx", k=10)
    assert res3 == [] and terms3 == [] and not c3
