"""Batch-query actor pool vs direct engine calls."""

import pytest

from search_engine_ray.query.batch import batch_query, make_query_set


@pytest.fixture(scope="module")
def index_dir(tmp_path_factory, ray_session):
    import ray.data

    from search_engine_ray.config import EngineConfig
    from search_engine_ray.pipelines.build import build_index
    from search_engine_ray.sources.webpages import webpages_from_documents

    out = str(tmp_path_factory.mktemp("bq_index"))
    build_index(webpages_from_documents("/root/testdata/sf0.001"), out, EngineConfig())
    return out


def test_batch_matches_direct(index_dir, ray_session):
    import ray.data

    from search_engine_ray.query.batch import QueryActor
    from search_engine_ray.query.engine import SearchEngine

    qs = make_query_set(24)
    ds = ray.data.from_items(qs, override_num_blocks=3)
    out = batch_query(ds, index_dir, concurrency=(1, 2)).to_pandas()

    direct = QueryActor(index_dir)
    import pyarrow as pa

    expected = direct(pa.Table.from_pylist(qs)).to_pandas()
    key = ["query_id", "mode", "rank"]
    got = out.sort_values(key).reset_index(drop=True)
    want = expected.sort_values(key).reset_index(drop=True)
    assert got.equals(want)
    assert (out.groupby("query_id")["rank"].max() <= 10).all()


def test_query_set_covers_modes():
    qs = make_query_set(40)
    modes = {q["mode"] for q in qs}
    assert modes == {"boolean_and", "tfidf_topk", "bm25_topk", "bm25_wand",
                     "bm25_maxscore", "bm25_prox", "phrase", "proximity",
                     "fuzzy", "ql_topk", "wildcard", "search"}
    assert any(q["k"] == 2 for q in qs)
    assert all("*" in q["query_text"] for q in qs if q["mode"] == "wildcard")
    # deterministic
    assert make_query_set(40) == qs
