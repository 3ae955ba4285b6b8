"""Dense second-stage rerank (query/fusion.py::dense_rerank)."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    import ray.data

    rng = np.random.default_rng(41)
    vecs = rng.normal(size=(60, 8)).astype(np.float32)
    return ray.data.from_arrow(pa.table({
        "vec_id": pa.array(range(60), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32()))})), vecs


def _cos(a, b):
    a = a / np.linalg.norm(a)
    b = b / np.linalg.norm(b)
    return float(a @ b)


def test_rerank_restricted_to_pool_and_ordered(emb_ds):
    from search_engine_ray.query.fusion import dense_rerank

    ds, vecs = emb_ds
    pool = [3, 7, 11, 19, 23, 42, 57]
    q = vecs[5].astype(np.float64)
    out = dense_rerank(pool, ds, q, k=5).to_pandas()
    assert set(out["vec_id"]) <= set(pool)
    assert len(out) == 5
    # expected order: cosine desc (rounded 6), id asc
    want = sorted(((round(_cos(vecs[i].astype(np.float64), q), 6), -i) for i in pool),
                  reverse=True)[:5]
    assert out.sort_values("rank")["vec_id"].tolist() == [-i for _, i in want]
    for r, (c, i) in zip(out.sort_values("rank").itertuples(), want):
        assert r.score_r == pytest.approx(c, abs=2e-6)


def test_pool_larger_than_k_and_duplicates(emb_ds):
    from search_engine_ray.query.fusion import dense_rerank

    ds, vecs = emb_ds
    out = dense_rerank([1, 1, 2, 2, 3], ds, vecs[0], k=10).to_pandas()
    assert sorted(out["vec_id"]) == [1, 2, 3]   # dedup, all returned
    assert out["rank"].tolist() == sorted(out["rank"].tolist())


def test_empty_pool(emb_ds):
    from search_engine_ray.query.fusion import dense_rerank

    ds, vecs = emb_ds
    assert dense_rerank([], ds, vecs[0], k=5).count() == 0
