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


def _mmr_spec(ids, vecs, q, k, lam):
    """Scalar greedy spec."""
    import numpy as np

    vn = [v / np.linalg.norm(v) for v in vecs]
    qn = q / np.linalg.norm(q)
    rel = {i: float(v @ qn) for i, v in zip(ids, vn)}
    vmap = dict(zip(ids, vn))
    sel, out = [], []
    remaining = sorted(ids)
    for _ in range(min(k, len(ids))):
        best, best_s = None, -np.inf
        for i in remaining:
            red = max((float(vmap[i] @ vmap[j]) for j in sel), default=0.0)
            s = lam * rel[i] - (1 - lam) * red
            if s > best_s:
                best, best_s = i, s
        sel.append(best)
        remaining.remove(best)
        out.append((best, best_s))
    return out


def test_mmr_matches_scalar_spec(emb_ds):
    from search_engine_ray.query.fusion import mmr_rerank

    ds, vecs = emb_ds
    pool = [2, 5, 8, 13, 21, 34, 55]
    q = vecs[3].astype(np.float64)
    got = mmr_rerank(pool, ds, q, k=5, lam=0.7)
    want = _mmr_spec(pool, [vecs[i].astype(np.float64) for i in pool], q, 5, 0.7)
    assert [i for i, _ in got] == [i for i, _ in want]
    for (_, a), (_, b) in zip(got, want):
        assert a == pytest.approx(b, rel=1e-9)


def test_mmr_lam1_is_pure_cosine_order(emb_ds):
    from search_engine_ray.query.fusion import dense_rerank, mmr_rerank

    ds, vecs = emb_ds
    pool = list(range(20))
    q = vecs[7].astype(np.float64)
    got = [i for i, _ in mmr_rerank(pool, ds, q, k=8, lam=1.0)]
    pure = dense_rerank(pool, ds, q, k=8, round_digits=12).to_pandas()
    assert got == pure.sort_values("rank")["vec_id"].tolist()


def test_mmr_diversifies_duplicates(ray_session):
    import ray.data

    from search_engine_ray.query.fusion import mmr_rerank

    # vec 1 == vec 2 (duplicates, most relevant); vec 3 orthogonal-ish.
    vecs = np.array([[1.0, 0.0], [0.99, 0.1], [0.99, 0.1], [0.0, 1.0]],
                    np.float32)
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(range(4), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32()))}))
    q = np.array([1.0, 0.05])
    got = [i for i, _ in mmr_rerank([1, 2, 3], ds, q, k=2, lam=0.3)]
    # pure cosine would pick the duplicate pair {1, 2}; MMR must pick the
    # diverse doc 3 second
    assert got[0] == 1 and got[1] == 3


def test_mmr_empty_pool(emb_ds):
    from search_engine_ray.query.fusion import mmr_rerank

    ds, vecs = emb_ds
    assert mmr_rerank([], ds, vecs[0], k=5) == []
