"""embedding_kmeans (distributed Lloyd's) + semdedup_pairs: inertia
monotonicity, partition invariance/determinism, brute-force pair parity,
max_cluster truncation guard."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _blobs(n=240, d=8, n_blobs=3, seed=3, planted=((10, 11), (50, 53))):
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n_blobs, d)) * 4
    vecs = [base[i % n_blobs] + rng.standard_normal(d) * 0.3 for i in range(n)]
    for a, b in planted:
        vecs[a] = vecs[b] + rng.standard_normal(d) * 1e-3
    return np.stack(vecs)


def _ds(m, parts=4):
    import ray.data

    tbl = pa.table({
        "vec_id": pa.array(np.arange(len(m)), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in m],
                              pa.list_(pa.float64())),
    })
    return ray.data.from_arrow(tbl).repartition(parts)


def test_kmeans_inertia_nonincreasing_and_coverage(ray_session):
    from search_engine_ray.pipelines.training_data import embedding_kmeans

    m = _blobs()
    assigned, cents, hist = embedding_kmeans(_ds(m), k=3, iters=8, tol=0.0)
    assert len(hist) == 8
    assert all(hist[i + 1] <= hist[i] + 1e-9 for i in range(len(hist) - 1))
    adf = assigned.to_pandas()
    assert len(adf) == len(m)
    assert set(adf["cluster"].unique()) <= set(range(3))
    assert cents.shape == (3, m.shape[1])
    # spherical: centroids unit-norm
    np.testing.assert_allclose(np.linalg.norm(cents, axis=1), 1.0, atol=1e-12)


def test_kmeans_partition_invariance(ray_session):
    from search_engine_ray.pipelines.training_data import embedding_kmeans

    m = _blobs(seed=5)
    a1, c1, _ = embedding_kmeans(_ds(m, parts=1), k=3, iters=5)
    a2, c2, _ = embedding_kmeans(_ds(m, parts=7), k=3, iters=5)
    np.testing.assert_allclose(c1, c2, atol=1e-9)
    pd.testing.assert_frame_equal(
        a1.to_pandas().sort_values("vec_id").reset_index(drop=True),
        a2.to_pandas().sort_values("vec_id").reset_index(drop=True))


def test_semdedup_matches_brute_force(ray_session):
    from search_engine_ray.pipelines.training_data import semdedup_pairs

    m = _blobs()
    thr = 0.999
    pairs = semdedup_pairs(_ds(m), threshold=thr, k=3, iters=8).to_pandas()
    got = set(zip(pairs["a"].tolist(), pairs["b"].tolist()))
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = mn @ mn.T
    iu, ju = np.triu_indices(len(m), k=1)
    hit = sims[iu, ju] >= thr
    bf = set(zip(iu[hit].tolist(), ju[hit].tolist()))
    # blobs are well separated → within-cluster search is globally exhaustive
    assert got == bf
    assert (10, 11) in got and (50, 53) in got
    assert (pairs["a"] < pairs["b"]).all()


def test_semdedup_subsplit_finds_pairs_beyond_cap(ray_session):
    """Oversized-cluster sub-split (the old guard truncated to the
    max_cluster smallest ids, silently dropping every pair beyond them).
    An exact duplicate planted past the cap must be found: embedding-sign
    sub-buckets never separate identical vectors."""
    from search_engine_ray.pipelines.training_data import semdedup_pairs

    m = _blobs(n=60, n_blobs=1, planted=())
    m[55] = m[40]  # exact dup, both ids outside the 10 smallest
    thr = 0.999
    pairs = semdedup_pairs(_ds(m), threshold=thr, k=1, iters=2,
                           max_cluster=10).to_pandas()
    got = set(zip(pairs["a"].tolist(), pairs["b"].tolist()))
    assert (40, 55) in got  # the pair the truncation guard used to drop
    # soundness: every returned pair is a true brute-force pair
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = mn @ mn.T
    iu, ju = np.triu_indices(len(m), k=1)
    bf = set(zip(iu[sims[iu, ju] >= thr].tolist(),
                 ju[sims[iu, ju] >= thr].tolist()))
    assert got <= bf and (pairs["a"] < pairs["b"]).all()
    assert not pairs.duplicated(["a", "b"]).any()  # cross-table dedup


def test_semdedup_subsplit_partition_invariant(ray_session):
    from search_engine_ray.pipelines.training_data import semdedup_pairs

    m = _blobs(n=80, n_blobs=1, planted=())
    m[70] = m[12]
    kw = dict(threshold=0.99, k=1, iters=2, max_cluster=16)
    a = (semdedup_pairs(_ds(m, parts=1), **kw).to_pandas()
         .sort_values(["a", "b"]).reset_index(drop=True))
    b = (semdedup_pairs(_ds(m, parts=7), **kw).to_pandas()
         .sort_values(["a", "b"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    assert (12, 70) in set(zip(a["a"].tolist(), a["b"].tolist()))


def test_group_pair_indices_windows_keep_buckets_connected():
    """Oversized band buckets emit overlapping cap-windows: every row
    pairs with someone and the union graph spans the bucket (the old cap
    orphaned every row past the first ``cap``)."""
    from search_engine_ray.pipelines.training_data import _group_pair_indices

    gid = np.r_[np.zeros(100, np.int64), np.ones(3, np.int64)]
    ai, bi = _group_pair_indices(gid, cap=16)
    assert set(np.unique(np.r_[ai, bi])) == set(range(103))
    # single connected component over the size-100 bucket
    parent = list(range(103))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(ai, bi):
        parent[find(int(a))] = find(int(b))
    assert len({find(i) for i in range(100)}) == 1
    # small group still pairs exhaustively
    assert {(a, b) for a, b in zip(ai, bi) if a >= 100} == {
        (100, 101), (100, 102), (101, 102)}
