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


def test_semdedup_max_cluster_truncation(ray_session):
    from search_engine_ray.pipelines.training_data import semdedup_pairs

    m = _blobs(n=60, n_blobs=1, planted=())
    full = semdedup_pairs(_ds(m), threshold=0.0, k=1, iters=2,
                          max_cluster=10).to_pandas()
    # truncation keeps the 10 smallest ids → 45 pairs among ids 0..9
    assert len(full) == 45
    assert full[["a", "b"]].to_numpy().max() <= 9
