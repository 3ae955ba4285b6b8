"""heavy_hitters / skew_report: mergeable-summary guarantees vs exact
counts on a skewed corpus."""

from collections import Counter

import numpy as np
import pyarrow as pa
import pytest


def _zipfish(n_docs=400, seed=7):
    rng = np.random.default_rng(seed)
    vocab = [f"t{i}" for i in range(200)]
    w = 1.0 / np.arange(1, 201) ** 1.3
    w /= w.sum()
    texts = [" ".join(rng.choice(vocab, size=30, p=w)) for _ in range(n_docs)]
    return texts


@pytest.mark.parametrize("m", [16, 256])
def test_heavy_hitters_bounds(ray_session, m):
    import ray.data

    from search_engine_ray.pipelines.sketches import heavy_hitters

    texts = _zipfish()
    ds = ray.data.from_arrow(pa.table({"text": pa.array(texts)})).repartition(8)
    tbl, err = heavy_hitters(ds, k=10, m=m)
    true = Counter(w for t in texts for w in t.split())
    got = dict(zip(tbl["term"].to_pylist(), tbl["count_low"].to_pylist()))
    assert len(got) == 10 and err >= 0
    for term, c_low in got.items():
        assert c_low <= true[term] <= c_low + err, (term, c_low, true[term], err)
    # superset guarantee: every term with true count > err is present in
    # the merged summary — check via the top-1, which must be the true top
    true_top, true_cnt = true.most_common(1)[0]
    if true_cnt > 2 * err:
        assert tbl["term"].to_pylist()[0] == true_top


def test_heavy_hitters_exact_when_m_large(ray_session):
    import ray.data

    from search_engine_ray.pipelines.sketches import heavy_hitters

    texts = _zipfish(n_docs=100)
    ds = ray.data.from_arrow(pa.table({"text": pa.array(texts)})).repartition(4)
    tbl, err = heavy_hitters(ds, k=5, m=100_000)
    assert err == 0  # nothing dropped anywhere
    true = Counter(w for t in texts for w in t.split())
    exp = sorted(true.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert list(zip(tbl["term"].to_pylist(), tbl["count_low"].to_pylist())) == exp


def test_skew_report(ray_session):
    import ray.data

    from search_engine_ray.pipelines.sketches import skew_report

    n = 5000
    keys = ["hot"] * (n // 2) + [f"k{i}" for i in range(n // 2)]
    ds = ray.data.from_arrow(pa.table({
        "key": pa.array(keys), "v": pa.array(np.arange(n))})).repartition(16)
    rep = skew_report(ds, "key", k=3, m=64)
    assert rep["total_rows"] == n
    assert rep["hot_keys"][0][0] == "hot"
    lo = rep["hot_keys"][0][1]
    assert lo <= n // 2 <= lo + rep["err_bound"]
    assert rep["max_key_frac_upper"] >= 0.5
