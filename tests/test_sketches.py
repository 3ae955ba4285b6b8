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


class TestDistinctCount:
    def test_exact_matches_reference(self, ray_session):
        import ray.data

        from search_engine_ray.pipelines.sketches import distinct_token_count

        texts = _zipfish(n_docs=100)
        ds = ray.data.from_arrow(pa.table({"text": pa.array(texts)})).repartition(6)
        true = len({w for t in texts for w in t.split()})
        assert distinct_token_count(ds) == true

    def test_hll_error_bound_large_vocab(self, ray_session):
        import ray.data

        from search_engine_ray.pipelines.sketches import hll_distinct_tokens

        # ~60k distinct tokens — well past the linear-counting regime
        rng = np.random.default_rng(3)
        vocab = np.array([f"w{i:06d}" for i in range(60_000)])
        texts = [" ".join(rng.choice(vocab, size=200, replace=False))
                 for _ in range(600)]
        ds = ray.data.from_arrow(pa.table({"text": pa.array(texts)})).repartition(8)
        true = len({w for t in texts for w in t.split()})
        r = hll_distinct_tokens(ds, p=14)
        rel = abs(r["estimate"] - true) / true
        # 1.04/sqrt(2^14) ≈ 0.8%; allow 3 sigma
        assert rel < 3 * r["rel_err_bound"], (r["estimate"], true, rel)

    def test_hll_mergeable_partition_invariant(self, ray_session):
        import ray.data

        from search_engine_ray.pipelines.sketches import hll_distinct_tokens

        texts = _zipfish(n_docs=300)
        tbl = pa.table({"text": pa.array(texts)})
        ests = []
        for parts in (1, 4, 13):
            ds = ray.data.from_arrow(tbl).repartition(parts)
            ests.append(hll_distinct_tokens(ds, p=12)["estimate"])
        assert ests[0] == ests[1] == ests[2]

    def test_hll_small_range_linear_counting(self, ray_session):
        import ray.data

        from search_engine_ray.pipelines.sketches import hll_distinct_tokens

        # 50 distinct << 2^14 registers → linear counting, near-exact
        texts = [f"a{i} b{i % 25}" for i in range(25)]
        ds = ray.data.from_arrow(pa.table({"text": pa.array(texts)}))
        r = hll_distinct_tokens(ds, p=14)
        assert r["estimate"] == 50


def test_count_min_never_underestimates_and_bounds(ray_session):
    import pyarrow as pa
    import ray.data

    from search_engine_ray.pipelines.sketches import (
        count_min_tokens,
        distinct_token_count,
    )

    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(300)]
    texts = [" ".join(vocab[min(int(rng.zipf(1.4)) - 1, 299)]
                      for _ in range(60)) for _ in range(200)]
    ds = ray.data.from_arrow(pa.table({"text": pa.array(texts)})).repartition(7)
    cm = count_min_tokens(ds, depth=4, width=2048)

    # exact counts for comparison
    from collections import Counter
    exact = Counter(w for t in texts for w in t.split())
    assert cm["n_tokens"] == sum(exact.values())
    eps_n = (np.e / 2048) * cm["n_tokens"]
    over = 0
    for w, c in exact.items():
        est = cm["estimate"](w)
        assert est >= c, w                       # never underestimates
        if est > c + eps_n:
            over += 1
    assert over <= max(2, len(exact) // 50)       # ε-bound holds broadly
    # unseen tokens may collide but stay within the same bound
    assert cm["estimate"]("neverseen") <= eps_n + 1


def test_count_min_merge_invariance(ray_session):
    import pyarrow as pa
    import ray.data

    from search_engine_ray.pipelines.sketches import count_min_tokens

    texts = [f"tok{i % 7} tok{i % 3}" for i in range(60)]
    t = pa.table({"text": pa.array(texts)})
    a = count_min_tokens(ray.data.from_arrow(t).repartition(1))
    b = count_min_tokens(ray.data.from_arrow(t).repartition(9))
    assert np.array_equal(a["sketch"], b["sketch"])   # partition-invariant
    assert a["n_tokens"] == b["n_tokens"]


def test_validate_table(ray_session):
    import pyarrow as pa
    import ray.data

    from search_engine_ray.pipelines.relational import validate_table

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "lang": pa.array(["en", "xx", None, "de", "en"], pa.string()),
        "n": pa.array([10, -5, 3, 900, 20], pa.int64()),
        "url": pa.array(["https://a", "ftp://b", "https://c", "https://d",
                         "https://a"], pa.string()),
    })
    rules = [
        {"rule": "lang_not_null", "kind": "not_null", "col": "lang"},
        {"rule": "lang_known", "kind": "in_set", "col": "lang",
         "allowed": ["en", "de", "fr"]},
        {"rule": "n_in_range", "kind": "range", "col": "n", "lo": 0, "hi": 100},
        {"rule": "url_https", "kind": "regex", "col": "url",
         "pattern": "^https://"},
        {"rule": "url_unique", "kind": "unique", "col": "url"},
    ]
    out = (validate_table(ray.data.from_arrow(t).repartition(3), rules,
                          id_col="doc_id").to_pandas().set_index("rule"))
    assert out.loc["lang_not_null", "n_violations"] == 1
    assert out.loc["lang_not_null", "sample_ids"] == "3"
    assert out.loc["lang_known", "n_violations"] == 2
    assert out.loc["n_in_range", "n_violations"] == 2
    assert set(out.loc["n_in_range", "sample_ids"].split(",")) == {"2", "4"}
    assert out.loc["url_https", "n_violations"] == 1
    assert out.loc["url_unique", "n_violations"] == 1
    assert out.loc["url_unique", "sample_ids"] == "https://a"

    # duplicate NUMERIC keys sample in numeric order ('2,10,100', not the
    # lexicographic '10,100,2' — matches the local-rule path / SQL oracle)
    dup = pa.table({"k": pa.array([2, 2, 10, 10, 100, 100, 1], pa.int64())})
    out3 = (validate_table(ray.data.from_arrow(dup).repartition(3),
                           [{"rule": "ku", "kind": "unique", "col": "k"}])
            .to_pandas().set_index("rule"))
    assert out3.loc["ku", "n_violations"] == 3
    assert out3.loc["ku", "sample_ids"] == "2,10,100"

    # clean table: all rules zero, unique included
    clean = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                      "url": pa.array(["https://x", "https://y"], pa.string())})
    out2 = (validate_table(ray.data.from_arrow(clean),
                           [{"rule": "u", "kind": "unique", "col": "url"},
                            {"rule": "h", "kind": "regex", "col": "url",
                             "pattern": "^https://"}],
                           id_col="doc_id").to_pandas())
    assert (out2["n_violations"] == 0).all()
