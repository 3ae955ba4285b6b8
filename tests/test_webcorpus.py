"""Web-corpus curation ops (pipelines/webcorpus.py) + the distributed
prefix-sum primitive (stages/scan.py): scalar-spec equivalence and
partition invariance."""

import numpy as np
import pyarrow as pa
import pytest


def _pages(n=600, hosts=5, seed=3):
    rng = np.random.default_rng(seed)
    ids = np.arange(n, dtype=np.int64)
    rng.shuffle(ids)  # non-sorted input: ops must not rely on order
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "url": pa.array(
            [f"https://h{int(i) % hosts}.example.test/a/{int(i)}" for i in ids],
            pa.string()),
        "text": pa.array(
            [("w " * (int(i) % 9)).strip() for i in ids], pa.string()),
        "lang": pa.array(
            ["en" if int(i) % 4 else "fr" for i in ids], pa.string()),
    })


def _ds(tbl, parts):
    import ray.data

    return ray.data.from_arrow(tbl).repartition(parts)


def test_host_of_edge_cases(ray_session):
    from search_engine_ray.pipelines.webcorpus import host_of

    urls = pa.array([
        "https://a.b.c/x", "http://h:8080/p", "ftp://f.q?x=1",
        "scheme+x://host#frag", "no-scheme/path", "", "https://solo",
    ])
    assert host_of(urls).to_pylist() == [
        "a.b.c", "h", "f.q", "host", "", "", "solo",
    ]


def test_host_stats_matches_pandas(ray_session):
    from search_engine_ray.pipelines.webcorpus import host_stats

    tbl = _pages()
    out = host_stats(_ds(tbl, 7)).to_pandas().sort_values("host").reset_index(drop=True)
    df = tbl.to_pandas()
    df["host"] = df.url.str.extract(r"://([^/:?#]+)")
    df["nt"] = df.text.str.split().map(len)
    exp = (df.groupby("host").agg(n_docs=("doc_id", "size"), total_tokens=("nt", "sum"))
           .reset_index())
    assert out.host.tolist() == exp.host.tolist()
    assert out.n_docs.tolist() == exp.n_docs.tolist()
    assert out.total_tokens.tolist() == exp.total_tokens.tolist()


@pytest.mark.parametrize("parts", [1, 13])
def test_host_cap_filter_keeps_smallest_ids(ray_session, parts):
    from search_engine_ray.pipelines.webcorpus import host_cap_filter

    tbl = _pages(n=400, hosts=3)
    out = host_cap_filter(_ds(tbl, parts), cap=4).to_pandas()
    g = out.groupby("host").doc_id.apply(lambda s: sorted(s))
    for host, kept in g.items():
        k = int(host[1])  # h{k}.example.test
        expected = sorted(i for i in range(400) if i % 3 == k)[:4]
        assert kept == expected, host
    assert len(out) == 12


def test_stratified_sample_rule_and_invariance(ray_session):
    import hashlib

    from search_engine_ray.pipelines.webcorpus import stratified_sample

    tbl = _pages(n=800)
    frac = {"en": 0.4}
    out = stratified_sample(_ds(tbl, 5), frac, default_frac=0.05).to_pandas()
    out2 = stratified_sample(_ds(tbl, 17), frac, default_frac=0.05).to_pandas()
    assert sorted(out.doc_id) == sorted(out2.doc_id)  # partition-invariant
    # scalar spec: md5 hex prefix below the per-stratum threshold
    thr = {"en": f"{int(0.4 * 2**32):08x}"}
    default = f"{int(0.05 * 2**32):08x}"
    df = tbl.to_pandas()
    exp = [int(i) for i, l in zip(df.doc_id, df.lang)
           if hashlib.md5(str(int(i)).encode()).hexdigest()[:8] < thr.get(l, default)]
    assert sorted(out.doc_id) == sorted(exp)
    # mix64 twin: same contract (per-stratum, deterministic), disjoint hash
    m = stratified_sample(_ds(tbl, 5), frac, default_frac=0.05, method="mix64").to_pandas()
    m2 = stratified_sample(_ds(tbl, 9), frac, default_frac=0.05, method="mix64").to_pandas()
    assert sorted(m.doc_id) == sorted(m2.doc_id)
    n_en = (df.lang == "en").sum()
    assert abs((m.lang == "en").sum() - 0.4 * n_en) < 0.1 * n_en


def test_split_assign_rule_stability_and_coverage(ray_session):
    import hashlib

    from search_engine_ray.pipelines.webcorpus import split_assign

    tbl = _pages(n=1000)
    splits = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = split_assign(_ds(tbl, 5), splits).to_pandas().set_index("doc_id")["split"]
    out2 = split_assign(_ds(tbl, 17), splits).to_pandas().set_index("doc_id")["split"]
    assert out.sort_index().equals(out2.sort_index())  # partition-invariant
    # scalar spec: cumulative md5-hex bounds
    b0, b1 = f"{int(0.8 * 2**32):08x}", f"{int((0.8 + 0.1) * 2**32):08x}"
    for i in out.index[:200]:
        h = hashlib.md5(str(int(i)).encode()).hexdigest()[:8]
        want = "train" if h < b0 else ("val" if h < b1 else "test")
        assert out[i] == want, i
    # every row assigned exactly one split; fractions in the right ballpark
    assert set(out.unique()) <= set(splits)
    assert abs((out == "train").mean() - 0.8) < 0.06
    # GROWTH STABILITY: adding docs never reassigns existing ones
    bigger = _pages(n=2000)
    out_big = split_assign(_ds(bigger, 7), splits).to_pandas().set_index("doc_id")["split"]
    assert out_big.loc[out.index].sort_index().equals(out.sort_index())
    # mix64 twin: same contract, vectorized path
    m = split_assign(_ds(tbl, 5), splits, method="mix64").to_pandas()
    m2 = split_assign(_ds(tbl, 9), splits, method="mix64").to_pandas()
    assert m.sort_values("doc_id").split.tolist() == m2.sort_values("doc_id").split.tolist()
    assert abs((m.split == "train").mean() - 0.8) < 0.06


@pytest.mark.parametrize("parts", [1, 4, 19])
def test_ordered_prefix_sum_matches_numpy(ray_session, parts):
    import ray.data

    from search_engine_ray.stages.scan import ordered_prefix_sum

    rng = np.random.default_rng(11)
    ids = np.arange(1000, dtype=np.int64)
    rng.shuffle(ids)
    vals = rng.integers(0, 50, 1000).astype(np.int64)
    tbl = pa.table({"k": pa.array(ids, pa.int64()), "v": pa.array(vals, pa.int64())})
    ds = ray.data.from_arrow(tbl).repartition(parts)
    out = ordered_prefix_sum(ds, "k", "v", out_col="p").to_pandas().sort_values("k")
    order = np.argsort(ids, kind="stable")
    sorted_vals = vals[order]
    exp = np.concatenate([[0], np.cumsum(sorted_vals)[:-1]])
    assert (out.p.to_numpy() == exp).all()
    assert (out.k.to_numpy() == ids[order]).all()


def test_ordered_prefix_sum_rejects_duplicate_keys(ray_session):
    import ray.data

    from search_engine_ray.stages.scan import ordered_prefix_sum

    tbl = pa.table({"k": pa.array([1, 2, 2, 3], pa.int64()),
                    "v": pa.array([1, 1, 1, 1], pa.int64())})
    ds = ray.data.from_arrow(tbl).repartition(2)
    with pytest.raises(Exception):
        ordered_prefix_sum(ds, "k", "v").to_pandas()


def test_pack_sequences_plan(ray_session):
    from search_engine_ray.pipelines.webcorpus import pack_sequences

    tbl = _pages(n=300)
    out = pack_sequences(_ds(tbl, 6), max_len=32).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    nt = np.array([i % 9 for i in range(300)], np.int64)
    assert (out.n_tokens.to_numpy() == nt).all()
    start = np.concatenate([[0], np.cumsum(nt)[:-1]])
    assert (out.start_off.to_numpy() == start).all()
    assert (out.pack_first.to_numpy() == start // 32).all()
    end_last = np.where(nt > 0, (start + nt - 1) // 32, start // 32)
    assert (out.pack_last.to_numpy() == end_last).all()
    # empty docs never straddle; non-empty docs straddle ≤ ceil(n/32) packs
    assert (out.pack_last.to_numpy() >= out.pack_first.to_numpy()).all()


class TestDeterministicShuffle:
    def _docs(self, n=200):
        import pandas as pd
        return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64)})

    def test_is_permutation_and_sharded(self, ray_session):
        import ray.data

        from search_engine_ray.pipelines.webcorpus import deterministic_shuffle

        ds = ray.data.from_pandas(self._docs()).repartition(5)
        out = deterministic_shuffle(ds, n_shards=4).to_pandas()
        assert sorted(out["rank"]) == list(range(200))
        assert sorted(out["doc_id"]) == list(range(200))
        assert (out["shard"] == out["rank"] % 4).all()

    def test_partition_invariant(self, ray_session):
        import pandas as pd
        import ray.data

        from search_engine_ray.pipelines.webcorpus import deterministic_shuffle

        outs = []
        for parts in (1, 7):
            ds = ray.data.from_pandas(self._docs()).repartition(parts)
            outs.append(deterministic_shuffle(ds).to_pandas()
                        .sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(outs[0], outs[1])

    def test_salt_changes_order(self, ray_session):
        import ray.data

        from search_engine_ray.pipelines.webcorpus import deterministic_shuffle

        ds = ray.data.from_pandas(self._docs())
        a = deterministic_shuffle(ds, salt="a").to_pandas().sort_values("doc_id")
        b = deterministic_shuffle(ds, salt="b").to_pandas().sort_values("doc_id")
        assert (a["rank"].to_numpy() != b["rank"].to_numpy()).any()

    def test_md5_mode_matches_scalar_reference(self, ray_session):
        import hashlib

        import ray.data

        from search_engine_ray.pipelines.webcorpus import deterministic_shuffle

        n = 50
        ds = ray.data.from_pandas(self._docs(n)).repartition(3)
        out = (deterministic_shuffle(ds, hash_mode="md5", salt="shuf")
               .to_pandas().sort_values("rank"))
        exp = sorted(range(n),
                     key=lambda i: (hashlib.md5(f"{i}-shuf".encode()).hexdigest(), i))
        assert out["doc_id"].tolist() == exp


class TestCanonicalUrls:
    def test_rules(self):
        from search_engine_ray.pipelines.webcorpus import canonical_url_batch

        cases = {
            "HTTP://Example.COM:80/path?q=1#frag": "http://example.com/path?q=1",
            "https://A.b:443/": "https://a.b",
            "http://h/p?utm_source=x&q=1": "http://h/p?q=1",
            "http://h/p?q=1&utm_b=2#f": "http://h/p?q=1",
            "http://h/p?utm_a=1&utm_b=2": "http://h/p",
            "http://h/p?utm_a=1&utm_b=2&q=3": "http://h/p?q=3",
            "http://h:8080/x": "http://h:8080/x",     # non-default port kept
            "http://h/": "http://h",
            "http://h/p/": "http://h/p/",             # non-bare slash kept
            "https://h:80/x": "https://h:80/x",       # :80 is not https-default
        }
        got = canonical_url_batch(list(cases))
        assert got == list(cases.values())

    def test_composes_with_latest_snapshot(self, ray_session):
        """canonicalize_urls → latest_snapshot(url_col=url_canon) keeps one
        newest capture per canonical page identity."""
        import ray.data

        from search_engine_ray.pipelines.webcorpus import (
            canonicalize_urls,
            latest_snapshot,
        )

        rows = [
            {"doc_id": 1, "url": "HTTP://H.test:80/p?utm_s=1", "warc_ts": 100},
            {"doc_id": 2, "url": "http://h.test/p", "warc_ts": 200},
            {"doc_id": 3, "url": "http://other.test/q", "warc_ts": 50},
        ]
        pages = ray.data.from_items(rows, override_num_blocks=2)
        out = latest_snapshot(canonicalize_urls(pages),
                              url_col="url_canon").to_pandas()
        kept = set(out["doc_id"])
        assert kept == {2, 3}  # doc 2 is the newer capture of doc 1's page


def test_upsample_mix_rule_invariance_and_epochs(ray_session):
    import hashlib

    from search_engine_ray.pipelines.webcorpus import stratified_sample, upsample_mix

    tbl = _pages(n=600)
    w = {"en": 2.5, "fr": 0.4}
    out = upsample_mix(_ds(tbl, 5), w, default_weight=1.0).to_pandas()
    out2 = upsample_mix(_ds(tbl, 17), w, default_weight=1.0).to_pandas()
    key = lambda d: sorted(zip(d.doc_id, d.epoch))  # noqa: E731
    assert key(out) == key(out2)  # partition-invariant

    # scalar spec: copies = floor(w) + [md5 prefix < frac threshold]
    df = tbl.to_pandas()
    thr = {"en": f"{int(0.5 * 2**32):08x}", "fr": f"{int(0.4 * 2**32):08x}"}
    base = {"en": 2, "fr": 0}
    exp = []
    for i, l in zip(df.doc_id, df.lang):
        c = base.get(l, 1) + (hashlib.md5(str(int(i)).encode()).hexdigest()[:8]
                              < thr.get(l, "00000000"))
        exp += [(int(i), e) for e in range(c)]
    assert key(out) == sorted(exp)
    # every doc's epochs are contiguous 0..c-1
    g = out.groupby("doc_id").epoch
    assert (g.min() == 0).all() and (g.max() + 1 == g.count()).all()

    # pure-fraction stratum ≡ stratified_sample keep-set at that fraction
    ss = stratified_sample(_ds(tbl, 5), {"fr": 0.4}, default_frac=0.0).to_pandas()
    fr_mix = out[(out.lang == "fr")]
    assert sorted(fr_mix.doc_id) == sorted(ss.doc_id)

    # w=0 drops the stratum entirely; mix64 twin keeps the same E[copies]
    z = upsample_mix(_ds(tbl, 5), {"en": 0.0, "fr": 0.0},
                     default_weight=0.0).to_pandas()
    assert len(z) == 0
    m = upsample_mix(_ds(tbl, 9), w, default_weight=1.0, method="mix64").to_pandas()
    n_en = (df.lang == "en").sum()
    assert abs((m.lang == "en").sum() - 2.5 * n_en) < 0.15 * n_en


@pytest.mark.parametrize("parts", [3, 11])
def test_curriculum_order_matches_pandas_rank(ray_session, parts):
    from search_engine_ray.functions.quality import batch_doc_stats, batch_quality_score
    from search_engine_ray.pipelines.webcorpus import curriculum_order

    tbl = _pages(n=400)
    out = curriculum_order(_ds(tbl, parts)).to_pandas().sort_values("position")
    # gap-free 0-based positions
    assert out.position.tolist() == list(range(len(tbl)))
    # matches the transparent spec rank
    q = batch_quality_score(batch_doc_stats(tbl["text"]))
    df = tbl.to_pandas().assign(q=q)
    spec = df.sort_values(["q", "doc_id"], ascending=[False, True]).doc_id.tolist()
    assert out.doc_id.tolist() == spec
    np.testing.assert_allclose(np.sort(out.quality_r), np.sort(q))


@pytest.mark.parametrize("parts", [3, 9])
def test_token_budget_head_prefix_property(ray_session, parts):
    from search_engine_ray.functions.quality import batch_doc_stats, batch_quality_score
    from search_engine_ray.pipelines.webcorpus import token_budget_head

    tbl = _pages(n=300)
    budget = 400
    out = token_budget_head(_ds(tbl, parts), budget).to_pandas() \
        .sort_values("cum_tokens").reset_index(drop=True)
    # spec: sort by (quality desc, id), cumulative n_tokens <= budget
    st = batch_doc_stats(tbl["text"])
    q = batch_quality_score(st)
    df = tbl.to_pandas().assign(q=q, n=st["n_tokens"].astype(np.int64))
    df = df.sort_values(["q", "doc_id"], ascending=[False, True])
    df["cum"] = df.n.cumsum()
    spec = df[df.cum <= budget]
    assert out.doc_id.tolist() == spec.doc_id.tolist()
    assert out.cum_tokens.tolist() == spec.cum.tolist()
    assert out.cum_tokens.iloc[-1] <= budget
    # maximality: adding the next doc would overflow
    if len(spec) < len(df):
        nxt = df.iloc[len(spec)]
        assert out.cum_tokens.iloc[-1] + nxt.n > budget


class TestSampleK:
    def _docs(self, n, parts):
        import ray.data

        return ray.data.from_items(
            [{"doc_id": i, "text": f"t{i}"} for i in range(n)],
            override_num_blocks=parts)

    @pytest.mark.parametrize("parts", [1, 7])
    def test_md5_matches_bruteforce_and_partition_invariant(self, ray_session, parts):
        import hashlib

        from search_engine_ray.pipelines.webcorpus import sample_k

        n, k = 60, 10
        out = sample_k(self._docs(n, parts), k).to_pandas()
        want = sorted(range(n), key=lambda i: hashlib.md5(str(i).encode()).hexdigest())[:k]
        assert sorted(out["doc_id"]) == sorted(want)
        assert list(out.columns) == ["doc_id", "text"]  # _pri dropped

    def test_exact_size_and_small_corpus(self, ray_session):
        from search_engine_ray.pipelines.webcorpus import sample_k

        assert sample_k(self._docs(5, 2), 10).count() == 5
        assert sample_k(self._docs(100, 4), 10).count() == 10

    def test_mix64_mode_uniform_and_growth_stable(self, ray_session):
        from search_engine_ray.functions.hashing import mix64
        from search_engine_ray.pipelines.webcorpus import sample_k

        n, k = 80, 12
        got = sorted(sample_k(self._docs(n, 5), k, method="mix64")
                     .to_pandas()["doc_id"])
        ids = np.arange(n, dtype=np.int64)
        pri = mix64(ids.view(np.uint64))
        assert got == sorted(ids[np.argsort(pri, kind="stable")[:k]].tolist())
        # growth-stable: the doubled corpus's sample ∩ old ids ⊆ old sample
        got2 = set(sample_k(self._docs(2 * n, 5), k, method="mix64")
                   .to_pandas()["doc_id"])
        assert got2 & set(ids.tolist()) <= set(got)


def test_host_mirrors(ray_session):
    import ray.data

    from search_engine_ray.pipelines.webcorpus import host_mirrors

    rows = []
    # hosts a,b mirror 3 contents; c shares 1 with a; rest unique
    for i, (host, text) in enumerate([
        ("a", "x1"), ("a", "x2"), ("a", "x3"), ("a", "ua"),
        ("b", "x1"), ("b", "x2"), ("b", "x3"),
        ("c", "x1"), ("c", "uc1"), ("c", "uc2"),
    ]):
        rows.append({"doc_id": i, "url": f"https://{host}.test/p/{i}",
                     "text": text})
    out = (host_mirrors(ray.data.from_items(rows)).to_pandas()
           .set_index(["host_a", "host_b"]))
    assert len(out) == 3
    assert out.loc[("a.test", "b.test"), "n_shared"] == 3
    assert out.loc[("a.test", "b.test"), "overlap_r"] == 1.0  # 3/min(4,3)
    assert out.loc[("a.test", "c.test"), "n_shared"] == 1
    assert out.loc[("a.test", "c.test"), "overlap_r"] == round(1 / 3, 6)
    assert out.loc[("b.test", "c.test"), "n_shared"] == 1


def test_host_mirrors_empty_and_cap(ray_session):
    import ray.data

    from search_engine_ray.pipelines.webcorpus import host_mirrors

    # all-unique corpus → typed empty result (no join crash)
    rows = [{"doc_id": i, "url": f"https://h{i}.test/x", "text": f"u{i}"}
            for i in range(6)]
    ds = host_mirrors(ray.data.from_items(rows))
    assert ds.count() == 0
    assert set(ds.schema().names) == {"host_a", "host_b", "n_shared",
                                      "overlap_r"}

    # a hash on more hosts than the cap is dropped before pair expansion
    rows = [{"doc_id": i, "url": f"https://h{i}.test/x", "text": "same"}
            for i in range(5)]
    out = host_mirrors(ray.data.from_items(rows),
                       max_hosts_per_hash=3).to_pandas()
    assert len(out) == 0


def test_host_mirrors_near(ray_session):
    import ray.data

    from search_engine_ray.pipelines.webcorpus import host_mirrors_near

    base = ("the quick brown fox jumps over the lazy dog again and again "
            * 5)
    rows = []
    for i, (host, text) in enumerate([
        ("a", base + "footer-a"), ("a", "unique content on a " * 10),
        ("b", base + "footer-b-x"), ("b", "other b stuff entirely " * 10),
        ("c", "completely different page " * 10),
    ]):
        rows.append({"doc_id": i, "url": f"https://{host}.test/p/{i}",
                     "text": text})
    out = host_mirrors_near(ray.data.from_items(rows), shingle_k=2,
                            threshold=0.5).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["host_a"], r["host_b"], r["n_near_dups"]) == ("a.test", "b.test", 1)


class TestRobotsMeta:
    def _pages(self, htmls):
        import ray.data

        return ray.data.from_items(
            [{"url": f"https://x{i}.test/", "html": h.encode()}
             for i, h in enumerate(htmls)])

    def test_directive_parsing_variants(self, ray_session):
        from search_engine_ray.pipelines.webcorpus import robots_meta_table

        htmls = [
            '<head><meta name="robots" content="noindex, nofollow"></head>',
            "<head><META NAME='ROBOTS' CONTENT='NOINDEX'></head>",
            '<head><meta content="nofollow" name="robots"></head>',  # reversed
            '<head><meta name=robots content=noindex></head>',       # unquoted
            '<head><meta name="viewport" content="noindex"></head>', # not robots
            '<head><meta name="robots" content="index, follow"></head>',
            "<head>no meta at all</head>",
        ]
        out = (robots_meta_table(self._pages(htmls)).to_pandas()
               .sort_values("url").reset_index(drop=True))
        assert out["noindex"].tolist() == [1, 1, 0, 1, 0, 0, 0]
        assert out["nofollow"].tolist() == [1, 0, 1, 0, 0, 0, 0]

    def test_index_filter_drops_noindex(self, ray_session):
        from search_engine_ray.pipelines.webcorpus import robots_index_filter

        htmls = ['<meta name="robots" content="noindex">', "<p>keep</p>",
                 '<meta name="robots" content="all">']
        out = robots_index_filter(self._pages(htmls)).to_pandas()
        assert sorted(out["url"]) == ["https://x1.test/", "https://x2.test/"]
