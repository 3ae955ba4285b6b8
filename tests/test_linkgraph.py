"""extract_links (batch-regex href extraction) + distributed PageRank vs a
numpy power-iteration spec, including dangling-node redistribution."""

import numpy as np
import pyarrow as pa
import pytest


def _graph(n=60):
    urls = [f"https://n{i}.test/" for i in range(n)]
    htmls, edges = [], []
    for i in range(n):
        tgts = [] if i % 7 == 0 else [(i * 2 + 1) % n, (i * 3 + 2) % n]
        body = "".join(f'<a href="{urls[t]}">x</a>' for t in tgts)
        htmls.append(f"<html><body>{body}</body></html>".encode())
        edges += [(urls[i], urls[t]) for t in tgts]
    return urls, htmls, edges


def test_extract_links_matches_spec(ray_session):
    import ray.data

    from search_engine_ray.pipelines.linkgraph import extract_links

    urls, htmls, edges = _graph()
    pages = ray.data.from_arrow(pa.table({
        "url": pa.array(urls), "html": pa.array(htmls, pa.binary())})).repartition(5)
    got = sorted(map(tuple, extract_links(pages).to_pandas()
                     .itertuples(index=False, name=None)))
    assert got == sorted(edges)


def test_extract_links_edge_cases(ray_session):
    import ray.data

    from search_engine_ray.pipelines.linkgraph import extract_links

    pages = ray.data.from_arrow(pa.table({
        "url": pa.array(["u1", "u2", "u3", "u4"]),
        "html": pa.array([
            b"<a HREF='single-quote'>x</a>",        # case + quote style
            b"no links here",
            None,                                    # null payload
            b'href="a" junk href="b"',               # two on one row
        ], pa.binary()),
    }))
    got = sorted(map(tuple, extract_links(pages).to_pandas()
                     .itertuples(index=False, name=None)))
    assert got == [("u1", "single-quote"), ("u4", "a"), ("u4", "b")]


def test_extract_anchor_texts(ray_session):
    import ray.data

    from search_engine_ray.pipelines.linkgraph import extract_anchor_texts

    pages = ray.data.from_arrow(pa.table({
        "url": pa.array(["u1", "u2", "u3"]),
        "html": pa.array([
            b'<a class="x" href="t1">Hello World</a><a href="t2"></a>',
            b'<A HREF=\'t3\'>mixed CASE</A>',
            b'trailing text <a href="t4">ends at row boundary',
        ], pa.binary()),
    })).repartition(2)
    got = sorted(map(tuple, extract_anchor_texts(pages).to_pandas()
                     .itertuples(index=False, name=None)))
    assert got == [
        ("u1", "t1", "Hello World"), ("u1", "t2", ""),
        ("u2", "t3", "mixed CASE"), ("u3", "t4", "ends at row boundary"),
    ]


@pytest.mark.parametrize("parts", [1, 4])
def test_anchor_terms_topk(ray_session, parts):
    import ray.data

    from search_engine_ray.pipelines.linkgraph import anchor_terms

    # 6 srcs all pointing at one dst with skewed anchor vocab
    htmls = [f'<a href="T">{"hot " * 3}cold{i}</a>'.encode() for i in range(6)]
    pages = ray.data.from_arrow(pa.table({
        "url": pa.array([f"u{i}" for i in range(6)]),
        "html": pa.array(htmls, pa.binary()),
    })).repartition(parts)
    out = anchor_terms(pages, k=2).to_pandas().sort_values("rank")
    assert out.dst.tolist() == ["T", "T"]
    assert out.iloc[0].term == "hot" and out.iloc[0].n == 18
    assert out.iloc[1].term == "cold0" and out.iloc[1].n == 1  # tie → term asc


@pytest.mark.parametrize("parts", [1, 6])
def test_latest_snapshot(ray_session, parts):
    import numpy as np
    import ray.data

    from search_engine_ray.pipelines.webcorpus import latest_snapshot

    n = 300
    ids = np.arange(n, dtype=np.int64)
    tbl = pa.table({
        "url": pa.array([f"https://s{i % 13}.test/" for i in range(n)]),
        "warc_ts": pa.array(1_000_000 + ids * 7, pa.timestamp("us")),
        "doc_id": pa.array(ids, pa.int64()),
    })
    out = latest_snapshot(ray.data.from_arrow(tbl).repartition(parts)).to_pandas()
    assert len(out) == 13
    exp = {f"https://s{k}.test/": max(i for i in range(n) if i % 13 == k)
           for k in range(13)}
    assert {u: int(d) for u, d in zip(out.url, out.doc_id)} == exp


def test_pagerank_convergence_mode(ray_session):
    import ray.data

    from search_engine_ray.pipelines.linkgraph import extract_links, pagerank

    urls, htmls, edges = _graph(n=20)
    pages = ray.data.from_arrow(pa.table({
        "url": pa.array(urls), "html": pa.array(htmls, pa.binary())}))
    edges_ds = extract_links(pages).materialize()
    # loose tol stops after iteration 1 → identical to the fixed-1 run
    loose = pagerank(edges_ds, n_iters=10, tol=10.0).to_pandas()
    one = pagerank(edges_ds, n_iters=1).to_pandas()
    m = loose.merge(one, on="node", suffixes=("_a", "_b"))
    assert len(m) == len(one) and (m.rank_r_a == m.rank_r_b).all()
    # tight tol respects the n_iters cap → identical to the fixed-2 run
    capped = pagerank(edges_ds, n_iters=2, tol=1e-12).to_pandas()
    two = pagerank(edges_ds, n_iters=2).to_pandas()
    m2 = capped.merge(two, on="node", suffixes=("_a", "_b"))
    assert len(m2) == len(two) and (m2.rank_r_a == m2.rank_r_b).all()


@pytest.mark.parametrize("parts", [1, 5])
def test_pagerank_matches_numpy(ray_session, parts):
    import ray.data

    from search_engine_ray.pipelines.linkgraph import extract_links, pagerank

    urls, htmls, edges = _graph()
    pages = ray.data.from_arrow(pa.table({
        "url": pa.array(urls), "html": pa.array(htmls, pa.binary())})).repartition(parts)
    pr = pagerank(extract_links(pages), n_iters=3, damping=0.85).to_pandas()

    nodes = sorted({a for a, b in edges} | {b for a, b in edges})
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    out_deg = np.zeros(n)
    for a, _ in edges:
        out_deg[idx[a]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(3):
        dang = r[out_deg == 0].sum()
        share = np.where(out_deg > 0, r / np.maximum(out_deg, 1), 0.0)
        s = np.zeros(n)
        for a, b in edges:
            s[idx[b]] += share[idx[a]]
        r = (1 - 0.85) / n + 0.85 * (s + dang / n)
    exp = {u: round(float(r[i]), 6) for u, i in idx.items()}
    got = dict(zip(pr.node, pr.rank_r))
    assert set(got) == set(exp)
    assert max(abs(got[u] - exp[u]) for u in exp) <= 1e-6


def test_hits_matches_numpy_spec(ray_session):
    import numpy as np
    import ray.data

    from search_engine_ray.pipelines.linkgraph import hits

    # hub page 'h' links to authorities a1, a2; 'x' links to a1 only
    E = [("h", "a1"), ("h", "a2"), ("x", "a1")]
    ds = ray.data.from_items([{"src": s, "dst": d} for s, d in E])
    out = hits(ds, n_iters=3).to_pandas().set_index("node")

    nodes = sorted({n for e in E for n in e})
    ix = {n: i for i, n in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)))
    for s, d in E:
        A[ix[s], ix[d]] = 1.0
    h = np.full(len(nodes), 1.0 / len(nodes))
    for _ in range(3):
        a = A.T @ h
        a /= a.sum()
        h = A @ a
        h /= h.sum()
    for n in nodes:
        assert out.loc[n, "auth_r"] == round(float(a[ix[n]]), 6), n
        assert out.loc[n, "hub_r"] == round(float(h[ix[n]]), 6), n
    # structure: a1 is the top authority, h the top hub
    assert out["auth_r"].idxmax() == "a1"
    assert out["hub_r"].idxmax() == "h"
    assert out.loc["a1", "hub_r"] == 0.0


def test_link_components_small_graph(ray_session):
    import ray.data

    from search_engine_ray.pipelines.linkgraph import link_components

    E = [("b", "a"), ("c", "b"), ("e", "d"), ("f", "f")]
    ds = ray.data.from_items([{"src": s, "dst": d} for s, d in E])
    out = (link_components(ds).to_pandas()
           .set_index("node")["component"].to_dict())
    assert out == {"a": "a", "b": "a", "c": "a",
                   "d": "d", "e": "d", "f": "f"}


def test_reciprocal_link_stats_flags_link_farm(ray_session):
    """A mutual-admiration ring scores reciprocal_frac 1.0; organic
    one-way links score 0; duplicate and self edges don't distort."""
    import ray.data

    from search_engine_ray.pipelines.linkgraph import reciprocal_link_stats

    farm = [(f"https://farm{i}.test/p", f"https://farm{j}.test/p")
            for i in range(3) for j in range(3) if i != j]  # full mutual ring
    organic = [(f"https://org{i}.test/a", "https://hub.test/") for i in range(4)]
    edges = farm + organic + [organic[0]] * 3  # duplicates collapse
    edges += [("https://org0.test/a", "https://org0.test/a")]  # self edge
    ds = ray.data.from_items(
        [{"src": s, "dst": d} for s, d in edges], override_num_blocks=3)
    out = (reciprocal_link_stats(ds).to_pandas()
           .set_index("host").sort_index())
    for i in range(3):
        assert out.loc[f"farm{i}.test", "reciprocal_frac_r"] == 1.0
        assert out.loc[f"farm{i}.test", "n_edges"] == 2
    for i in range(4):
        assert out.loc[f"org{i}.test", "reciprocal_frac_r"] == 0.0
        assert out.loc[f"org{i}.test", "n_edges"] == 1  # dups collapsed


def test_resolve_redirects_chains_and_cycles(ray_session):
    """Chains resolve to their terminal with true hop counts (pointer
    jumping); cycles and self-redirects emit nothing; multi-target
    sources keep the min dst deterministically."""
    import ray.data

    from search_engine_ray.pipelines.linkgraph import resolve_redirects

    edges = [
        ("a", "b"), ("b", "c"), ("c", "d"),          # chain a->b->c->d
        ("e", "f"),                                   # single hop
        ("g", "h"), ("h", "g"),                       # 2-cycle
        ("i", "i"),                                   # self-redirect
        ("j", "k"), ("j", "z"),                       # multi-target: min 'k'
        ("k", "d"),
    ]
    ds = ray.data.from_items([{"src": s, "dst": d} for s, d in edges],
                             override_num_blocks=3)
    out = (resolve_redirects(ds).to_pandas()
           .sort_values("src").reset_index(drop=True))
    got = {r.src: (r.final_url, r.hops) for r in out.itertuples()}
    assert got == {
        "a": ("d", 3), "b": ("d", 2), "c": ("d", 1),
        "e": ("f", 1), "j": ("d", 2), "k": ("d", 1),
    }  # g, h, i produce no rows (no terminal)


def test_resolve_redirects_long_chain_and_cap(ray_session):
    import ray.data

    from search_engine_ray.pipelines.linkgraph import resolve_redirects

    chain = [(f"n{i}", f"n{i+1}") for i in range(20)]
    ds = ray.data.from_items([{"src": s, "dst": d} for s, d in chain],
                             override_num_blocks=4)
    out = resolve_redirects(ds, max_chain=32).to_pandas()
    got = {r.src: (r.final_url, r.hops) for r in out.itertuples()}
    assert got["n0"] == ("n20", 20)
    assert len(got) == 20
    # cap below the chain length: deep sources drop, shallow ones resolve
    capped = resolve_redirects(ds, max_chain=4).to_pandas()
    gc = {r.src: r.hops for r in capped.itertuples()}
    assert "n19" in gc and gc["n19"] == 1
    assert "n0" not in gc  # 20 hops > cap


def test_extract_hreflang_variants(ray_session):
    """Attribute-order / quoting / case variants parse; non-alternate and
    incomplete tags skip; multi-row batches map matches to the right src."""
    import ray.data

    from search_engine_ray.pipelines.linkgraph import extract_hreflang

    pages = ray.data.from_items([
        {"url": "u0", "html":
            b'<link rel="alternate" hreflang="de" href="https://x/de">'
            b'<LINK HREFLANG=FR REL=ALTERNATE HREF=https://x/fr>'},
        {"url": "u1", "html":
            b'<link rel="stylesheet" href="https://x/css">'      # wrong rel
            b'<link rel="alternate" hreflang="en">'},            # no href
        {"url": "u2", "html":
            b"<link href='https://y/en-gb' hreflang='EN-GB' rel='alternate'>"},
    ], override_num_blocks=2)
    out = (extract_hreflang(pages).to_pandas()
           .sort_values(["src", "hreflang"]).reset_index(drop=True))
    got = list(zip(out["src"], out["hreflang"], out["href"]))
    assert got == [("u0", "de", "https://x/de"), ("u0", "fr", "https://x/fr"),
                   ("u2", "en-gb", "https://y/en-gb")]


def test_extract_canonical_first_tag_wins(ray_session):
    import ray.data

    from search_engine_ray.pipelines.linkgraph import extract_canonical_tags

    pages = ray.data.from_items([
        {"url": "u0", "html":
            b'<link rel="canonical" href="https://c/a">'
            b'<link rel="canonical" href="https://c/b">'},  # second ignored
        {"url": "u1", "html": b'<link rel="stylesheet" href="https://c/css">'},
        {"url": "u2", "html": b"<LINK HREF=https://c/x REL=CANONICAL>"},
    ], override_num_blocks=2)
    out = (extract_canonical_tags(pages).to_pandas()
           .sort_values("src").reset_index(drop=True))
    assert list(zip(out["src"], out["canonical"])) == [
        ("u0", "https://c/a"), ("u2", "https://c/x")]
