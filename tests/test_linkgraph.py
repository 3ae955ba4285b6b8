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
