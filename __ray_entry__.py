"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship pipeline (full inverted-index build over
webpages synthesized from sf0.001 + BM25 retrieval); ``queries()`` exposes
one callable per implemented operator from SURVEY.md §2 (and the
training-data operators); ``oracle_sql()`` gives the DuckDB-equivalent SQL
for every SQL-expressible query (same column names — the driver hash-compares
values after sorting columns by name).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship: build the full index on sf0.001 (extract → doc ids →
    tokenize actor pool → groupby(term, salt) merge → chunked VB postings +
    dictionary) and serve BM25 top-k for a set of queries."""
    import pandas as pd

    from search_engine_ray.pipelines.driver_queries import engine_for

    eng = engine_for("/root/testdata/sf0.001")
    rows = []
    for q in ["fast table merge", "spark query", "slow scan", "window group sort"]:
        for rank, (doc_id, score) in enumerate(eng.bm25_topk(q, 10), start=1):
            rows.append({"query": q, "rank": rank, "doc_id": doc_id, "score": score})
    return pd.DataFrame(rows, columns=["query", "rank", "doc_id", "score"])


def queries() -> dict[str, Callable[[str], Any]]:
    from search_engine_ray.pipelines.driver_queries import RAY_QUERIES

    return dict(RAY_QUERIES)


def oracle_sql() -> dict[str, str]:
    from search_engine_ray.pipelines.driver_queries import oracle_queries

    return oracle_queries()
