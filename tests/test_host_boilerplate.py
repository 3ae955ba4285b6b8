"""Host-scoped boilerplate stripping (corpus_clean.host_boilerplate_strip)."""

import numpy as np
import pyarrow as pa
import pytest

from search_engine_ray.pipelines.corpus_clean import host_boilerplate_strip


def _pages(rows):
    import ray.data

    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "url": pa.array([r[1] for r in rows]),
        "text": pa.array([r[2] for r in rows])}))


def _mk_corpus():
    rows = []
    # host A: 5 pages, shared footer on ALL, promo on 2/5 (< 50%)
    for i in range(5):
        body = f"unique content {i}\nmore body {i}"
        extra = "\npromo banner" if i < 2 else ""
        rows.append((i, f"https://a.test/p/{i}",
                     f"{body}{extra}\nfooter a"))
    # host B: 4 pages, its own footer on 3/4 (>= 50%)
    for i in range(4):
        foot = "\nfooter b" if i < 3 else ""
        rows.append((10 + i, f"https://b.test/p/{i}",
                     f"page b {i}{foot}"))
    # host C: 2 pages (< min_pages) sharing a line — must be kept
    rows.append((20, "https://c.test/1", "c line\nshared c"))
    rows.append((21, "https://c.test/2", "other c\nshared c"))
    return rows


def _run(rows, ray_session, **kw):
    out = host_boilerplate_strip(_pages(rows), min_frac=0.5, min_pages=3,
                                 **kw).to_pandas()
    return out.sort_values("doc_id").set_index("doc_id")


@pytest.mark.parametrize("extra", [{}, {"broadcast_cap": 0}])
def test_boilerplate_rules(ray_session, extra):
    rows = _mk_corpus()
    out = _run(rows, ray_session, **extra)
    # host A: footer stripped everywhere (every occurrence), promo kept
    for i in range(5):
        t = out.loc[i, "text_clean"]
        assert "footer a" not in t
        assert f"unique content {i}" in t
        assert out.loc[i, "n_removed"] == 1
    assert "promo banner" in out.loc[0, "text_clean"]
    # host B: footer on 3/4 >= 50% → stripped from all three carriers
    for i in range(3):
        assert "footer b" not in out.loc[10 + i, "text_clean"]
        assert out.loc[10 + i, "n_removed"] == 1
    assert out.loc[13, "n_removed"] == 0
    # host C below min_pages: untouched
    assert out.loc[20, "text_clean"] == "c line\nshared c"
    assert out.loc[21, "n_removed"] == 0


def test_host_scoping_is_independent(ray_session):
    # the same line is boilerplate on host A (3/3 pages) but organic on
    # host B (1/3 pages) — verdicts must not leak across hosts
    rows = []
    for i in range(3):
        rows.append((i, f"https://a.test/{i}", f"body a {i}\ncommon line"))
    rows.append((10, "https://b.test/0", "body b 0\ncommon line"))
    rows.append((11, "https://b.test/1", "body b 1"))
    rows.append((12, "https://b.test/2", "body b 2"))
    out = _run(rows, ray_session)
    for i in range(3):
        assert "common line" not in out.loc[i, "text_clean"]
    assert "common line" in out.loc[10, "text_clean"]


def test_clean_corpus_untouched_roundtrip(ray_session):
    rows = [(i, f"https://h{i}.test/x", f"totally unique {i}\nalso unique {i}")
            for i in range(6)]
    out = _run(rows, ray_session)
    for i in range(6):
        assert out.loc[i, "n_removed"] == 0
        assert out.loc[i, "text_clean"] == f"totally unique {i}\nalso unique {i}"
