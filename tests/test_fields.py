"""bm25f_topk: degenerate-weight equivalence with single-field BM25, and
field-weight sensitivity, over two small aligned indexes."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def field_engines(ray_session, tmp_path_factory):
    import ray.data

    from search_engine_ray.functions.textproc import synthesize_html
    from search_engine_ray.pipelines.build import build_index
    from search_engine_ray.query.engine import SearchEngine

    texts = [
        "alpha beta gamma delta common words here",
        "beta beta beta filler filler filler filler",
        "unrelated content entirely different tokens",
        "alpha mention once in a long body of filler words",
    ] * 3
    titles = ["alpha news", "other title", "alpha alpha", "plain"] * 3
    urls = [f"https://p{i:04d}.test/" for i in range(len(texts))]

    root = tmp_path_factory.mktemp("bm25f")
    engines = {}
    for field, field_texts in (("text", texts), ("title", titles)):
        tbl = pa.table({
            "url": pa.array(urls),
            "warc_ts": pa.array(np.arange(len(urls), dtype="int64"),
                                pa.timestamp("us")),
            "html": pa.array([synthesize_html(t).encode() for t in field_texts],
                             pa.binary()),
            "text": pa.array(field_texts),
            "lang": pa.array(["en"] * len(urls)),
        })
        out = str(root / field)
        build_index(ray.data.from_arrow(tbl), out)
        engines[field] = SearchEngine(out)
    return engines


def test_degenerate_weights_equal_single_field(field_engines):
    from search_engine_ray.query.fields import bm25f_topk

    for field in ("text", "title"):
        w = {"text": 0.0, "title": 0.0, field: 1.0}
        got = bm25f_topk(field_engines, w, "alpha beta", k=10)
        exp = field_engines[field].bm25_topk("alpha beta", k=10)
        assert got == exp, field


def test_field_weights_shift_ranking(field_engines):
    from search_engine_ray.query.fields import bm25f_topk

    body_only = bm25f_topk(field_engines, {"text": 1.0}, "alpha", k=3)
    title_heavy = bm25f_topk(field_engines, {"text": 1.0, "title": 10.0},
                             "alpha", k=3)
    # doc 2 ("alpha alpha" title, no body alpha) must surface under title
    # weighting and be absent from body-only scoring
    body_ids = {d for d, _ in body_only}
    title_ids = {d for d, _ in title_heavy}
    assert title_ids != body_ids
    # additivity: combined score of the top title-heavy doc equals
    # 1*body + 10*title scores for that doc
    top_doc, top_score = title_heavy[0]
    parts = 0.0
    for field, w in (("text", 1.0), ("title", 10.0)):
        for d, s in field_engines[field].bm25_topk("alpha", k=1000):
            if d == top_doc:
                parts += w * s
    assert abs(parts - top_score) < 1e-9


def test_mismatched_doc_space_rejected(field_engines, ray_session, tmp_path_factory):
    import ray.data

    from search_engine_ray.functions.textproc import synthesize_html
    from search_engine_ray.pipelines.build import build_index
    from search_engine_ray.query.engine import SearchEngine
    from search_engine_ray.query.fields import bm25f_topk

    tbl = pa.table({
        "url": pa.array(["https://only-one.test/"]),
        "warc_ts": pa.array(np.array([0], "int64"), pa.timestamp("us")),
        "html": pa.array([synthesize_html("alpha").encode()], pa.binary()),
        "text": pa.array(["alpha"]),
        "lang": pa.array(["en"]),
    })
    out = str(tmp_path_factory.mktemp("bm25f_bad") / "idx")
    build_index(ray.data.from_arrow(tbl), out)
    bad = {"text": field_engines["text"], "title": SearchEngine(out)}
    with pytest.raises(ValueError, match="doc spaces"):
        bm25f_topk(bad, {"text": 1.0, "title": 1.0}, "alpha")
