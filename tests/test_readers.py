"""bz2 + concatenated-JSON reader (sources/readers.py): stream parsing,
reference paragraph joining, malformed-value skipping, and a full
read → build → query pass over generated .bz2 fixtures."""

import bz2
import json
import os

import pytest

from search_engine_ray.sources.readers import (
    article_body,
    parse_article_stream,
    read_wiki_bz2,
)

ARTICLES = [
    {"url": "https://w/a", "id": "1", "title": "A",
     "text": [["Fast table ", "merge engine."], ["Second paragraph here."]]},
    {"url": "https://w/b", "id": "2", "title": "B",
     "text": [["<b>Bold</b> table scan."]]},
    {"url": "https://w/c", "id": "3", "title": "C", "text": []},
]


def _write_fixture(dirpath, name, articles, concat=True, garbage=False):
    sep = "" if concat else "\n"
    blob = sep.join(json.dumps(a) for a in articles)
    if garbage:
        blob = blob[: len(blob) // 2] + "}{not json!" + blob[len(blob) // 2:]
    p = os.path.join(dirpath, name)
    with open(p, "wb") as f:
        f.write(bz2.compress(blob.encode()))
    return p


class TestStreamParsing:
    @pytest.mark.parametrize("concat", [True, False])
    def test_concatenated_and_jsonl(self, concat):
        blob = ("" if concat else "\n").join(json.dumps(a) for a in ARTICLES)
        got = parse_article_stream(blob.encode())
        assert [a["url"] for a in got] == ["https://w/a", "https://w/b", "https://w/c"]

    def test_malformed_values_skipped(self):
        blob = json.dumps(ARTICLES[0]) + "{broken" + json.dumps(ARTICLES[1])
        got = parse_article_stream(blob.encode())
        urls = [a.get("url") for a in got if isinstance(a, dict) and "url" in a]
        assert "https://w/a" in urls and "https://w/b" in urls

    def test_paragraph_joining_matches_reference(self):
        # sentences join with "", paragraphs with \n\n (indexer.rs:59-66)
        assert article_body(ARTICLES[0]) == "Fast table merge engine.\n\nSecond paragraph here."
        assert article_body(ARTICLES[2]) == ""


class TestEndToEnd:
    def test_read_build_query(self, ray_session, tmp_path):
        d = str(tmp_path / "wiki")
        os.makedirs(d)
        _write_fixture(d, "part1.bz2", ARTICLES[:2])
        _write_fixture(d, "part2.bz2", ARTICLES[2:], concat=False)
        pages = read_wiki_bz2(d)
        rows = pages.to_pandas().sort_values("url").reset_index(drop=True)
        assert list(rows["url"]) == ["https://w/a", "https://w/b", "https://w/c"]
        assert rows["html"][1] == b"<b>Bold</b> table scan."

        from search_engine_ray.config import EngineConfig
        from search_engine_ray.pipelines.build import build_index
        from search_engine_ray.query.engine import SearchEngine

        out = str(tmp_path / "idx")
        build_index(pages, out, EngineConfig(min_rows_per_file=None))
        eng = SearchEngine(out, build_bktree=False)
        assert eng.num_docs == 3
        # tag-stripped at extract: "bold" is a term, "<b>" never is
        assert eng.lookup("bold") is not None
        docs = eng.boolean_and("table")
        assert len(docs) == 2


class TestJsonlReader:
    def test_jsonl_and_c4_style_docs(self, ray_session, tmp_path):
        from search_engine_ray.sources.readers import read_wiki_jsonl

        d = str(tmp_path / "jl")
        os.makedirs(d)
        with open(os.path.join(d, "wiki.jsonl"), "w") as f:
            for a in ARTICLES[:2]:
                f.write(json.dumps(a) + "\n")
        with open(os.path.join(d, "c4.jsonl"), "w") as f:
            f.write(json.dumps({"url": "https://c4/x",
                                "text": "plain string body here"}) + "\n")
            f.write("{broken json\n")  # malformed line skipped
            f.write(json.dumps({"url": "https://c4/y", "text": "another doc"}) + "\n")
        rows = read_wiki_jsonl(d).to_pandas().sort_values("url").reset_index(drop=True)
        assert list(rows["url"]) == ["https://c4/x", "https://c4/y",
                                     "https://w/a", "https://w/b"]
        by_url = dict(zip(rows["url"], rows["html"]))
        assert by_url["https://c4/x"] == b"plain string body here"
        assert by_url["https://w/a"] == article_body(ARTICLES[0]).encode()
