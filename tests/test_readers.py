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


def _warc_record(rtype: str, uri: str | None, body: bytes,
                 date: str = "2023-05-01T12:00:00Z",
                 http: bool = True) -> bytes:
    payload = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
               if http else body)
    hdrs = [b"WARC/1.0", b"WARC-Type: " + rtype.encode()]
    if uri:
        hdrs.append(b"WARC-Target-URI: " + uri.encode())
    hdrs.append(b"WARC-Date: " + date.encode())
    hdrs.append(b"Content-Length: " + str(len(payload)).encode())
    return b"\r\n".join(hdrs) + b"\r\n\r\n" + payload + b"\r\n\r\n"


class TestWarcReader:
    def test_plain_and_gzip_members(self, ray_session, tmp_path):
        import gzip

        from search_engine_ray.sources.readers import read_warc

        recs = [
            _warc_record("request", "https://w/a", b"GET / HTTP/1.1"),
            _warc_record("response", "https://w/a", b"<html>alpha page</html>"),
            _warc_record("response", "https://w/b", b"<html>beta page</html>",
                         date="2024-01-02T03:04:05Z"),
            _warc_record("metadata", "https://w/a", b"meta"),
        ]
        (tmp_path / "plain.warc").write_bytes(b"".join(recs))
        # Common-Crawl layout: one gzip MEMBER per record, concatenated
        gz = b"".join(gzip.compress(r) for r in [
            _warc_record("response", "https://w/c", b"<html>gamma</html>")])
        gz += b"\x1f\x8btruncated-garbage"  # corrupt tail member skipped
        (tmp_path / "cc.warc.gz").write_bytes(gz)

        rows = (read_warc(str(tmp_path)).to_pandas()
                .sort_values("url").reset_index(drop=True))
        assert rows["url"].tolist() == ["https://w/a", "https://w/b",
                                        "https://w/c"]
        assert rows["html"].tolist() == [b"<html>alpha page</html>",
                                         b"<html>beta page</html>",
                                         b"<html>gamma</html>"]
        # WARC-Date parsed into warc_ts (2024 > 2023)
        assert rows["warc_ts"][1] > rows["warc_ts"][0]

    def test_malformed_framing_skips_rest(self, tmp_path):
        from search_engine_ray.sources.readers import parse_warc_records

        ok = _warc_record("response", "https://w/x", b"body")
        bad = b"WARC/1.0\r\nContent-Length: notanumber\r\n\r\nxx"
        recs = parse_warc_records(ok + bad + ok)
        assert len(recs) == 1  # framing lost after the malformed record

    def test_warc_build_query(self, ray_session, tmp_path):
        from search_engine_ray.config import EngineConfig
        from search_engine_ray.pipelines.build import build_index
        from search_engine_ray.query.engine import SearchEngine
        from search_engine_ray.sources.readers import read_warc

        recs = [_warc_record("response", f"https://w/{i:03d}",
                             f"<p>zebra document number {i}</p>".encode())
                for i in range(12)]
        (tmp_path / "c.warc").write_bytes(b"".join(recs))
        out = str(tmp_path / "idx")
        build_index(read_warc(str(tmp_path)), out, EngineConfig())
        eng = SearchEngine(out)
        assert len(eng.boolean_and("zebra")) == 12


class TestCsvReader:
    def test_csv_to_webpages_and_build(self, ray_session, tmp_path):
        from search_engine_ray.config import EngineConfig
        from search_engine_ray.pipelines.build import build_index
        from search_engine_ray.query.engine import SearchEngine
        from search_engine_ray.sources.readers import read_webpages_csv

        (tmp_path / "a.csv").write_text(
            "url,text,lang\n"
            "https://c/1,quokka first document,en\n"
            "https://c/2,quokka second document,de\n"
            ",dropped row no url,en\n")
        ds = read_webpages_csv(str(tmp_path / "a.csv"))
        rows = ds.to_pandas().sort_values("url").reset_index(drop=True)
        assert rows["url"].tolist() == ["https://c/1", "https://c/2"]
        assert rows["lang"].tolist() == ["en", "de"]
        out = str(tmp_path / "idx")
        build_index(read_webpages_csv(str(tmp_path / "a.csv")), out,
                    EngineConfig())
        eng = SearchEngine(out)
        assert len(eng.boolean_and("quokka")) == 2
