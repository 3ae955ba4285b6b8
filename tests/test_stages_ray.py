"""Ray-level stage tests: extract invariant, zip_with_index determinism,
webpages synthesis."""

import numpy as np
import pyarrow as pa
import pytest

from search_engine_ray.functions.textproc import extract_plaintext
from search_engine_ray.sources.webpages import generate_webpages, webpages_from_documents
from search_engine_ray.stages.doc_ids import zip_with_index
from search_engine_ray.stages.extract import extract_batch, extract_stage

SF = "/root/testdata/sf0.001"


class TestExtract:
    def test_batch_matches_python_spec(self):
        htmls = [
            b"<p>hello</p> world",
            b"<a href='x'>link</a> and <b>bold</b>",
            b"no tags at all",
            b"",
            b"<only><tags></only></tags>",
            "uni <i>cöde</i>".encode(),
        ]
        batch = pa.table({"html": pa.array(htmls, pa.binary())})
        out = extract_batch(batch)
        expected = [extract_plaintext(h.decode("utf-8")) for h in htmls]
        assert out["text"].to_pylist() == expected

    def test_stage_byte_identical_on_corpus(self, ray_session):
        # the BASELINE.md per-url invariant: extract(html) == text, byte-identical
        ds = webpages_from_documents(SF)
        out = extract_stage(ds.drop_columns(["text"]), html_col="html")
        got = {r["url"]: r["text"] for r in out.take_all()}
        want = {r["url"]: r["text"] for r in webpages_from_documents(SF).take_all()}
        assert got == want
        assert len(got) == 500


class TestZipWithIndex:
    def test_dense_rank_by_key(self, ray_session):
        import ray.data

        urls = [f"u{i:04d}" for i in range(97)]
        rng = np.random.default_rng(0)
        shuffled = list(rng.permutation(urls))
        ds = ray.data.from_items([{"url": u} for u in shuffled], override_num_blocks=7)
        out = zip_with_index(ds, "url", "doc_id").take_all()
        by_url = {r["url"]: r["doc_id"] for r in out}
        assert by_url == {u: i + 1 for i, u in enumerate(urls)}

    def test_invariant_to_partitioning(self, ray_session):
        import ray.data

        items = [{"url": f"k{i % 13}-{i:05d}"} for i in range(211)]
        a = zip_with_index(ray.data.from_items(items, override_num_blocks=1), "url", "id").take_all()
        b = zip_with_index(ray.data.from_items(items, override_num_blocks=16), "url", "id").take_all()
        assert sorted((r["url"], r["id"]) for r in a) == sorted((r["url"], r["id"]) for r in b)


class TestGenerateWebpages:
    def test_deterministic_across_partitioning(self, ray_session):
        a = generate_webpages(60, vocab_size=100, tokens_per_doc=20, override_num_blocks=2).take_all()
        b = generate_webpages(60, vocab_size=100, tokens_per_doc=20, override_num_blocks=7).take_all()
        key = lambda r: r["url"]
        a, b = sorted(a, key=key), sorted(b, key=key)
        assert [r["text"] for r in a] == [r["text"] for r in b]
        assert all(extract_plaintext(r["html"].decode()) == r["text"] for r in a)

    def test_schema(self, ray_session):
        ds = generate_webpages(10, vocab_size=50, tokens_per_doc=10)
        schema = ds.schema()
        assert schema.names == ["url", "warc_ts", "html", "text", "lang"]
