"""Blocked string dictionary (J2): reference test cases mirrored
(string_in_memory_dict.rs:177-462 — block boundaries, binary-search paths,
unicode, case sensitivity) + engine integration."""

import numpy as np
import pytest

from search_engine_ray.query.string_dict import BlockedStringDict


def make(terms, block_size=4):
    return BlockedStringDict(terms, list(range(1, len(terms) + 1)),
                             [10 * (i + 1) for i in range(len(terms))], block_size)


class TestBlockedStringDict:
    def test_basic_lookup(self):
        d = make(["apple", "banana", "cherry"])
        assert d.lookup("apple") == 0
        assert d.lookup("banana") == 1
        assert d.lookup("cherry") == 2
        assert d.lookup("missing") == -1
        assert d.get_meta("banana") == (2, 20)
        assert d.get_meta("zzz") is None

    def test_block_boundaries(self):
        # exactly at block edges: sizes 4,8 with block_size 4
        terms = [f"t{i:03d}" for i in range(13)]
        d = make(terms, block_size=4)
        for i, t in enumerate(terms):
            assert d.lookup(t) == i, t
        assert d.lookup("t999") == -1
        assert d.lookup("a") == -1  # before the first head

    def test_case_sensitive_byte_order(self):
        # "Banana" < "Zebra" < "apple" (dictionary/mod.rs:193-203)
        terms = ["Banana", "Zebra", "apple"]
        d = make(terms, block_size=2)
        assert [d.lookup(t) for t in terms] == [0, 1, 2]
        assert d.lookup("banana") == -1

    def test_unicode_terms(self):
        terms = sorted(["café", "naïve", "zürich", "łódź", "日本語"], key=lambda s: s.encode())
        d = make(terms, block_size=2)
        for i, t in enumerate(terms):
            assert d.lookup(t) == i

    def test_long_terms_vb_length(self):
        # >255-byte terms (the reference's u8 length would overflow)
        terms = sorted(["a" * 300, "b" * 1000, "short"])
        d = make(terms, block_size=2)
        for i, t in enumerate(terms):
            assert d.lookup(t) == i

    def test_term_at_and_iter(self):
        terms = [f"w{i:02d}" for i in range(10)]
        d = make(terms, block_size=3)
        assert [d.term_at(i) for i in range(10)] == terms
        assert list(d) == terms

    def test_rejects_unsorted(self):
        with pytest.raises(ValueError):
            make(["b", "a"])

    def test_memory_much_smaller_than_dict(self):
        import sys

        terms = sorted(f"term{i:06d}" for i in range(20_000))
        d = make(terms, block_size=16)
        py = {t: (i, i) for i, t in enumerate(terms)}
        py_bytes = sys.getsizeof(py) + sum(sys.getsizeof(t) for t in terms)
        assert d.nbytes() < py_bytes / 2


def test_engine_front_coded_mode(ray_session, tmp_path):
    import ray.data

    from search_engine_ray.config import EngineConfig
    from search_engine_ray.functions.textproc import synthesize_html
    from search_engine_ray.pipelines.build import build_index
    from search_engine_ray.query.engine import SearchEngine
    from search_engine_ray.sources.webpages import _url_for

    texts = [f"alpha beta doc{i} gamma" for i in range(40)]
    rows = [{"url": _url_for(i), "html": synthesize_html(t).encode()} for i, t in enumerate(texts)]
    out = str(tmp_path / "idx")
    build_index(ray.data.from_items(rows), out, EngineConfig())

    hash_eng = SearchEngine(out, EngineConfig(dict_repr="hash"))
    fc_eng = SearchEngine(out, EngineConfig(dict_repr="front_coded"))
    assert fc_eng.num_terms == hash_eng.num_terms
    for t in ["alpha", "beta", "doc7", "gamma", "missing"]:
        assert fc_eng.lookup(t) == hash_eng.lookup(t)
    q = "alpha gamma"
    assert fc_eng.bm25_topk(q, 5) == hash_eng.bm25_topk(q, 5)
    assert fc_eng.bm25_topk_wand(q, 5) == hash_eng.bm25_topk_wand(q, 5)
    # prefix range scan: both representations, vs a brute-force spec
    import pyarrow.parquet as pqt

    dic = pqt.read_table(fc_eng.paths.dictionary, columns=["term", "df"]).to_pandas()
    for pref in ["doc", "doc1", "a", "zzz", "DOC"]:
        want = sorted(((t, int(d)) for t, d in zip(dic.term, dic.df)
                       if t.startswith(pref.lower())),
                      key=lambda e: (-e[1], e[0]))[:7]
        assert fc_eng.prefix_search(pref, 7) == want, pref
        assert hash_eng.prefix_search(pref, 7) == want, pref
    assert fc_eng.prefix_search("", 5) == []


class TestLowerBound:
    def test_lower_bound_positions(self):
        terms = [f"t{i:03d}" for i in range(13)]
        d = make(terms, block_size=4)
        assert d.lower_bound("a") == 0           # before everything
        assert d.lower_bound("t000") == 0        # exact first
        assert d.lower_bound("t0005") == 1       # between entries
        assert d.lower_bound("t004") == 4        # exact block head
        assert d.lower_bound("t0035") == 4       # just before a head
        assert d.lower_bound("t012") == 12       # exact last
        assert d.lower_bound("zzz") == 13        # past the end
