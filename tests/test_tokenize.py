"""Tokenizer spec tests + vectorized-batch ≡ pure-Python spec."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_ray.functions.tokenizer import Tokenizer
from search_engine_ray.stages.tokenize import tokenize_batch


def tok():
    return Tokenizer()


class TestTokenizerSpec:
    def test_positions_start_at_zero(self):
        t = tok().tokenize("hello world")
        assert [(x.position, x.word) for x in t] == [(0, "hello"), (1, "world")]

    def test_empty_cleaned_consumes_position(self):
        # tokenizer.rs:219-221 — ",,," consumes position 1 but emits nothing
        t = tok().tokenize("word1 ,,, !!! word2")
        assert [(x.position, x.word) for x in t] == [(0, "word1"), (3, "word2")]

    def test_lemmatization(self):
        t = tok().tokenize("was running children misses")
        assert [x.word for x in t] == ["be", "run", "child", "misses"]

    def test_case_and_punct(self):
        t = tok().tokenize("(Hello), WORLD!")
        assert [x.word for x in t] == ["hello", "world"]

    def test_whitespace_only(self):
        assert tok().tokenize("   \t\n ") == []
        assert tok().tokenize("") == []

    def test_query_bigrams(self):
        uni, bi = tok().tokenize_query("quick brown fox")
        assert [(x.position, x.word) for x in uni] == [(0, "quick"), (1, "brown"), (2, "fox")]
        assert [(x.position, x.word) for x in bi] == [(0, "quick brown"), (1, "brown fox")]

    def test_query_bigrams_skip_empty(self):
        # empty-cleaned word breaks nothing: bigram spans the gap, position = cur-1
        uni, bi = tok().tokenize_query("a ,,, b")
        assert [(x.position, x.word) for x in uni] == [(0, "a"), (2, "b")]
        assert [(x.position, x.word) for x in bi] == [(1, "a b")]

    def test_query_lemmatized_bigram(self):
        uni, bi = tok().tokenize_query("was jogging")
        assert [x.word for x in bi] == ["be jogging"]

    def test_doc_postings(self):
        postings, doc_len = tok().doc_postings(7, "the cat the hat")
        assert doc_len == 4
        assert postings["the"] == [0, 2]
        assert postings["cat"] == [1]
        assert postings["hat"] == [3]


def _batch(texts, ids=None):
    ids = ids if ids is not None else list(range(1, len(texts) + 1))
    return pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.string())})


def _expected_rows(texts, ids):
    t = tok()
    rows = set()
    for doc_id, text in zip(ids, texts):
        postings, doc_len = t.doc_postings(doc_id, text or "")
        if not postings:
            rows.add(("", doc_id, (), 0, 0))
        for term, positions in postings.items():
            rows.add((term, doc_id, tuple(positions), len(positions), doc_len))
    return rows


def _actual_rows(table):
    from search_engine_ray.functions.vb import decode_ascending

    out = set()
    for r in table.to_pylist():
        positions = tuple(decode_ascending(r["pos_enc"]).tolist())
        out.add((r["term"], r["doc_id"], positions, r["tf"], r["doc_length"]))
    return out


class TestTokenizeBatch:
    def test_matches_spec_basic(self):
        texts = [
            "the cat the hat",
            "word1 ,,, !!! word2",
            "",
            "   ",
            "(Hello), WORLD! hello",
            "was running children are",
        ]
        ids = [3, 1, 9, 4, 5, 6]
        out = tokenize_batch(_batch(texts, ids), tok())
        assert _actual_rows(out) == _expected_rows(texts, ids)

    def test_sentinel_rows(self):
        out = tokenize_batch(_batch(["", "a b", ",,,"], [1, 2, 3]), tok())
        rows = _actual_rows(out)
        assert ("", 1, (), 0, 0) in rows
        assert ("", 3, (), 0, 0) in rows  # cleaned-empty only → zero tokens
        assert not any(r[0] == "" and r[1] == 2 for r in rows)

    def test_positions_sorted_per_posting(self):
        from search_engine_ray.functions.vb import decode_ascending

        out = tokenize_batch(_batch(["b a b a b"]), tok())
        d = {r["term"]: decode_ascending(r["pos_enc"]).tolist() for r in out.to_pylist()}
        assert d["b"] == [0, 2, 4]
        assert d["a"] == [1, 3]

    def test_none_text(self):
        table = pa.table({"doc_id": pa.array([1], pa.int64()), "text": pa.array([None], pa.string())})
        out = tokenize_batch(table, tok())
        assert _actual_rows(out) == {("", 1, (), 0, 0)}

    @given(
        st.lists(
            st.text(alphabet="abs A.!,\t\ncé0w", max_size=40),
            min_size=1,
            max_size=20,
        )
    )
    @settings(max_examples=40, deadline=None)
    def test_property_matches_spec(self, texts):
        ids = list(range(1, len(texts) + 1))
        out = tokenize_batch(_batch(texts, ids), tok())
        assert _actual_rows(out) == _expected_rows(texts, ids)
