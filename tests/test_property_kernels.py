"""Hypothesis property tests: vectorized kernels vs scalar specs over
adversarial inputs (the hand-written cases in test_vb/test_tokenize cover
known edges; these search for unknown ones)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

# deterministic example generation: the suite is a gate (driver runs it
# per round) — a fresh random seed per run would make failures
# unactionable; widen coverage by bumping max_examples instead
settings.register_profile("repo", derandomize=True)
settings.load_profile("repo")

from search_engine_ray.functions.hashing import (
    batch_shingle_hashes,
    batch_token_hashes,
    hash_strings_arrow,
    poly_hash_str,
    shingle_hashes,
)
from search_engine_ray.functions.vb import (
    delta_decode,
    delta_encode,
    encode_ascending,
    decode_ascending,
    vb_decode_array,
    vb_encode,
    vb_encode_array,
)

texts = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=60
)


class TestVBProperties:
    @given(st.lists(st.integers(min_value=0, max_value=2**40), max_size=50))
    @settings(max_examples=200, deadline=None)
    def test_vectorized_encode_matches_scalar(self, vals):
        enc, lens = vb_encode_array(np.array(vals, np.uint64))
        want = b"".join(vb_encode(v) for v in vals)
        assert enc.tobytes() == want
        assert [int(x) for x in lens] == [len(vb_encode(v)) for v in vals]

    @given(st.lists(st.integers(min_value=0, max_value=2**40), max_size=50))
    @settings(max_examples=200, deadline=None)
    def test_roundtrip(self, vals):
        enc, _ = vb_encode_array(np.array(vals, np.uint64))
        got = vb_decode_array(enc)
        assert [int(x) for x in got] == vals

    @given(st.lists(st.integers(min_value=0, max_value=2**31), min_size=1, max_size=40))
    @settings(max_examples=200, deadline=None)
    def test_ascending_roundtrip(self, gaps):
        vals = np.cumsum(np.array(gaps, np.int64))
        assert list(decode_ascending(encode_ascending(vals))) == [int(v) for v in vals]

    @given(st.lists(st.integers(min_value=0, max_value=2**31), min_size=1, max_size=40))
    @settings(max_examples=100, deadline=None)
    def test_delta_spec_roundtrip(self, gaps):
        vals = list(np.cumsum(np.array(gaps, np.int64)))
        assert delta_decode(delta_encode(vals)) == [int(v) for v in vals]


class TestHashProperties:
    @given(st.lists(texts, min_size=1, max_size=20))
    @settings(max_examples=150, deadline=None)
    def test_arrow_hash_matches_scalar(self, strs):
        import pyarrow as pa

        h = hash_strings_arrow(pa.array(strs, pa.string()))
        for i, s in enumerate(strs):
            assert int(h[i]) == poly_hash_str(s), repr(s)

    @given(st.lists(texts, min_size=1, max_size=10), st.integers(1, 4))
    @settings(max_examples=100, deadline=None)
    def test_batch_shingles_match_per_doc(self, docs, k):
        import pyarrow as pa

        from search_engine_ray.pipelines.training_data import _tok_hashes

        offs, th = batch_token_hashes(pa.array(docs, pa.string()))
        sh_off, sh = batch_shingle_hashes(offs, th, k)
        for i, t in enumerate(docs):
            want = shingle_hashes(_tok_hashes(t), k)
            np.testing.assert_array_equal(sh[sh_off[i]:sh_off[i + 1]], want, err_msg=repr(t))


class TestTokenizeProperty:
    @given(st.lists(texts, min_size=1, max_size=8))
    @settings(max_examples=80, deadline=None)
    def test_batch_equals_spec(self, docs):
        import pyarrow as pa

        from search_engine_ray.functions.tokenizer import Tokenizer
        from search_engine_ray.stages.tokenize import tokenize_batch

        tok = Tokenizer()
        batch = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                          "text": pa.array(docs, pa.string())})
        out = tokenize_batch(batch, tok)
        # spec: per-doc postings dict + doc_length
        got = {}
        for row in out.to_pylist():
            if row["term"]:
                got.setdefault(row["doc_id"], {})[row["term"]] = row["tf"]
        for i, t in enumerate(docs):
            postings, _dl = tok.doc_postings(i, t)
            want = {w: len(ps) for w, ps in postings.items()}
            assert got.get(i, {}) == want, repr(t)


class TestQualityBatchTwins:
    @given(st.lists(texts, min_size=1, max_size=12))
    @settings(max_examples=100, deadline=None)
    def test_batch_doc_stats_matches_spec(self, docs):
        import pyarrow as pa

        from search_engine_ray.functions.quality import batch_doc_stats, doc_stats

        s = batch_doc_stats(pa.array(docs, pa.string()))
        for i, t in enumerate(docs):
            want = doc_stats(t)
            for k in want:
                got = s[k][i]
                assert got == pytest.approx(want[k]), (k, repr(t))

    # gopher-shaped text: mixes bullets, ellipses, '#', stopwords, newlines
    gopher_texts = st.lists(
        st.one_of(
            texts,
            st.sampled_from(["- item", "• punkt", "* star", "tail...", "x…",
                             "## h", "the", "be", "to", "of", "and", "that",
                             "have", "with", "  - sp", "...", "\t* t"]),
        ),
        max_size=8,
    ).map(lambda parts: "\n".join(parts))

    @given(st.lists(st.one_of(texts, gopher_texts), min_size=1, max_size=12))
    @settings(max_examples=100, deadline=None)
    def test_batch_gopher_stats_matches_spec(self, docs):
        import pyarrow as pa

        from search_engine_ray.functions.quality import (
            batch_gopher_pass,
            batch_gopher_stats,
            gopher_pass,
            gopher_stats,
        )

        s = batch_gopher_stats(pa.array(docs, pa.string()))
        flags = batch_gopher_pass(s)
        for i, t in enumerate(docs):
            want = gopher_stats(t)
            for k in want:
                assert s[k][i] == pytest.approx(want[k]), (k, repr(t))
            assert bool(flags[i]) == gopher_pass(want), repr(t)

    def test_gopher_pass_accepts_clean_prose(self):
        from search_engine_ray.functions.quality import gopher_pass, gopher_stats

        doc = ("the quick brown fox jumps over that lazy dog with vigor and "
               "grace to be seen of all observers every single day ") * 5
        s = gopher_stats(doc)
        assert s["n_words"] >= 50 and gopher_pass(s)

    @given(st.lists(texts, min_size=1, max_size=12))
    @settings(max_examples=60, deadline=None)
    def test_batch_lang_id_matches_spec(self, docs):
        import pyarrow as pa

        from search_engine_ray.functions.quality import batch_lang_id, lang_id

        langs, confs = batch_lang_id(pa.array(docs, pa.string()))
        for i, t in enumerate(docs):
            wl, wc = lang_id(t)
            assert langs[i] == wl, repr(t)
            assert confs[i] == pytest.approx(wc), repr(t)


class TestPiiRepetitionBatchTwins:
    @given(st.lists(texts, min_size=1, max_size=12))
    @settings(max_examples=100, deadline=None)
    def test_batch_pii_scrub_matches_spec(self, docs):
        import pyarrow as pa

        from search_engine_ray.functions.quality import batch_pii_scrub, pii_scrub

        clean, counts = batch_pii_scrub(pa.array(docs, pa.string()))
        for i, t in enumerate(docs):
            wc, wn = pii_scrub(t)
            assert clean[i].as_py() == wc, repr(t)
            for name in wn:
                assert counts[name][i].as_py() == wn[name], (name, repr(t))

    @given(st.lists(texts, min_size=1, max_size=12))
    @settings(max_examples=100, deadline=None)
    def test_batch_repetition_matches_spec(self, docs):
        import pyarrow as pa

        from search_engine_ray.functions.quality import (
            batch_repetition_stats,
            repetition_stats,
        )

        s = batch_repetition_stats(pa.array(docs, pa.string()))
        for i, t in enumerate(docs):
            want = repetition_stats(t)
            for k in want:
                assert s[k][i] == pytest.approx(want[k]), (k, repr(t))

    # the sf corpora contain no PII / repeated lines, so the driver oracle
    # check is degenerate there; pin DuckDB == scalar spec on crafted docs
    def test_duckdb_oracle_semantics_on_planted_docs(self):
        import duckdb
        import pandas as pd

        from search_engine_ray.functions.quality import pii_scrub, repetition_stats
        from search_engine_ray.pipelines.driver_queries import oracle_queries

        rows = [
            (1, "reach a.b+spam@ex-ample.org or (555) 123 4567 now"),
            (2, "server at 10.0.0.1 and 999.999.999.999 but not 1.2.3.4.5"),
            (3, "dup line\ndup line\nunique\n\ndup line tail"),
            (4, "w x y z q w x y z q w x y z q"),
            (5, ""),
            (6, "+44 800-555-0199 mails c@d.io c@d.io"),
        ]
        docs = pd.DataFrame(rows, columns=["doc_id", "text"])
        con = duckdb.connect()
        con.register("documents", docs)
        oq = oracle_queries()
        pii = con.execute(oq["pii_scrub"]).df().set_index("doc_id")
        rep = con.execute(oq["repetition"]).df().set_index("doc_id")
        for doc_id, text in rows:
            wc, wn = pii_scrub(text)
            assert pii.loc[doc_id, "text_clean"] == wc, (doc_id, text)
            for name, v in wn.items():
                assert pii.loc[doc_id, f"n_{name}"] == v, (doc_id, name)
            for k, v in repetition_stats(text).items():
                assert rep.loc[doc_id, k] == v, (doc_id, k)
        assert int(pii["n_email"].sum()) == 3 and int(pii["n_phone"].sum()) == 2
        assert rep.loc[3, "dup_line_frac"] == 0.5
        assert rep.loc[4, "dup_5gram_frac"] > 0
