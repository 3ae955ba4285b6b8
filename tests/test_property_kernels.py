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
