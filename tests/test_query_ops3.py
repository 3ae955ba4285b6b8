"""Wildcard (k-gram), AND-NOT, and Dirichlet-QL query operators."""

import re

import numpy as np
import pytest

from search_engine_ray.config import EngineConfig
from search_engine_ray.functions.textproc import synthesize_html
from search_engine_ray.pipelines.build import build_index
from search_engine_ray.query.engine import SearchEngine
from search_engine_ray.query.kgram import KGramIndex, pattern_grams, wildcard_regex
from search_engine_ray.sources.webpages import _url_for

TEXTS = [
    "stream sort scan small table",
    "fast table merge join",
    "fast table group order",
    "slow scan filter merge",
    "stream stream fast key value",
    "order order order by key",
    "window agg over stream",
    "fast query fast plan",
]


@pytest.fixture(scope="module")
def eng(tmp_path_factory, ray_session):
    import ray.data

    out = str(tmp_path_factory.mktemp("kgram_index"))
    rows = [
        {"url": _url_for(i), "html": synthesize_html(t).encode()}
        for i, t in enumerate(TEXTS)
    ]
    ds = ray.data.from_items(rows, override_num_blocks=3)
    build_index(ds, out, EngineConfig(chunk_size=4, tokenize_batch_size=3))
    return SearchEngine(out)


VOCAB = sorted({w for t in TEXTS for w in t.split()})


class TestKGram:
    @pytest.mark.parametrize(
        "pattern",
        ["s*", "*er", "f*t", "*a*", "stream", "zz*", "*", "s*m", "o*r*r"],
    )
    def test_matches_bruteforce_regex(self, pattern):
        idx = KGramIndex(VOCAB)
        rx = wildcard_regex(pattern)
        assert idx.lookup(pattern) == [t for t in VOCAB if rx.match(t)]

    def test_pattern_grams_bounded(self):
        assert pattern_grams("s*", 2) == ["^s"]
        assert pattern_grams("*er", 2) == ["er", "r$"]
        assert pattern_grams("f*t", 2) == ["^f", "t$"]
        assert pattern_grams("*", 2) == []

    def test_postfilter_kills_gram_false_positives(self):
        # "red*" grams {^r, re, ed} all occur in "retired" non-contiguously
        idx = KGramIndex(["retired"])
        assert idx.lookup("red*") == []

    def test_requires_sorted_terms(self):
        with pytest.raises(ValueError):
            KGramIndex(["b", "a"])


class TestEngineWildcard:
    def test_wildcard_terms(self, eng):
        got = eng.wildcard_terms("s*")
        assert got == sorted(t for t in VOCAB if t.startswith("s"))

    def test_wildcard_boolean_is_or_over_matches(self, eng):
        docs = eng.wildcard_boolean("*er")
        manual = sorted(
            i + 1
            for i, t in enumerate(TEXTS)
            if any(w.endswith("er") for w in t.split())
        )
        assert docs.tolist() == manual

    def test_no_match(self, eng):
        assert eng.wildcard_terms("zz*") == []
        assert eng.wildcard_boolean("zz*").tolist() == []


class TestAndNot:
    def test_excludes_negated(self, eng):
        pos = set(eng.boolean_and("fast table").tolist())
        out = eng.boolean_and_not("fast table", "merge")
        neg = set(eng.boolean_or("merge").tolist())
        assert set(out.tolist()) == pos - neg
        assert len(pos - neg) < len(pos)  # fixture exercises a real subtraction

    def test_unknown_negation_excludes_nothing(self, eng):
        assert (
            eng.boolean_and_not("fast table", "nosuchterm").tolist()
            == eng.boolean_and("fast table").tolist()
        )

    def test_empty_positive(self, eng):
        assert eng.boolean_and_not("nosuchterm", "fast").tolist() == []


class TestQL:
    def _oracle(self, eng, terms, mu):
        """Brute-force QL over all candidate docs, straight from TEXTS."""
        toks = [t.split() for t in TEXTS]
        T = sum(len(ws) for ws in toks)
        ctf = {t: sum(ws.count(t) for ws in toks) for t in terms}
        terms = [t for t in terms if ctf[t] > 0]
        cand = [i + 1 for i, ws in enumerate(toks) if any(t in ws for t in terms)]
        out = {}
        for d in cand:
            ws = toks[d - 1]
            out[d] = sum(
                np.log((ws.count(t) + mu * ctf[t] / T) / (len(ws) + mu))
                for t in terms
            )
        return out

    @pytest.mark.parametrize("mu", [10.0, 2000.0])
    def test_matches_bruteforce(self, eng, mu):
        got = eng.ql_topk("fast stream", k=100, mu=mu)
        want = self._oracle(eng, ["fast", "stream"], mu)
        assert {d: pytest.approx(s) for d, s in got} == {
            d: pytest.approx(s) for d, s in want.items()
        }
        # contract: score desc, doc asc
        keys = [(-round(s, 12), d) for d, s in got]
        assert keys == sorted(keys)

    def test_unknown_terms_skipped(self, eng):
        assert eng.ql_topk("nosuchterm", k=5) == []
        a = eng.ql_topk("fast nosuchterm", k=5)
        b = eng.ql_topk("fast", k=5)
        assert a == b


class TestSearchDSL:
    def test_parse_buckets(self):
        from search_engine_ray.query.parser import parse_query

        pq_ = parse_query('fast +table -merge "fast table" s* ~tabel',
                          lambda w: w.lower())
        assert pq_.should == ["fast"]
        assert pq_.must == ["table"]
        assert pq_.must_not == ["merge"]
        assert pq_.phrases == ["fast table"]
        assert pq_.wildcards == ["s*"]
        assert pq_.fuzzy == ["tabel"]
        assert parse_query("", lambda w: w).should == []
        # dropped tokens: lone operators, normalize-to-empty
        pq_ = parse_query("+ - ~ fast", lambda w: "" if w == "fast" else w)
        assert (pq_.should, pq_.must, pq_.must_not) == ([], [], [])

    def test_bare_words_match_bm25(self, eng):
        got = eng.search("fast stream", k=100)
        want = eng.bm25_topk("fast stream", k=100)
        assert got == want

    def test_must_filters_and_scores(self, eng):
        got = eng.search("fast +table", k=100)
        cand = set(eng.boolean_and("table").tolist())
        assert {d for d, _ in got} == {
            d for d, _ in eng.bm25_topk("fast table", k=100)} & cand
        # scores equal the bm25 restriction
        full = dict(eng.bm25_topk("fast table", k=100))
        for d, s in got:
            assert s == pytest.approx(full[d], abs=0)

    def test_must_not_subtracts(self, eng):
        got = {d for d, _ in eng.search("+fast -merge", k=100)}
        assert got == set(eng.boolean_and_not("fast", "merge").tolist())

    def test_phrase_only_zero_scores_id_order(self, eng):
        got = eng.search('"fast table"', k=100)
        assert [d for d, _ in got] == sorted(eng.phrase("fast table").tolist())
        assert all(s == 0.0 for _, s in got)

    def test_wildcard_expansion(self, eng):
        got = {d for d, _ in eng.search("s*", k=100)}
        assert got == set(eng.wildcard_boolean("s*").tolist())

    def test_fuzzy_expansion(self, eng):
        # "tble" → "table" is one insertion (a transposition would be 2)
        got = {d for d, _ in eng.search("~tble", k=100)}
        assert got == set(eng.boolean_or("table").tolist())

    def test_unknown_must_term_empty(self, eng):
        assert eng.search("fast +nosuchterm") == []
        assert eng.search("nosuchterm") == []
