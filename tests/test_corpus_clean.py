"""Composite corpus-cleaning pipeline (pipelines/corpus_clean.py)."""

import glob
import os

import numpy as np
import pytest

from search_engine_ray.pipelines.corpus_clean import (
    clean_corpus,
    exact_dup_drop_ids,
    write_clean_corpus,
)

GOOD = ("the quick brown fox jumps over the lazy dog and then the dog sleeps "
        "while the fox runs through the green forest near the old mill")


@pytest.fixture(scope="module")
def corpus(ray_session):
    import ray.data

    rows = [
        {"doc_id": 1, "text": GOOD, "lang": "en"},
        {"doc_id": 2, "text": GOOD, "lang": "en"},            # exact dup of 1
        {"doc_id": 3, "text": GOOD + " extra tail words here", "lang": "en"},  # near dup
        {"doc_id": 4, "text": "too short", "lang": "en"},
        {"doc_id": 5, "text": "der hund und die katze sind im garten mit der maus heute wieder da", "lang": "de"},
        {"doc_id": 6, "text": " ".join(["1234"] * 40), "lang": "en"},  # all-digit → alpha 0
        {"doc_id": 7, "text": " ".join(["the"] * 40), "lang": "en"},   # stopwords 1.0
        {"doc_id": 8, "text": "completely different unique content about rust compilers "
                              "and incremental builds shipping fast binaries today", "lang": "en"},
    ]
    return ray.data.from_items(rows, override_num_blocks=3).materialize()


class TestCleanCorpus:
    def test_filters_compose(self, corpus):
        out = clean_corpus(corpus, lang_from_col="lang").to_pandas()
        kept = set(out["doc_id"])
        assert 1 in kept          # keeper of the exact-dup group
        assert 2 not in kept      # exact dup dropped
        assert 3 in kept          # near dup kept without near_dup=True
        assert 4 not in kept      # too short
        assert 5 not in kept      # wrong lang
        assert 6 not in kept      # alpha ratio 0
        assert 7 not in kept      # stopword ratio 1.0
        assert 8 in kept

    def test_near_dup_mode_drops_cluster_members(self, corpus):
        out = clean_corpus(corpus, lang_from_col="lang", near_dup=True,
                           ).to_pandas()
        kept = set(out["doc_id"])
        assert 1 in kept
        assert 3 not in kept      # near-dup cluster member of 1 now dropped
        assert 8 in kept

    def test_broadcast_is_drop_list_sized(self, corpus, ray_session):
        """The broadcast payload is O(duplicates), NOT O(distinct texts):
        its length equals exactly the number of non-minimal duplicate
        members (round-2 VERDICT #3 done-criterion)."""
        import ray.data

        drops = exact_dup_drop_ids(corpus).to_pandas()
        # corpus plants exactly ONE exact duplicate (doc 2 of doc 1)
        assert sorted(drops["drop_id"].tolist()) == [2]

        # many distinct docs, few dups: drop list stays at dup count
        rows = [{"doc_id": i, "text": f"unique document number {i} with words"}
                for i in range(200)]
        rows += [{"doc_id": 1000 + i, "text": f"unique document number {i} with words"}
                 for i in range(5)]  # 5 dups of the first 5
        ds = ray.data.from_items(rows, override_num_blocks=4)
        drops = exact_dup_drop_ids(ds).to_pandas()
        assert sorted(drops["drop_id"].tolist()) == [1000, 1001, 1002, 1003, 1004]

    def test_partitioned_write(self, corpus, tmp_path):
        out_dir = str(tmp_path / "clean")
        write_clean_corpus(corpus, out_dir, langs=("en", "de"), lang_from_col="lang")
        parts = glob.glob(os.path.join(out_dir, "lang_pred=*"))
        assert {os.path.basename(p) for p in parts} == {"lang_pred=en", "lang_pred=de"}


class TestNewVsSnapshot:
    def test_anti_join_on_text_hash(self, ray_session):
        """New rows whose text appears anywhere in the snapshot are
        suppressed; unseen rows (incl. new-internal duplicates) pass."""
        import ray.data

        from search_engine_ray.pipelines.corpus_clean import new_vs_snapshot

        snap = ray.data.from_items(
            [{"doc_id": i, "text": f"snapshot page {i}"} for i in range(50)],
            override_num_blocks=3,
        )
        new_rows = (
            # 10 re-crawls of snapshot pages → suppressed
            [{"doc_id": 1000 + i, "text": f"snapshot page {i}"} for i in range(10)]
            # 5 genuinely new pages
            + [{"doc_id": 2000 + i, "text": f"fresh page {i}"} for i in range(5)]
            # a new-internal duplicate pair → BOTH pass (exact-dedup's job)
            + [{"doc_id": 3000, "text": "twin page"},
               {"doc_id": 3001, "text": "twin page"}]
        )
        new = ray.data.from_items(new_rows, override_num_blocks=4)
        out = new_vs_snapshot(new, snap).to_pandas()
        assert sorted(out["doc_id"].tolist()) == (
            [2000 + i for i in range(5)] + [3000, 3001]
        )

    def test_empty_new_side(self, ray_session):
        import ray.data

        from search_engine_ray.pipelines.corpus_clean import new_vs_snapshot

        snap = ray.data.from_items(
            [{"doc_id": i, "text": f"p{i}"} for i in range(10)])
        new = ray.data.from_items(
            [{"doc_id": 100 + i, "text": f"p{i}"} for i in range(10)])
        out = new_vs_snapshot(new, snap).to_pandas()
        assert len(out) == 0


class TestNewVsSnapshotBloom:
    def test_no_false_negatives_and_bounded_fps(self, ray_session):
        """Every true duplicate is suppressed (Bloom has no misses); at
        10+ bits/key the definitely-new set loses <5% to false positives;
        the result is a subset of the exact anti-join's."""
        import ray.data

        from search_engine_ray.pipelines.corpus_clean import (
            new_vs_snapshot,
            new_vs_snapshot_bloom,
        )

        snap = ray.data.from_items(
            [{"doc_id": i, "text": f"snapshot page {i}"} for i in range(2000)],
            override_num_blocks=5,
        )
        new_rows = (
            [{"doc_id": 10_000 + i, "text": f"snapshot page {i}"} for i in range(300)]
            + [{"doc_id": 20_000 + i, "text": f"fresh page {i}"} for i in range(700)]
        )
        new = ray.data.from_items(new_rows, override_num_blocks=4)
        kw = dict(n_bits=1 << 16, k=4)  # 65536 bits / 2000 keys ≈ 32 b/key
        got = set(new_vs_snapshot_bloom(new, snap, **kw).to_pandas()["doc_id"])
        exact = set(new_vs_snapshot(new, snap).to_pandas()["doc_id"])
        truly_new = {20_000 + i for i in range(700)}
        assert exact == truly_new
        assert got <= exact                      # no false negatives ever
        assert len(got) >= 0.95 * len(exact)     # FP loss bounded
        # partition invariance: the sketch + probe are layout-independent
        got2 = set(new_vs_snapshot_bloom(new.repartition(11),
                                         snap.repartition(7), **kw)
                   .to_pandas()["doc_id"])
        assert got2 == got

    def test_bitmap_build_matches_direct_or(self, ray_session):
        """The distributed two-wave pack (distinct bits → summed 32-bit
        halves) equals a direct single-process bitmap OR."""
        import pyarrow as pa
        import ray.data

        from search_engine_ray.pipelines.corpus_clean import (
            _bloom_positions,
            bloom_filter_build,
        )

        texts = [f"page {i}" for i in range(500)]
        ds = ray.data.from_arrow(pa.table({"text": pa.array(texts, pa.string())}))
        n_bits, k = 1 << 12, 5
        got = bloom_filter_build(ds.repartition(9), n_bits=n_bits, k=k)
        want = np.zeros(n_bits // 64, np.uint64)
        pos = _bloom_positions(pa.array(texts, pa.string()), n_bits, k).ravel()
        for p in pos:
            want[int(p) >> 6] |= np.uint64(1) << np.uint64(int(p) & 63)
        assert (got == want).all()
        # bit 63 of a word (the hi-half top bit) must survive the packing
        assert any((int(p) & 63) >= 32 for p in pos)


class TestDedupLinesGlobal:
    ROWS = [
        {"doc_id": 1, "text": "alpha beta\nshared boilerplate\nunique one"},
        {"doc_id": 2, "text": "shared boilerplate\ngamma delta\n\nblank kept"},
        # intra-doc dup of an already-seen line AND of its own line
        {"doc_id": 3, "text": "unique one\nshared boilerplate\nunique one"},
        {"doc_id": 4, "text": ""},
        {"doc_id": 5, "text": "only mine"},
    ]
    WANT = {
        1: ("alpha beta\nshared boilerplate\nunique one", 0),
        2: ("gamma delta\n\nblank kept", 1),
        3: ("", 3),
        4: ("", 0),
        5: ("only mine", 0),
    }

    @pytest.mark.parametrize("cap", [2_000_000, 0])
    def test_first_occurrence_survives(self, ray_session, cap):
        """Broadcast (cap high) and sort-co-group (cap 0) paths agree:
        every non-empty line survives exactly once corpus-wide, in its
        smallest (doc_id, line_idx); empty lines always survive."""
        import ray.data

        from search_engine_ray.pipelines.corpus_clean import dedup_lines_global

        docs = ray.data.from_items(self.ROWS, override_num_blocks=3)
        out = dedup_lines_global(docs, broadcast_cap=cap).to_pandas()
        got = {int(r.doc_id): (r.text_clean, int(r.n_removed))
               for r in out.itertuples()}
        assert got == self.WANT


def _dedup_lines_spec(rows):
    """Scalar reference: first (doc_id, line_idx) occurrence of each
    non-empty line survives; empty lines always survive."""
    first = {}
    for r in sorted(rows, key=lambda r: r["doc_id"]):
        for i, ln in enumerate(r["text"].split("\n")):
            if ln and ln not in first:
                first[ln] = (r["doc_id"], i)
    out = {}
    for r in rows:
        kept, removed = [], 0
        for i, ln in enumerate(r["text"].split("\n")):
            if ln == "" or first.get(ln) == (r["doc_id"], i):
                kept.append(ln)
            else:
                removed += 1
        out[r["doc_id"]] = ("\n".join(kept), removed)
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_dedup_lines_matches_scalar_spec(ray_session, seed):
    """Randomized corpora (shared boilerplate pool + unique lines + empties)
    through BOTH distributed paths equal the scalar first-occurrence spec."""
    import numpy as np
    import ray.data

    from search_engine_ray.pipelines.corpus_clean import dedup_lines_global

    rng = np.random.default_rng(seed)
    pool = [f"boilerplate line {i}" for i in range(8)]
    rows = []
    for d in range(30):
        n = int(rng.integers(0, 6))
        lines = []
        for _ in range(n):
            r = rng.random()
            if r < 0.4:
                lines.append(pool[int(rng.integers(len(pool)))])
            elif r < 0.55:
                lines.append("")
            else:
                lines.append(f"unique d{d} {int(rng.integers(1 << 30))}")
        rows.append({"doc_id": d, "text": "\n".join(lines)})
    want = _dedup_lines_spec(rows)
    ds = ray.data.from_items(rows, override_num_blocks=4)
    for cap in (2_000_000, 0):
        out = dedup_lines_global(ds, broadcast_cap=cap).to_pandas()
        got = {int(r.doc_id): (r.text_clean, int(r.n_removed))
               for r in out.itertuples()}
        assert got == want, f"cap={cap} seed={seed}"


def test_dedup_lines_hot_line_skew(ray_session):
    """One boilerplate line shared by HALF the corpus (a Zipf-hot group
    whose occurrences straddle every block boundary) still resolves to
    exactly one surviving copy — the sorted_group_map boundary repair
    handles the hot hash group."""
    import ray.data

    from search_engine_ray.pipelines.corpus_clean import dedup_lines_global

    rows = []
    for d in range(400):
        lines = [f"unique content {d}"]
        if d % 2 == 0:
            lines.append("subscribe to our newsletter")
        rows.append({"doc_id": d, "text": "\n".join(lines)})
    ds = ray.data.from_items(rows, override_num_blocks=8)
    for cap in (2_000_000, 0):
        out = dedup_lines_global(ds, broadcast_cap=cap).to_pandas()
        survivors = out[out["text_clean"].str.contains("newsletter")]
        assert len(survivors) == 1 and int(survivors["doc_id"].iloc[0]) == 0, cap
        assert int(out["n_removed"].sum()) == 199, cap


class TestNormalizeText:
    def _run(self, ray_session, texts):
        import pyarrow as pa
        import ray.data

        from search_engine_ray.pipelines.corpus_clean import normalize_text

        ds = ray.data.from_arrow(pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }))
        out = normalize_text(ds).to_pandas().sort_values("doc_id")
        return out.text.tolist(), out.changed.tolist()

    def test_fixtures(self, ray_session):
        texts = [
            "école française",        # decomposed → NFC composes
            "a\x00b\x07c\x1fd\x7fe",              # C0 + DEL stripped
            "  lots   of\t\nspace  ",             # collapse + trim
            "plain ascii already clean",           # untouched
            "nbsp stays",                     # NBSP is not \s and survives
            "",
        ]
        got, changed = self._run(ray_session, texts)
        assert got == [
            "école française",
            "abcde",
            "lots of space",
            "plain ascii already clean",
            "nbsp stays",
            "",
        ]
        assert changed == [True, True, True, False, False, False]

    def test_idempotent(self, ray_session):
        texts = ["école  \x01 x", "café ok", "  a  b  "]
        once, _ = self._run(ray_session, texts)
        twice, changed = self._run(ray_session, once)
        assert twice == once
        assert not any(changed)


class TestQualityPercentileFilter:
    def test_cutoff_rule_and_partition_invariance(self, ray_session):
        import pyarrow as pa
        import ray.data

        from search_engine_ray.functions.quality import batch_doc_stats, batch_quality_score
        from search_engine_ray.pipelines.corpus_clean import quality_percentile_filter

        rng = np.random.default_rng(3)
        texts = []
        for i in range(200):
            n_words = int(rng.integers(1, 80))
            n_digits = int(rng.integers(0, n_words + 1))
            toks = ["word"] * (n_words - n_digits) + ["123"] * n_digits
            rng.shuffle(toks)
            texts.append(" ".join(toks))
        tbl = pa.table({"doc_id": pa.array(range(200), pa.int64()),
                        "text": pa.array(texts, pa.string())})
        q = batch_quality_score(batch_doc_stats(tbl["text"]))
        cut = round(float(np.quantile(q, 0.5)), 6)
        spec = sorted(int(i) for i, v in zip(range(200), q) if v >= cut)
        for parts in (3, 13):
            ds = ray.data.from_arrow(tbl).repartition(parts)
            out = quality_percentile_filter(ds, pct=0.5).to_pandas()
            assert sorted(out.doc_id) == spec, parts


def test_normalize_text_null_rows_pass_through(ray_session):
    import pyarrow as pa
    import ray.data

    from search_engine_ray.pipelines.corpus_clean import normalize_text

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["  a  b ", None, "ok"], pa.string()),
    }))
    out = normalize_text(ds).to_pandas().sort_values("doc_id")
    assert out.text.tolist()[0] == "a b"
    assert out.text.tolist()[1] is None
    assert out.changed.tolist() == [True, False, False]
