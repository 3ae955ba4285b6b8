"""Vectorized MinHash path: every batch kernel must equal its per-doc
scalar spec, and the de-amplified pipeline (band rows WITHOUT signatures +
single-fetch verification) must produce the same verified pairs as scoring
every candidate directly."""

import numpy as np
import pyarrow as pa
import pytest

from search_engine_ray.functions.hashing import (
    batch_shingle_hashes,
    batch_token_hashes,
    shingle_hashes,
)
from search_engine_ray.functions.minhash import MinHasher
from search_engine_ray.pipelines.training_data import _tok_hashes

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "",
    "   ",
    "The  Quick   Brown fox",
    "one",
    "a b c d e f g h i j k l m n o p",
    "duplicate duplicate duplicate duplicate",
    "Ünïcode tëxt with Áccents everywhere",
    "x",
    "the quick brown fox jumps over the lazy dog",  # exact dup of [0]
]


class TestBatchKernels:
    def test_token_hashes_match_spec(self):
        offsets, h = batch_token_hashes(pa.array(TEXTS, pa.string()))
        assert len(offsets) == len(TEXTS) + 1
        for i, t in enumerate(TEXTS):
            want = _tok_hashes(t)
            got = h[offsets[i]:offsets[i + 1]]
            np.testing.assert_array_equal(got, want, err_msg=t)

    @pytest.mark.parametrize("k", [1, 2, 3, 5])
    def test_shingles_match_spec(self, k):
        offsets, h = batch_token_hashes(pa.array(TEXTS, pa.string()))
        sh_off, sh = batch_shingle_hashes(offsets, h, k)
        for i, t in enumerate(TEXTS):
            want = shingle_hashes(_tok_hashes(t), k)
            got = sh[sh_off[i]:sh_off[i + 1]]
            np.testing.assert_array_equal(got, want, err_msg=f"{t!r} k={k}")

    def test_signatures_match_spec(self):
        mh = MinHasher(num_perm=64, seed=3)
        offsets, h = batch_token_hashes(pa.array(TEXTS, pa.string()))
        sh_off, sh = batch_shingle_hashes(offsets, h, 2)
        mat = mh.signatures_batch(sh_off, sh, perm_block=16)
        assert mat.shape == (len(TEXTS), 64)
        for i, t in enumerate(TEXTS):
            want = mh.signature(shingle_hashes(_tok_hashes(t), 2))
            np.testing.assert_array_equal(mat[i], want, err_msg=t)

    def test_exact_dup_rows_equal(self):
        mh = MinHasher(num_perm=32, seed=1)
        offsets, h = batch_token_hashes(pa.array(TEXTS, pa.string()))
        sh_off, sh = batch_shingle_hashes(offsets, h, 3)
        mat = mh.signatures_batch(sh_off, sh)
        np.testing.assert_array_equal(mat[0], mat[9])


def _dup_corpus(n=300, seed=4):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(500)]
    rows = []
    for i in range(n):
        words = list(rng.choice(vocab, 30))
        rows.append({"doc_id": i, "text": " ".join(words)})
    # near-dups: copy with one word changed; plus one exact dup
    for j, src in enumerate(range(0, 40, 2)):
        words = rows[src]["text"].split()
        words[5] = "CHANGED"
        rows.append({"doc_id": n + j, "text": " ".join(words)})
    rows.append({"doc_id": n + 100, "text": rows[0]["text"]})
    return rows


class TestDeamplifiedPipeline:
    @pytest.fixture(scope="class")
    def corpus(self, ray_session):
        import ray.data

        return ray.data.from_items(_dup_corpus()).materialize()

    def _pairs(self, corpus, broadcast_cap):
        from search_engine_ray.pipelines.training_data import (
            minhash_signatures,
            minhash_verified_pairs,
        )

        sigs = minhash_signatures(corpus, shingle_k=2, num_perm=64)
        out = minhash_verified_pairs(
            sigs, bands=16, threshold=0.5, num_perm=64, broadcast_cap=broadcast_cap
        ).to_pandas()
        return set(zip(out["a"].astype(int), out["b"].astype(int)))

    def test_finds_planted_dups(self, corpus):
        pairs = self._pairs(corpus, broadcast_cap=500_000)
        assert (0, 400) in pairs  # exact dup scores 1.0
        hits = sum((src, 300 + j) in pairs for j, src in enumerate(range(0, 40, 2)))
        assert hits >= 15  # near-dups (29/30 shingle overlap) mostly found

    def test_broadcast_and_join_paths_agree(self, corpus):
        assert self._pairs(corpus, broadcast_cap=500_000) == self._pairs(corpus, broadcast_cap=0)

    def test_band_rows_carry_no_signature(self, corpus):
        from search_engine_ray.pipelines.training_data import (
            minhash_band_rows,
            minhash_signatures,
        )

        rows = minhash_band_rows(minhash_signatures(corpus, shingle_k=2, num_perm=64), bands=16)
        assert set(rows.schema().names) == {"band_key", "doc_id"}


class TestSimhashFingerprintVectorized:
    @pytest.fixture(scope="class")
    def tiny(self, ray_session):
        import ray.data

        return ray.data.from_items(
            [{"doc_id": i, "text": t} for i, t in enumerate(TEXTS)],
            override_num_blocks=2,
        )

    def test_simhash_matches_spec(self, tiny):
        from search_engine_ray.functions.minhash import simhash64
        from search_engine_ray.pipelines.training_data import simhash_table

        got = simhash_table(tiny).to_pandas().set_index("doc_id")["simhash"].to_dict()
        for i, t in enumerate(TEXTS):
            th = _tok_hashes(t)
            if len(th):
                uniq, counts = np.unique(th, return_counts=True)
                want = int(np.uint64(simhash64(uniq, counts)).view(np.int64))
            else:
                want = 0
            assert got[i] == want, t

    def test_fingerprints_match_spec(self, tiny):
        from search_engine_ray.functions.hashing import winnow_fingerprint
        from search_engine_ray.pipelines.training_data import fingerprints

        out = fingerprints(tiny, k=3, window=4).to_pandas()
        by_doc = out.groupby("doc_id")["fingerprint"].apply(
            lambda s: np.sort(s.to_numpy().view(np.uint64)))
        for i, t in enumerate(TEXTS):
            want = np.sort(winnow_fingerprint(_tok_hashes(t), 3, 4))
            got = by_doc.get(i, np.zeros(0, np.uint64))
            np.testing.assert_array_equal(np.asarray(got), want, err_msg=t)


class TestMd5Twin:
    def test_md5_mode_finds_planted_near_dups(self, ray_session):
        """The md5 hash mode (SQL-oracle twin) runs the same banding/
        verification path and recovers planted near-duplicates; docs with
        fewer than k tokens are excluded rather than sentinel-paired."""
        import ray.data

        from search_engine_ray.pipelines.training_data import minhash_lsh_dedup

        base = ("the quick brown fox jumps over the lazy dog and runs far "
                "away into the deep green forest tonight").split()
        rows = [{"doc_id": 1, "text": " ".join(base)},
                {"doc_id": 2, "text": " ".join(base[:-1] + ["today"])},
                {"doc_id": 3, "text": "completely different content about "
                                      "databases and query engines"},
                {"doc_id": 4, "text": "one"},   # < k tokens: excluded
                {"doc_id": 5, "text": "two"}]   # would sentinel-pair with 4
        docs = ray.data.from_items(rows, override_num_blocks=2)
        out = minhash_lsh_dedup(docs, shingle_k=2, threshold=0.4,
                                hash_mode="md5").to_pandas()
        pairs = set(zip(out["a"], out["b"]))
        assert (1, 2) in pairs
        assert not any(4 in p or 5 in p for p in pairs)
        assert not any(3 in p for p in pairs)

    def test_simhash_md5_mode(self, ray_session):
        """md5-mode simhash pairs near-identical docs and excludes
        token-less docs (poly mode gives them simhash 0 and pairs them)."""
        import ray.data

        from search_engine_ray.pipelines.training_data import simhash_dedup

        base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
                "lambda mu nu xi omicron pi rho sigma tau upsilon").split()
        rows = [{"doc_id": 1, "text": " ".join(base)},
                {"doc_id": 2, "text": " ".join(base)},  # exact dup: hamming 0
                {"doc_id": 3, "text": ""},
                {"doc_id": 4, "text": "   "}]
        docs = ray.data.from_items(rows, override_num_blocks=2)
        out = simhash_dedup(docs, max_hamming=3, hash_mode="md5").to_pandas()
        pairs = set(zip(out["a"], out["b"]))
        assert (1, 2) in pairs
        assert not any(3 in p or 4 in p for p in pairs)


def test_signatures_batch_size_invariant(ray_session):
    """The batch_size bound added for worker-memory discipline must not
    change a single signature: 3-row batches ≡ one big batch."""
    import ray.data

    from search_engine_ray.pipelines.training_data import minhash_signatures

    docs = ray.data.from_items(
        [{"doc_id": i, "text": f"alpha beta gamma delta {i % 4} zeta"}
         for i in range(40)])
    a = (minhash_signatures(docs, shingle_k=2, num_perm=32).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (minhash_signatures(docs, shingle_k=2, num_perm=32, batch_size=3)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert list(a["doc_id"]) == list(b["doc_id"])
    assert all(x == y for x, y in zip(a["sig"], b["sig"]))
