"""BPE training + encoding: scalar-spec checks (the canonical Sennrich
example) and distributed word-count/token-count parity."""

import numpy as np
import pytest

from search_engine_ray.functions.bpe import (
    END,
    bpe_encode_word,
    merge_ranks,
    train_bpe_from_counts,
)


class TestBpeAlgebra:
    def test_sennrich_example(self):
        """The canonical worked example: {'low':5,'lower':2,'newest':6,
        'widest':3} learns ('e','s'),('es','t'),('est','</w>') first
        (weighted counts 9, 9, 9 — lexicographic tie-break picks e+s),
        and 'lowest' encodes as low + est</w>."""
        wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
        merges = train_bpe_from_counts(wc, 10)
        assert merges[:3] == [("e", "s"), ("es", "t"), ("est", END)]
        r = merge_ranks(merges)
        assert bpe_encode_word("lowest", r) == ["low", "est" + END]
        assert bpe_encode_word("newest", r) == ["newest" + END]

    def test_encode_unknown_chars_fall_through(self):
        r = merge_ranks([("a", "b")])
        assert bpe_encode_word("abxy", r) == ["ab", "x", "y", END]

    def test_training_deterministic(self):
        wc = {"aaab": 3, "abab": 2, "bbaa": 4}
        assert train_bpe_from_counts(wc, 6) == train_bpe_from_counts(wc, 6)

    def test_stops_when_no_repeats(self):
        assert train_bpe_from_counts({"ab": 1, "cd": 1}, 50) == []


class TestBpePipeline:
    def test_counts_match_scalar_encode(self, ray_session):
        import ray.data

        from search_engine_ray.pipelines.training_data import (
            bpe_token_counts,
            train_bpe,
        )

        rows = [
            {"doc_id": 1, "text": "low low low lower newest"},
            {"doc_id": 2, "text": "Newest widest NEWEST"},
            {"doc_id": 3, "text": ""},
        ]
        ds = ray.data.from_items(rows, override_num_blocks=2)
        merges = train_bpe(ds, num_merges=8)
        out = bpe_token_counts(ds, merges).to_pandas().set_index("doc_id")
        r = merge_ranks(merges)
        for row in rows:
            want = sum(len(bpe_encode_word(w, r))
                       for w in row["text"].lower().split())
            assert int(out.loc[row["doc_id"], "n_bpe_tokens"]) == want

    def test_training_partition_invariant(self, ray_session):
        import ray.data

        from search_engine_ray.pipelines.training_data import train_bpe

        rows = [{"doc_id": i, "text": f"some shared words plus tail{i % 7}"}
                for i in range(40)]
        m1 = train_bpe(ray.data.from_items(rows, override_num_blocks=1), 20)
        m8 = train_bpe(ray.data.from_items(rows, override_num_blocks=8), 20)
        assert m1 == m8


class TestTokenizeAndPack:
    @pytest.mark.parametrize("blocks", [1, 4])
    def test_packs_equal_scalar_chunking(self, ray_session, blocks):
        """Assembled packs equal concatenating every doc's ids in doc_id
        order and chunking by max_len — partition-invariant."""
        import ray.data

        from search_engine_ray.pipelines.training_data import (
            tokenize_and_pack,
            train_bpe_with_vocab,
        )

        rows = [{"doc_id": i, "text": f"low lower newest widest tail{i % 5} "
                                      f"extra words number {i}"}
                for i in range(25)]
        ds = ray.data.from_items(rows, override_num_blocks=blocks)
        merges, vocab = train_bpe_with_vocab(ds, num_merges=30)
        out = (tokenize_and_pack(ds, merges, vocab, max_len=16)
               .to_pandas().sort_values("pack_id").reset_index(drop=True))

        r = merge_ranks(merges)
        sym = {s: i for i, s in enumerate(vocab)}
        stream = []
        for row in rows:  # doc_id order == list order
            for w in row["text"].lower().split():
                stream.extend(sym[s] for s in bpe_encode_word(w, r))
        want = [stream[i:i + 16] for i in range(0, len(stream), 16)]
        got = [list(x) for x in out["token_ids"]]
        assert out["pack_id"].tolist() == list(range(len(want)))
        assert got == want
        assert all(len(p) == 16 for p in got[:-1])
