"""Compaction reconstruction (_chunks_to_runs) is LOSSLESS: property
roundtrip against the chunk writer, local (no Ray Data), including
multi-chunk groups, multi-salt, empty-position postings and tombstone
drops."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_ray.functions.vb import delta_encode, vb_encode_list
from search_engine_ray.pipelines.segments import _chunks_to_runs
from search_engine_ray.stages.merge import chunk_rows_from_postings


def make_chunks(term, doc_ids, positions_per_doc, chunk_size=4, salt=0):
    doc_ids = np.asarray(doc_ids, np.int64)
    tfs = np.array([len(p) for p in positions_per_doc], np.int64)
    pos_offsets = np.zeros(len(tfs) + 1, np.int64)
    np.cumsum(tfs, out=pos_offsets[1:])
    pos_values = np.array([v for p in positions_per_doc for v in p], np.int64)
    return chunk_rows_from_postings(term, salt, doc_ids, tfs, pos_offsets,
                                    pos_values, chunk_size)


def expected_pos_enc(positions) -> bytes:
    return vb_encode_list(delta_encode(list(positions)))


def check_runs(runs: pa.Table, want: list[tuple[str, int, list[int]]]):
    got = sorted(zip(runs["term"].to_pylist(), runs["doc_id"].to_pylist(),
                     runs["pos_enc"].to_pylist()))
    exp = sorted((t, d, expected_pos_enc(p)) for t, d, p in want)
    assert got == exp


class TestChunksToRuns:
    def test_two_terms_multichunk(self):
        want = [
            ("alpha", 1, [0, 3, 9]), ("alpha", 2, [5]), ("alpha", 4, [1, 2]),
            ("alpha", 9, [7]), ("alpha", 12, [0]),
            ("beta", 3, [2, 4]), ("beta", 12, [8]),
        ]
        t = pa.concat_tables([
            make_chunks("alpha", [1, 2, 4, 9, 12],
                        [[0, 3, 9], [5], [1, 2], [7], [0]], chunk_size=2),
            make_chunks("beta", [3, 12], [[2, 4], [8]], chunk_size=2),
        ])
        runs = _chunks_to_runs(t, n_units=4)
        check_runs(runs, want)
        # sgroup stamping matches the tokenizer's routing hash
        from search_engine_ray.functions.hashing import poly_hash_str

        for term, sg in zip(runs["term"].to_pylist(),
                            runs["sgroup"].to_pylist()):
            assert sg == poly_hash_str(term) % 4

    def test_tombstone_drop(self):
        t = make_chunks("x", [1, 5, 9], [[0], [2, 3], [1]], chunk_size=2)
        runs = _chunks_to_runs(t, n_units=2, drop_ref=np.array([5], np.int64))
        check_runs(runs, [("x", 1, [0]), ("x", 9, [1])])

    def test_empty_batch(self):
        t = make_chunks("x", [1], [[0]], chunk_size=2)
        assert _chunks_to_runs(t[:0], n_units=2).num_rows == 0

    @settings(max_examples=60, deadline=None)
    @given(st.data())
    def test_property_roundtrip(self, data):
        n = data.draw(st.integers(1, 12))
        doc_ids = sorted(data.draw(
            st.sets(st.integers(1, 10_000), min_size=n, max_size=n)))
        positions = [
            sorted(data.draw(st.sets(st.integers(0, 5_000), min_size=1, max_size=6)))
            for _ in range(n)
        ]
        chunk_size = data.draw(st.sampled_from([1, 2, 4, 128]))
        t = make_chunks("term", doc_ids, positions, chunk_size=chunk_size)
        runs = _chunks_to_runs(t, n_units=8)
        check_runs(runs, [("term", d, p) for d, p in zip(doc_ids, positions)])
