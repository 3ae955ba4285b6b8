"""Chunk construction ↔ decode round-trips (local, no Ray)."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_ray.query.postings_codec import decode_term_chunks
from search_engine_ray.stages.merge import chunk_rows_from_postings


def make_group(doc_ids, positions_per_doc, chunk_size=128, term="t", salt=0):
    doc_ids = np.asarray(doc_ids, np.int64)
    tfs = np.array([len(p) for p in positions_per_doc], np.int64)
    pos_offsets = np.zeros(len(tfs) + 1, np.int64)
    np.cumsum(tfs, out=pos_offsets[1:])
    pos_values = np.array([v for p in positions_per_doc for v in p], np.int64)
    return chunk_rows_from_postings(term, salt, doc_ids, tfs, pos_offsets, pos_values, chunk_size)


def roundtrip(doc_ids, positions_per_doc, chunk_size=128):
    table = make_group(doc_ids, positions_per_doc, chunk_size)
    tp = decode_term_chunks(table)
    assert tp.doc_ids.tolist() == list(doc_ids)
    assert tp.tfs.tolist() == [len(p) for p in positions_per_doc]
    for i, p in enumerate(positions_per_doc):
        assert tp.positions_of(i).tolist() == list(p)
    return table


class TestChunkRoundtrip:
    def test_single_posting(self):
        roundtrip([1], [[0, 5, 9]])

    def test_position_zero_sentinel(self):
        # leading position 0 (delta sentinel edge, helper.rs:6-44)
        roundtrip([1, 2], [[0], [0, 1, 2]])

    def test_chunk_boundary_128(self):
        # exactly 128 → one chunk; 129 → two (index_merge_writer.rs:554-586)
        t = roundtrip(range(1, 129), [[i] for i in range(128)])
        assert t.num_rows == 1
        t = roundtrip(range(1, 130), [[i] for i in range(129)])
        assert t.num_rows == 2
        assert t["n_postings"].to_pylist() == [128, 1]

    def test_max_doc_id_skip_metadata(self):
        t = make_group(range(1, 300), [[0]] * 299)
        assert t["max_doc_id"].to_pylist() == [128, 256, 299]
        assert t["first_doc_id"].to_pylist() == [1, 129, 257]

    def test_large_gaps_interior_zero_bytes(self):
        # doc_id gaps ≥ 16384 produce VB bytes with interior 0x00 — the
        # reference's delimiter landmine (vb_encode.rs:91-103); our explicit
        # lengths must round-trip them.
        roundtrip([1, 20000, 3_000_000, 3_000_001], [[16384], [0, 20000], [7], [2**31 - 2]])

    def test_doc_id_zero(self):
        roundtrip([0, 1, 5], [[1], [2], [3]])

    def test_multi_salt_concat(self):
        a = make_group([1, 2], [[1], [2]], salt=0)
        b = make_group([1_050_000, 1_050_001], [[3], [4]], salt=1)
        tp = decode_term_chunks(pa.concat_tables([b, a]))  # order-insensitive
        assert tp.doc_ids.tolist() == [1, 2, 1_050_000, 1_050_001]
        assert tp.positions_of(2).tolist() == [3]

    def test_empty(self):
        tp = decode_term_chunks(make_group([], [])[:0])
        assert tp.df == 0

    @given(st.data())
    @settings(max_examples=40, deadline=None)
    def test_property_roundtrip(self, data):
        n = data.draw(st.integers(1, 300))
        gaps = data.draw(st.lists(st.integers(1, 40000), min_size=n, max_size=n))
        doc_ids = np.cumsum(gaps)
        positions_per_doc = [
            sorted(data.draw(st.sets(st.integers(0, 2**20), min_size=1, max_size=5)))
            for _ in range(n)
        ]
        chunk_size = data.draw(st.sampled_from([1, 7, 128]))
        roundtrip(doc_ids, positions_per_doc, chunk_size)
