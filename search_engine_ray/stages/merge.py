"""Postings merge + chunked index construction.

The reference merges sorted SPIMI runs with a k-way smallest-term loop
(/root/reference/src/indexer/spimi.rs:50-121) and writes 64 KB blocks of
≤128-posting VB-compressed chunks, each chunk recording max_doc_id as a skip
pointer (/root/reference/src/indexer/index_merge_writer.rs:126-200,
chunk.rs:5-15). Here the ``groupby`` shuffle IS the merge:

    postings rows ──add salt──► groupby(term, salt) ──map_groups──► chunk rows

Hot-term skew (SURVEY.md §4): a term appearing in every doc would
concentrate its whole posting list in one group, so the group key is
``(term, salt)`` with ``salt = doc_id // salt_span``. Salt buckets of one
term hold disjoint ascending doc_id ranges, so reading chunks in
(salt, chunk_seq) order restores global doc_id order with a plain concat.

Chunk rows (the persisted index; one row per ≤chunk_size postings):
    term:string, salt:int64, chunk_seq:int32, n_postings:int32,
    first_doc_id:int64, max_doc_id:int64,
    doc_gaps:binary   — delta-gap+VB doc_ids, first-of-chunk absolute
                        (self-contained chunks; the reference continues
                        deltas across chunks — deviation documented),
    tfs:list<int32>   — term frequency per posting (len(positions)),
    pos_lens:list<int32> — VB byte length per posting's positions
                        (the reference's inline u16 lengths, helper.rs:75-78,
                        as an explicit column),
    pos_gaps:binary   — delta-gap+VB positions, first-per-posting absolute.

Unlike the reference we never use a 0x00 delimiter (its parsing breaks on
gaps ≥ 16384 — vb_encode.rs:91-103, SURVEY.md §2.7 C5); lengths are explicit.
The index is keyed by the term string itself (parquet dictionary-encodes it);
dense 1-based term_ids live in dictionary.parquet for rank/oracle parity
(spimi.rs:60,76,95) without a build-time join.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from search_engine_ray.config import EngineConfig
from search_engine_ray.functions.vb import vb_encode_array

CHUNK_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("salt", pa.int64()),
        ("chunk_seq", pa.int32()),
        ("n_postings", pa.int32()),
        ("first_doc_id", pa.int64()),
        ("max_doc_id", pa.int64()),
        ("doc_gaps", pa.binary()),
        ("tfs", pa.list_(pa.int32())),
        ("pos_lens", pa.list_(pa.int32())),
        ("pos_gaps", pa.binary()),
    ]
)


def _binary_from_spans(data: np.ndarray, span_offsets: np.ndarray) -> pa.BinaryArray:
    """Zero-copy build of a binary column whose i-th value is
    data[span_offsets[i]:span_offsets[i+1]]."""
    return pa.Array.from_buffers(
        pa.binary(),
        len(span_offsets) - 1,
        [None, pa.py_buffer(span_offsets.astype(np.int32)), pa.py_buffer(data)],
    )


def chunk_rows_from_postings(
    term: str,
    salt: int,
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    pos_offsets: np.ndarray,
    pos_values: np.ndarray,
    chunk_size: int,
) -> pa.Table:
    """Postings of ONE (term, salt) group, doc_id-ascending → chunk rows.

    pos_offsets/pos_values: list-array layout of per-posting positions
    (pos_offsets has len(doc_ids)+1 entries). Fully vectorized: one VB encode
    for the doc_id stream, one for the position stream.
    """
    n = len(doc_ids)
    if n == 0:
        return CHUNK_SCHEMA.empty_table()
    n_chunks = (n + chunk_size - 1) // chunk_size
    chunk_starts = np.arange(n_chunks) * chunk_size  # posting index per chunk
    chunk_ends = np.minimum(chunk_starts + chunk_size, n)

    # --- doc_id stream: gaps, absolute at each chunk start --------------------
    doc_gaps = np.empty(n, np.int64)
    doc_gaps[0] = doc_ids[0]
    np.subtract(doc_ids[1:], doc_ids[:-1], out=doc_gaps[1:])
    doc_gaps[chunk_starts] = doc_ids[chunk_starts]
    doc_enc, doc_bytelens = vb_encode_array(doc_gaps)
    doc_byte_bounds = np.zeros(n + 1, np.int64)
    np.cumsum(doc_bytelens, out=doc_byte_bounds[1:])
    doc_spans = doc_byte_bounds[np.append(chunk_starts, n)]

    # --- position stream: gaps, absolute at each posting start ----------------
    m = len(pos_values)
    if m:
        pos_gaps = np.empty(m, np.int64)
        pos_gaps[0] = pos_values[0]
        np.subtract(pos_values[1:], pos_values[:-1], out=pos_gaps[1:])
        posting_starts = pos_offsets[:-1][tfs > 0]
        pos_gaps[posting_starts] = pos_values[posting_starts]
        pos_enc, pos_bytelens = vb_encode_array(pos_gaps)
        byte_bounds = np.zeros(m + 1, np.int64)
        np.cumsum(pos_bytelens, out=byte_bounds[1:])
        # byte length per posting / byte offset per chunk
        per_posting_bytes = byte_bounds[pos_offsets[1:]] - byte_bounds[pos_offsets[:-1]]
        pos_spans = byte_bounds[pos_offsets[np.append(chunk_starts, n)]]
    else:
        pos_enc = np.zeros(0, np.uint8)
        per_posting_bytes = np.zeros(n, np.int64)
        pos_spans = np.zeros(n_chunks + 1, np.int64)

    tf_list = pa.ListArray.from_arrays(
        pa.array(np.append(chunk_starts, n), type=pa.int32()),
        pa.array(tfs, type=pa.int32()),
    )
    pos_lens_list = pa.ListArray.from_arrays(
        pa.array(np.append(chunk_starts, n), type=pa.int32()),
        pa.array(per_posting_bytes, type=pa.int32()),
    )

    return pa.table(
        {
            "term": pa.array([term] * n_chunks, pa.string()),
            "salt": pa.array(np.full(n_chunks, salt), pa.int64()),
            "chunk_seq": pa.array(np.arange(n_chunks, dtype=np.int32), pa.int32()),
            "n_postings": pa.array((chunk_ends - chunk_starts).astype(np.int32), pa.int32()),
            "first_doc_id": pa.array(doc_ids[chunk_starts], pa.int64()),
            "max_doc_id": pa.array(doc_ids[chunk_ends - 1], pa.int64()),
            "doc_gaps": _binary_from_spans(doc_enc, doc_spans),
            "tfs": tf_list,
            "pos_lens": pos_lens_list,
            "pos_gaps": _binary_from_spans(pos_enc, pos_spans),
        }
    )


def _merge_group(group: pa.Table, chunk_size: int) -> pa.Table:
    """map_groups fn: one (term, salt) group → chunk rows. Re-establishes
    ascending doc_id order (the streaming reference gets it for free,
    SURVEY.md §2.10; post-shuffle we sort within the group)."""
    group = group.combine_chunks()
    term = group["term"][0].as_py()
    salt = group["salt"][0].as_py()
    doc_ids = group["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(doc_ids, kind="stable")
    doc_ids = doc_ids[order]
    tfs = group["tf"].to_numpy(zero_copy_only=False).astype(np.int64)[order]
    positions = group["positions"].combine_chunks().take(pa.array(order))
    pos_values = positions.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
    # tf == len(positions) per posting, so offsets derive from tfs directly
    pos_offsets = np.zeros(len(tfs) + 1, np.int64)
    np.cumsum(tfs, out=pos_offsets[1:])
    return chunk_rows_from_postings(term, salt, doc_ids, tfs, pos_offsets, pos_values, chunk_size)


def merge_postings(postings_ds, config: EngineConfig | None = None):
    """postings Dataset → chunk-row Dataset (the groupby shuffle = the merge).

    Filters the zero-token sentinel rows (term == "") first.
    """
    config = config or EngineConfig()
    span = config.salt_span
    chunk_size = config.chunk_size

    def prep(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.not_equal(batch["term"], ""))
        salt = pc.divide(batch["doc_id"], span)
        return batch.drop_columns(["doc_length"]).append_column("salt", pc.cast(salt, pa.int64()))

    prepped = postings_ds.map_batches(prep, batch_format="pyarrow")
    return prepped.groupby(["term", "salt"]).map_groups(
        lambda g: _merge_group(g, chunk_size), batch_format="pyarrow"
    )
