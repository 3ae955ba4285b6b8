"""Decode chunk rows (stages/merge.py CHUNK_SCHEMA) back into postings.

Mirrors the reference's read path: Block::decode_chunks_for_term →
Chunk::get_doc_ids / positions (/root/reference/src/indexer/block.rs:114-141,
chunk.rs:58-94) — but with explicit lengths instead of the buggy 0x00
delimiter scan (SURVEY.md §2.7 C5).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from search_engine_ray.functions.vb import decode_ascending, vb_decode_array


@dataclass
class TermPostings:
    """Merged, doc_id-ascending postings of one term."""

    doc_ids: np.ndarray  # int64, ascending
    tfs: np.ndarray  # int64
    # positions as a flat array + offsets (positions[offsets[i]:offsets[i+1]])
    pos_offsets: np.ndarray
    pos_values: np.ndarray

    @property
    def df(self) -> int:
        return len(self.doc_ids)

    def positions_of(self, i: int) -> np.ndarray:
        return self.pos_values[self.pos_offsets[i] : self.pos_offsets[i + 1]]

    def positions_for_doc(self, doc_id: int) -> np.ndarray | None:
        i = int(np.searchsorted(self.doc_ids, doc_id))
        if i < len(self.doc_ids) and self.doc_ids[i] == doc_id:
            return self.positions_of(i)
        return None


def proximity_window_pairs(pp1: np.ndarray, pp2: np.ndarray, k: int
                           ) -> tuple[np.ndarray, np.ndarray]:
    """All (p1, p2) with p2 > p1 and p2 - p1 <= k over two ASCENDING
    position arrays — the reference's one-directional window
    (positional_intersect/mod.rs:322-343) as two ``searchsorted`` passes +
    one gather instead of the O(n·m) nested Python loop (round-2 VERDICT
    #8). Output order equals the nested loop's: p1-major, p2 ascending."""
    pp1 = np.asarray(pp1, np.int64)
    pp2 = np.asarray(pp2, np.int64)
    if not len(pp1) or not len(pp2):
        z = np.zeros(0, np.int64)
        return z, z
    lo = np.searchsorted(pp2, pp1, side="right")          # first p2 > p1
    hi = np.searchsorted(pp2, pp1 + k, side="right")      # last p2 <= p1+k
    counts = hi - lo
    total = int(counts.sum())
    if total == 0:
        z = np.zeros(0, np.int64)
        return z, z
    bounds = np.zeros(len(counts) + 1, np.int64)
    np.cumsum(counts, out=bounds[1:])
    within = np.arange(total, dtype=np.int64) - np.repeat(bounds[:-1], counts)
    return np.repeat(pp1, counts), pp2[np.repeat(lo, counts) + within]


def decode_chunk_doc_ids(doc_gaps: bytes) -> np.ndarray:
    return decode_ascending(doc_gaps)


def decode_chunk_positions(pos_gaps: bytes, pos_lens: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """→ (pos_offsets, pos_values) for one chunk; pos_lens = VB byte length
    per posting (the split the reference encodes inline, helper.rs:75-78)."""
    gaps = vb_decode_array(np.frombuffer(pos_gaps, np.uint8)) if len(pos_gaps) else np.zeros(0, np.uint64)
    # value-count per posting: VB values and bytes are aligned per posting;
    # recover counts by decoding byte-lengths per value within each span.
    # Positions are per-posting delta streams: first value absolute → we must
    # cumsum WITHIN posting spans. Compute value counts per posting from the
    # byte stream: count terminator bytes per span.
    buf = np.frombuffer(pos_gaps, np.uint8)
    term_mask = (buf >= 128).astype(np.int64)
    byte_bounds = np.zeros(len(pos_lens) + 1, np.int64)
    np.cumsum(np.asarray(pos_lens, np.int64), out=byte_bounds[1:])
    csum = np.zeros(len(buf) + 1, np.int64)
    np.cumsum(term_mask, out=csum[1:])
    counts = csum[byte_bounds[1:]] - csum[byte_bounds[:-1]]
    offsets = np.zeros(len(counts) + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    # un-delta: groupwise cumsum = global cumsum minus the base carried in
    # from previous postings
    running = np.cumsum(gaps.astype(np.int64))
    starts = offsets[:-1]
    base_per_posting = np.where(starts > 0, running[np.maximum(starts - 1, 0)], 0)
    values = running - np.repeat(base_per_posting, counts)
    return offsets, values


def decode_term_chunks(chunks: pa.Table) -> TermPostings:
    """All chunk rows of ONE term (any order) → merged TermPostings.

    Rows are ordered by (salt, first_doc_id): salt buckets are disjoint
    ascending doc_id ranges, and within a (term, salt) group every chunk —
    including fragments of block-straddling groups — holds a disjoint
    ascending doc_id range, so this ordering restores global doc_id order
    exactly (stages/merge.py).
    """
    if chunks.num_rows == 0:
        z = np.zeros(0, np.int64)
        return TermPostings(z, z, np.zeros(1, np.int64), z)
    chunks = chunks.combine_chunks().sort_by(
        [("salt", "ascending"), ("first_doc_id", "ascending"), ("chunk_seq", "ascending")]
    )
    doc_parts = []
    tf_parts = []
    off_parts = [np.zeros(1, np.int64)]
    val_parts = []
    total = 0
    for row in range(chunks.num_rows):
        doc_gaps = chunks["doc_gaps"][row].as_py()
        doc_parts.append(decode_chunk_doc_ids(doc_gaps))
        tfs = np.asarray(chunks["tfs"][row].as_py(), np.int64)
        tf_parts.append(tfs)
        pos_lens = np.asarray(chunks["pos_lens"][row].as_py(), np.int64)
        offs, vals = decode_chunk_positions(chunks["pos_gaps"][row].as_py(), pos_lens)
        off_parts.append(offs[1:] + total)
        total += offs[-1]
        val_parts.append(vals)
    return TermPostings(
        np.concatenate(doc_parts),
        np.concatenate(tf_parts),
        np.concatenate(off_parts),
        np.concatenate(val_parts) if val_parts else np.zeros(0, np.int64),
    )


def segmented_min_distance(pos1: np.ndarray, off1: np.ndarray,
                           pos2: np.ndarray, off2: np.ndarray) -> np.ndarray:
    """Per-segment min |a − b| between two ragged ASCENDING position sets
    (segment i of ``posX`` is ``posX[offX[i]:offX[i+1]]``; same segment
    count on both sides, every segment non-empty). One fused-key
    searchsorted finds each left position's nearest right neighbor in its
    own segment (insertion point clamped to the segment's block bounds —
    cross-segment neighbors are masked, never compared), then a
    ``minimum.reduceat`` folds per segment. No per-segment Python."""
    n_seg = len(off1) - 1
    if n_seg <= 0:
        return np.zeros(0, np.int64)
    n1 = np.diff(off1)
    n2 = np.diff(off2)
    big = np.int64(1) << 40
    f1 = np.repeat(np.arange(n_seg, dtype=np.int64), n1) * big + pos1
    f2 = np.repeat(np.arange(n_seg, dtype=np.int64), n2) * big + pos2
    idx = np.searchsorted(f2, f1)
    lo_bound = np.repeat(off2[:-1], n1)
    hi_bound = np.repeat(off2[1:], n1)
    inf = np.int64(1) << 60
    right = np.where(idx < hi_bound,
                     f2[np.minimum(idx, len(f2) - 1)] - f1, inf)
    left = np.where(idx - 1 >= lo_bound,
                    f1 - f2[np.maximum(idx - 1, 0)], inf)
    return np.minimum.reduceat(np.minimum(right, left), off1[:-1])


def ragged_slices(src_offsets: np.ndarray, values: np.ndarray,
                  idx: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Gather the ragged segments ``values[src_offsets[i]:src_offsets[i+1]]``
    for each i in ``idx`` into one flat array + new offsets — the shared
    kernel behind per-candidate position slicing (proximity scoring, LTR
    positional features, distributed prox fan-outs)."""
    lens = src_offsets[idx + 1] - src_offsets[idx]
    off = np.zeros(len(idx) + 1, np.int64)
    np.cumsum(lens, out=off[1:])
    gather = (np.arange(int(off[-1]), dtype=np.int64)
              + np.repeat(src_offsets[idx] - off[:-1], lens))
    return values[gather], off
