"""Incremental (segment) indexing over the pipelines/build.py layout.

The reference rebuilds its index from scratch every run (its SPIMI build has
no notion of adding documents to an existing index). At 10^12 documents a
full rebuild per delta is not an option, so this module adds the standard
Lucene-style segment model on top of the existing build:

* ``add_segment(pages, root)`` builds a COMPLETE, self-contained index
  (the ordinary build_index stages — runs → dictionary → sharded postings →
  stats) under ``root/segments/seg-NNNNN``, with ``doc_id_base`` offset so
  doc_ids stay globally unique across segments. Appending never touches
  existing segments: each delta pays only its own build.
* ``delete_docs(root, ids)`` records tombstones (a DELETE-list — O(deletes),
  never corpus-sized; the same lesson as corpus_clean's drop-list).
  Serving filters them (query/segmented.py); stats keep counting deleted
  docs until compaction, exactly like Lucene's deleted docs.
* ``compact(root)`` merges every segment (minus tombstoned postings) into
  ONE new segment and resets the tombstone list. Postings are reconstructed
  from the chunk rows LOSSLESSLY and fully vectorized — ``pos_gaps`` is a
  byte-concatenation of per-posting VB streams with ``pos_lens`` spans, and
  ``doc_gaps`` decodes with one VB pass + a segmented cumsum — back into the
  exact runs schema (term, doc_id, pos_enc, sgroup) the merge stages
  consume. Compaction then just resumes build_index with the stage-1
  artifacts pre-written: the dictionary/postings/stats stages run unchanged,
  so a compacted index is BYTE-COMPATIBLE with a fresh build (pytest asserts
  value-identical dictionary + postings for the no-delete case).

Scale notes: segments are independent (build cost ∝ delta size); compaction
streams chunk rows per segment through map_batches — nothing corpus-sized on
the driver; the tombstone broadcast is O(deletes). The segments.json root
manifest is tiny (one entry per segment) and written atomically.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import ray
import ray.data

from search_engine_ray.config import EngineConfig
from search_engine_ray.functions.hashing import hash_strings_arrow
from search_engine_ray.functions.vb import (
    binary_column_parts,
    binary_from_spans,
    vb_decode_array,
)
from search_engine_ray.pipelines.build import IndexPaths, build_index, load_stats
from search_engine_ray.state import manifests

SEGMENTS_FILE = "segments.json"
TOMBSTONES_FILE = "tombstones.json"

#: runs schema (build.py _stamp_and_tokenize output) the compactor must emit
_RUNS_EMPTY = pa.table({
    "term": pa.array([], pa.string()),
    "doc_id": pa.array([], pa.int64()),
    "pos_enc": pa.array([], pa.binary()),
    "sgroup": pa.array([], pa.int64()),
})


# ---------------------------------------------------------------------------
# root manifest + tombstones
# ---------------------------------------------------------------------------


def read_segments(root: str) -> list[dict]:
    try:
        with open(os.path.join(root, SEGMENTS_FILE)) as f:
            return json.load(f)["segments"]
    except (FileNotFoundError, json.JSONDecodeError):
        return []


def _write_segments(root: str, segments: list[dict]) -> None:
    p = os.path.join(root, SEGMENTS_FILE)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"segments": segments}, f, indent=1)
    os.replace(tmp, p)


def segment_dir(root: str, name: str) -> str:
    return os.path.join(root, "segments", name)


def load_tombstones(root: str) -> np.ndarray:
    try:
        with open(os.path.join(root, TOMBSTONES_FILE)) as f:
            return np.asarray(sorted(json.load(f)["doc_ids"]), np.int64)
    except (FileNotFoundError, json.JSONDecodeError):
        return np.zeros(0, np.int64)


def delete_docs(root: str, doc_ids) -> np.ndarray:
    """Record tombstones (idempotent union); returns the full sorted list."""
    cur = load_tombstones(root)
    new = np.union1d(cur, np.asarray(list(doc_ids), np.int64))
    p = os.path.join(root, TOMBSTONES_FILE)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"doc_ids": [int(i) for i in new]}, f)
    os.replace(tmp, p)
    return new


# ---------------------------------------------------------------------------
# append
# ---------------------------------------------------------------------------


def add_segment(pages, root: str, config: EngineConfig | None = None,
                resume: bool = True) -> str:
    """Build the next segment from ``pages`` (path or Dataset of the
    input_hint webpages schema); returns the segment directory.

    doc_ids continue after the last segment's range, so urls must be unique
    ACROSS segments for determinism, and (unlike a full rebuild) doc_id
    order reflects segment arrival order, then url order within a segment —
    the standard incremental-index contract."""
    config = config or EngineConfig()
    segs = read_segments(root)
    base = max((s["doc_id_base"] + s["num_docs"] for s in segs), default=0)
    name = f"seg-{len(segs):05d}"
    out = segment_dir(root, name)
    os.makedirs(out, exist_ok=True)
    build_index(pages, out, config, resume=resume, doc_id_base=base)
    st = load_stats(out)
    segs.append({
        "name": name,
        "doc_id_base": base,
        "num_docs": st["num_docs"],
        "total_tokens": st["total_tokens"],
    })
    _write_segments(root, segs)
    return out


# ---------------------------------------------------------------------------
# compaction: chunk rows → runs rows (lossless, vectorized)
# ---------------------------------------------------------------------------


def _chunks_to_runs(batch: pa.Table, n_units: int,
                    drop_ref=None) -> pa.Table:
    """Reconstruct exact runs rows from CHUNK_SCHEMA rows, whole-batch
    vectorized: one VB decode for all doc gaps + a segmented cumsum; the
    per-posting position streams are SLICED (never decoded) out of the
    shared pos_gaps buffer via pos_lens spans."""
    batch = batch.combine_chunks()
    if batch.num_rows == 0:
        return _RUNS_EMPTY
    n_post = batch["n_postings"].to_numpy(zero_copy_only=False).astype(np.int64)
    total = int(n_post.sum())
    if total == 0:
        return _RUNS_EMPTY

    # doc_ids: decode every gap in one pass; within a chunk the first gap is
    # the absolute doc_id, so per-chunk cumsum = global cumsum − carried base
    dg = batch["doc_gaps"]
    dg = dg.combine_chunks() if isinstance(dg, pa.ChunkedArray) else dg
    offs, data = binary_column_parts(dg)
    gaps = vb_decode_array(data[offs[0]:offs[-1]]).astype(np.int64)
    assert len(gaps) == total, "doc_gaps value count != n_postings sum"
    run = np.cumsum(gaps)
    chunk_starts = np.zeros(len(n_post), np.int64)
    np.cumsum(n_post[:-1], out=chunk_starts[1:])
    base = np.where(chunk_starts > 0, run[chunk_starts - 1], 0)
    doc_ids = run - np.repeat(base, n_post)

    # per-posting encoded positions: slice the contiguous pos_gaps bytes
    pl = batch["pos_lens"]
    pl = pl.combine_chunks() if isinstance(pl, pa.ChunkedArray) else pl
    lens = pl.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
    assert len(lens) == total, "pos_lens count != n_postings sum"
    pg = batch["pos_gaps"]
    pg = pg.combine_chunks() if isinstance(pg, pa.ChunkedArray) else pg
    poffs, pdata = binary_column_parts(pg)
    pbytes = np.ascontiguousarray(pdata[poffs[0]:poffs[-1]])
    spans = np.zeros(total + 1, np.int64)
    np.cumsum(lens, out=spans[1:])
    assert spans[-1] == len(pbytes), "pos_lens bytes != pos_gaps bytes"
    pos_enc = binary_from_spans(pbytes, spans)
    if pos_enc.type != pa.binary():
        raise ValueError(
            "compaction batch exceeds the int32 binary-offset range; lower "
            "the read batch size so runs keep the uniform binary pos_enc type")

    # term per posting + sgroup (hash unique terms once, like the tokenizer)
    tenc = batch["term"].dictionary_encode().combine_chunks()
    codes = tenc.indices.to_numpy(zero_copy_only=False)
    uniq_terms = tenc.dictionary.cast(pa.string())
    sg_u = (hash_strings_arrow(uniq_terms) % np.uint64(n_units)).astype(np.int64)
    post_codes = np.repeat(codes, n_post)
    terms = uniq_terms.take(pa.array(post_codes))
    sgroup = sg_u[post_codes]

    out = pa.table({
        "term": terms,
        "doc_id": pa.array(doc_ids, pa.int64()),
        "pos_enc": pos_enc,
        "sgroup": pa.array(sgroup, pa.int64()),
    })
    if drop_ref is not None:
        drop = ray.get(drop_ref) if not isinstance(drop_ref, np.ndarray) else drop_ref
        if len(drop):
            keep = ~np.isin(doc_ids, drop)
            if not keep.all():
                out = out.filter(pa.array(keep))
    return out


def compact(root: str, config: EngineConfig | None = None) -> str:
    """Merge all segments (minus tombstoned docs) into one new segment.

    Writes the stage-1 artifacts (runs/, docs/, dict_partials/) from the
    existing segments' postings + doc tables, stamps their manifests, then
    resumes build_index — the dictionary, postings-merge and stats stages
    run exactly as in a fresh build, so the compacted segment is
    value-identical to a from-scratch index over the surviving docs (with
    the original doc_ids kept, which a fresh build reproduces whenever no
    doc was deleted)."""
    config = config or EngineConfig()
    segs = read_segments(root)
    if not segs:
        raise ValueError(f"no segments under {root}")
    tombs = load_tombstones(root)
    n_units = min(config.merge_units, config.index_shards)
    name = f"seg-{len(segs):05d}"
    out = segment_dir(root, name)
    paths = IndexPaths(out)
    sentinel = "<compact:%s:%s>" % (
        ",".join(s["name"] for s in segs),
        manifests.fingerprint(*(int(t) for t in tombs)) if len(tombs) else "none",
    )
    # must mirror build_index's fingerprint derivation exactly (doc_id_base=0)
    cfg_fp = manifests.fingerprint(config, 0)
    in_fp = manifests.fingerprint(sentinel, cfg_fp)

    for d in (paths.runs, paths.docs, paths.dict_partials):
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d, exist_ok=True)
    shutil.rmtree(paths.postings, ignore_errors=True)
    shutil.rmtree(paths.dictionary, ignore_errors=True)

    drop_ref = ray.put(np.sort(tombs)) if len(tombs) else None
    seg_dirs = [segment_dir(root, s["name"]) for s in segs]

    # runs: stream every segment's chunk rows through the reconstruction
    chunk_cols = ["term", "n_postings", "doc_gaps", "pos_lens", "pos_gaps"]
    runs_parts = []
    for d in seg_dirs:
        ds = ray.data.read_parquet(IndexPaths(d).postings, columns=chunk_cols)
        runs_parts.append(ds.map_batches(
            lambda b: _chunks_to_runs(b, n_units, drop_ref),
            batch_format="pyarrow"))
    runs = runs_parts[0]
    for p in runs_parts[1:]:
        runs = runs.union(p)
    runs.write_parquet(paths.runs, partition_cols=["sgroup"])

    # docs: union of segment doc tables, tombstones dropped
    def doc_filter(b: pa.Table) -> pa.Table:
        b = b.combine_chunks()
        if drop_ref is None or b.num_rows == 0:
            return b
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        keep = ~np.isin(ids, ray.get(drop_ref))
        return b if keep.all() else b.filter(pa.array(keep))

    docs_parts = [ray.data.read_parquet(IndexPaths(d).docs,
                                        columns=["doc_id", "url", "doc_length"])
                  for d in seg_dirs]
    docs = docs_parts[0]
    for p in docs_parts[1:]:
        docs = docs.union(p)
    docs.map_batches(doc_filter, batch_format="pyarrow").write_parquet(paths.docs)

    # dict_partials: per-block (term, df_part) combiners from the new runs
    def partials(b: pa.Table) -> pa.Table:
        b = b.combine_chunks()
        if b.num_rows == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "df_part": pa.array([], pa.int64())})
        enc = b["term"].dictionary_encode().combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        cnt = np.bincount(codes, minlength=len(enc.dictionary))
        return pa.table({"term": enc.dictionary.cast(pa.string()),
                         "df_part": pa.array(cnt.astype(np.int64), pa.int64())})

    import glob as _glob

    if _glob.glob(os.path.join(paths.runs, "**", "*.parquet"), recursive=True):
        ray.data.read_parquet(paths.runs, columns=["term"]).map_batches(
            partials, batch_format="pyarrow").write_parquet(paths.dict_partials)

    # schema-stable empties (mirrors build_index._ensure_nonempty)

    import pyarrow.parquet as _pq

    if not _glob.glob(os.path.join(paths.docs, "**", "*.parquet"), recursive=True):
        _pq.write_table(pa.table({"doc_id": pa.array([], pa.int64()),
                                  "url": pa.array([], pa.string()),
                                  "doc_length": pa.array([], pa.int64())}),
                        os.path.join(paths.docs, "empty.parquet"))
    if not _glob.glob(os.path.join(paths.dict_partials, "**", "*.parquet"),
                      recursive=True):
        _pq.write_table(pa.table({"term": pa.array([], pa.string()),
                                  "df_part": pa.array([], pa.int64())}),
                        os.path.join(paths.dict_partials, "empty.parquet"))

    manifests.write_manifest(paths.docs, "docs", in_fp)
    manifests.write_manifest(paths.dict_partials, "dict_partials", in_fp)
    manifests.write_manifest(paths.runs, "runs", in_fp)

    # stages 3–5 (dictionary, postings merge, stats) run as a normal resume
    build_index(sentinel, out, config, resume=True)

    st = load_stats(out)
    _write_segments(root, [{
        "name": name,
        "doc_id_base": 0,
        "num_docs": st["num_docs"],
        "total_tokens": st["total_tokens"],
    }])
    p = os.path.join(root, TOMBSTONES_FILE)
    if os.path.exists(p):
        os.remove(p)
    # old segments stay on disk until explicitly removed (crash-safe: the
    # manifest flip above is the commit point)
    for d in seg_dirs:
        shutil.rmtree(d, ignore_errors=True)
    return out
