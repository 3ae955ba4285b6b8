"""Cross-document CDC-chunk dedup (corpus_clean.dedup_chunks_global)."""

import numpy as np
import pyarrow as pa
import pytest

from search_engine_ray.functions.cdc import cdc_boundaries
from search_engine_ray.functions.hashing import poly_hash_str
from search_engine_ray.pipelines.corpus_clean import (
    _utf8_align,
    dedup_chunks_global,
)

KW = dict(min_size=32, avg_bits=5, max_size=128)


def _spec(texts_by_id, **kw):
    """Scalar first-occurrence spec: chunk each doc (utf8-aligned CDC),
    drop every chunk whose content appeared at a smaller (doc_id,
    chunk_idx); return {doc_id: (clean_text, n_removed)}."""
    seen = {}
    chunks_by_doc = {}
    for did in sorted(texts_by_id):
        raw = texts_by_id[did].encode("utf-8")
        seg = np.frombuffer(raw, np.uint8)
        ends = _utf8_align(seg, cdc_boundaries(seg, **kw)) if len(seg) else []
        prev, doc_chunks = 0, []
        for j, e in enumerate(ends):
            body = raw[prev:e]
            h = poly_hash_str(body.decode("utf-8"))
            doc_chunks.append((h, body))
            seen.setdefault(h, (did, j))
            prev = int(e)
        chunks_by_doc[did] = doc_chunks
    out = {}
    for did, doc_chunks in chunks_by_doc.items():
        kept, removed = [], 0
        for j, (h, body) in enumerate(doc_chunks):
            if seen[h] == (did, j):
                kept.append(body)
            else:
                removed += 1
        out[did] = (b"".join(kept).decode("utf-8"), removed)
    return out


def _mk_texts():
    rng = np.random.default_rng(31)

    def rand_text(n):
        return "".join(chr(97 + c) for c in rng.integers(0, 26, n))

    boiler = rand_text(700)
    texts = {}
    # boilerplate at DIFFERENT byte offsets per doc (insertion robustness)
    for i, pre in enumerate((0, 13, 250, 401)):
        texts[i + 1] = rand_text(pre) + boiler + rand_text(300)
    texts[5] = rand_text(500)            # clean doc
    texts[6] = ""                        # empty doc round-trips
    texts[7] = "é" * 400 + boiler        # multi-byte chars + shared tail
    return texts


def _run(texts, ray_session, **extra):
    import ray.data

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(sorted(texts), pa.int64()),
        "text": pa.array([texts[k] for k in sorted(texts)])}))
    out = dedup_chunks_global(ds, **KW, **extra).to_pandas()
    return out.sort_values("doc_id").set_index("doc_id")


def test_matches_scalar_spec_broadcast(ray_session):
    texts = _mk_texts()
    out = _run(texts, ray_session)
    spec = _spec(texts, **KW)
    for did, (clean, removed) in spec.items():
        assert out.loc[did, "text_clean"] == clean, did
        assert out.loc[did, "n_removed"] == removed, did
    # the boilerplate really was removed from the later docs
    assert out.loc[2, "n_removed"] > 0
    assert out.loc[5, "n_removed"] == 0
    assert out.loc[6, "text_clean"] == ""


def test_scale_path_matches_broadcast(ray_session):
    texts = _mk_texts()
    a = _run(texts, ray_session)
    b = _run(texts, ray_session, broadcast_cap=0)   # force co-group path
    assert a.sort_index().equals(b.sort_index())


def test_no_duplicates_roundtrips(ray_session):
    rng = np.random.default_rng(32)
    texts = {i: "".join(chr(97 + c) for c in rng.integers(0, 26, 400))
             for i in range(1, 6)}
    out = _run(texts, ray_session)
    for did, t in texts.items():
        assert out.loc[did, "text_clean"] == t
        assert out.loc[did, "n_removed"] == 0


def test_insertion_shifted_boilerplate_still_caught(ray_session):
    # the line-dedup failure mode: shared passage not line-aligned and at
    # different offsets — CDC must still drop most of it from the copy
    rng = np.random.default_rng(33)
    boiler = "".join(chr(97 + c) for c in rng.integers(0, 26, 1500))
    texts = {1: "x" + boiler, 2: "yyyyyyy" + boiler}
    out = _run(texts, ray_session)
    # doc 2 keeps its prefix but loses the resynced boilerplate chunks
    assert out.loc[2, "n_removed"] >= 5
    assert len(out.loc[2, "text_clean"]) < len(texts[2]) // 2
    assert out.loc[1, "n_removed"] <= 1   # first occurrence survives


def test_utf8_alignment_never_splits_codepoints():
    seg = np.frombuffer(("é" * 300).encode("utf-8"), np.uint8)
    ends = _utf8_align(seg, cdc_boundaries(seg, **KW))
    assert int(ends[-1]) == len(seg)
    prev = 0
    for e in ends:
        seg[prev:e].tobytes().decode("utf-8")   # raises if split
        prev = int(e)
