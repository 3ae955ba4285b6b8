"""Passage (chunk-level) retrieval: the RAG serving shape.

Long documents retrieve poorly as whole units — RAG stacks index
PASSAGES and return (document, chunk, offset) provenance. This module
composes two things the engine already has: sliding-window chunking with
provenance offsets (training_data.chunk_documents) and the standard
SPIMI build + BM25 serving (pipelines/build.py, query/engine.py). Each
chunk becomes its own "webpage" whose url ENCODES the provenance
(passage://{doc:012d}/{chunk:06d}); url rank order == (doc_id, chunk_idx)
order, so the index's dense passage ids are deterministic, and serving
maps hits back to (doc_id, chunk_idx, start_tok) by url — no side table.

Scale shape: chunking is a row-local flat expansion (no shuffle); the
build is the standard pipeline at chunk granularity (num_docs becomes
the chunk count — every partitioning/merge property carries over
unchanged because the engine never assumes anything about what a
"document" is).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from search_engine_ray.config import EngineConfig
from search_engine_ray.functions.textproc import synthesize_html
from search_engine_ray.query.engine import SearchEngine

PASSAGE_URL_FMT = "passage://{doc:012d}/{chunk:06d}"


def passage_url(doc_id: int, chunk_idx: int) -> str:
    return PASSAGE_URL_FMT.format(doc=int(doc_id), chunk=int(chunk_idx))


def parse_passage_url(url: str) -> tuple[int, int]:
    doc, chunk = url[len("passage://"):].split("/")
    return int(doc), int(chunk)


def build_passage_index(docs, out_dir: str, config: EngineConfig | None = None,
                        window: int = 64, overlap: int = 16,
                        id_col: str = "doc_id", text_col: str = "text",
                        resume: bool = True):
    """Chunk → webpages rows → standard build; returns the IndexPaths.
    ``docs`` is a Dataset with (id_col, text_col)."""
    from search_engine_ray.pipelines.build import build_index
    from search_engine_ray.pipelines.training_data import chunk_documents

    chunks = chunk_documents(docs, window=window, overlap=overlap,
                             id_col=id_col, text_col=text_col)

    def to_pages(b: pa.Table) -> pa.Table:
        b = b.combine_chunks()
        ids = b[id_col].to_numpy(zero_copy_only=False)
        cidx = b["chunk_idx"].to_numpy(zero_copy_only=False)
        urls = [passage_url(d, c) for d, c in zip(ids, cidx)]
        htmls = [synthesize_html(t or "").encode("utf-8")
                 for t in b["text"].to_pylist()]
        return pa.table({"url": pa.array(urls, pa.string()),
                         "html": pa.array(htmls, pa.binary())})

    return build_index(chunks.map_batches(to_pages, batch_format="pyarrow"),
                       out_dir, config, resume=resume)


class PassageEngine:
    """BM25 serving over a passage index with provenance mapping: results
    are (doc_id, chunk_idx, score) — every SearchEngine query mode remains
    reachable through ``.engine``."""

    def __init__(self, index_dir: str, config: EngineConfig | None = None):
        self.engine = SearchEngine(index_dir, config)

    def _provenance(self, hits: list[tuple[int, float]]
                    ) -> list[tuple[int, int, float]]:
        urls = self.engine.doc_urls([d for d, _ in hits])
        out = []
        for (pid, score), url in zip(hits, urls):
            doc, chunk = parse_passage_url(url)
            out.append((doc, chunk, float(score)))
        return out

    def bm25_topk(self, query: str, k: int = 10) -> list[tuple[int, int, float]]:
        """Top-k passages by BM25 (chunk-level df/avgdl/N), mapped back to
        (doc_id, chunk_idx, score) in the engine's rank order."""
        return self._provenance(self.engine.bm25_topk(query, k))

    def bm25_topk_per_doc(self, query: str, k: int = 10, per_doc: int = 1,
                          pool: int | None = None
                          ) -> list[tuple[int, int, float]]:
        """Document-collapsed passage retrieval: at most ``per_doc``
        passages per source document (the RAG dedup-by-source discipline),
        greedy over passage rank order. ``pool=None`` scans the full
        ranking (exact); an integer bounds the candidate pool (the
        practical serving mode — same contract as bm25_topk_capped's
        digits-free greedy)."""
        pool = self._provenance(
            self.engine.bm25_topk(query, 10_000_000 if pool is None else pool))
        seen: dict[int, int] = {}
        out = []
        for doc, chunk, score in pool:
            if seen.get(doc, 0) >= per_doc:
                continue
            seen[doc] = seen.get(doc, 0) + 1
            out.append((doc, chunk, score))
            if len(out) >= k:
                break
        return out
