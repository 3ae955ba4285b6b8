"""End-to-end index build pipeline (the reference's SearchEngine::build_index,
/root/reference/src/search_engine/mod.rs:41-44 → indexer.rs:193-210, re-shaped
for Ray Data streaming execution; SURVEY.md §7.1):

  webpages parquet (url, warc_ts, html, text, lang)
    → extract (stateless map_batches, zero-copy Arrow)
    → zip_with_index(url) → docs/        [checkpoint: doc ids + text]
    → tokenize (actor pool) → runs/      [checkpoint: SPIMI runs ≈ spill files]
    → groupby(term, salt).map_groups → postings/ (chunked, VB)  [checkpoint]
    → dictionary/ (term, term_id, df, n_chunks) + doc_lengths/ + stats.json

Each stage writes parquet + a lineage manifest; ``build_index(resume=True)``
skips stages whose manifest is complete with a matching fingerprint
(state/manifests.py). The runs/ checkpoint doubles as the input for
doc-length derivation (column-pruned re-read — no second tokenization).
"""

from __future__ import annotations

import json
import os

import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Max, Sum

from search_engine_ray.config import EngineConfig
from search_engine_ray.stages.doc_ids import zip_with_index
from search_engine_ray.stages.extract import extract_stage
from search_engine_ray.stages.merge import merge_postings
from search_engine_ray.stages.tokenize import tokenize_stage
from search_engine_ray.state import manifests


class IndexPaths:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.docs = os.path.join(out_dir, "docs")
        self.runs = os.path.join(out_dir, "runs")
        self.postings = os.path.join(out_dir, "postings")
        self.dictionary = os.path.join(out_dir, "dictionary")
        self.doc_lengths = os.path.join(out_dir, "doc_lengths")
        self.stats = os.path.join(out_dir, "stats.json")


def _stage(paths_dir: str, name: str, fp: str, resume: bool, producer) -> None:
    """Run ``producer(out_dir)`` unless a matching complete manifest exists."""
    if resume and manifests.stage_complete(paths_dir, fp):
        return
    os.makedirs(paths_dir, exist_ok=True)
    producer(paths_dir)
    manifests.write_manifest(paths_dir, name, fp)


def build_index(
    input_path: str | "ray.data.Dataset",
    out_dir: str,
    config: EngineConfig | None = None,
    resume: bool = False,
) -> IndexPaths:
    """Build the full inverted index under ``out_dir``; returns its layout."""
    config = config or EngineConfig()
    paths = IndexPaths(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    cfg_fp = manifests.fingerprint(config)
    in_fp = manifests.fingerprint(input_path if isinstance(input_path, str) else "<dataset>", cfg_fp)
    write_kwargs = {}
    if config.min_rows_per_file:
        write_kwargs["min_rows_per_file"] = config.min_rows_per_file

    # ---- stage 1: extract + deterministic doc ids -------------------------
    def produce_docs(d: str) -> None:
        if isinstance(input_path, str):
            pages = ray.data.read_parquet(input_path, columns=["url", "html"])
        else:
            pages = input_path.select_columns(["url", "html"])
        extracted = extract_stage(pages, html_col="html").drop_columns(["html"])
        docs = zip_with_index(extracted, "url", "doc_id", start=1)
        docs.write_parquet(d, **write_kwargs)

    _stage(paths.docs, "docs", in_fp, resume, produce_docs)

    # ---- stage 2: tokenize → postings runs (SPIMI spill equivalent) -------
    def produce_runs(d: str) -> None:
        docs = ray.data.read_parquet(paths.docs, columns=["doc_id", "text"])
        tokenize_stage(docs, config).write_parquet(d, **write_kwargs)

    _stage(paths.runs, "runs", in_fp, resume, produce_runs)

    # ---- stage 3: merge shuffle → chunked postings index ------------------
    def produce_postings(d: str) -> None:
        runs = ray.data.read_parquet(paths.runs)
        merge_postings(runs, config).write_parquet(d, **write_kwargs)

    _stage(paths.postings, "postings", in_fp, resume, produce_postings)

    # ---- stage 4: dictionary (df + dense 1-based term_id by sorted term) --
    # partial+final aggregate: per-batch combine shrinks the shuffle input
    # from one row per chunk to one row per (batch, term) (ray_guide.md).
    def produce_dictionary(d: str) -> None:
        import pandas as pd

        chunks = ray.data.read_parquet(paths.postings, columns=["term", "n_postings"])

        def partial(batch: pd.DataFrame) -> pd.DataFrame:
            g = batch.groupby("term", sort=False)["n_postings"].agg(["sum", "size"])
            return g.rename(columns={"sum": "df_part", "size": "nc_part"}).reset_index()

        agg = chunks.map_batches(partial, batch_format="pandas").groupby("term").aggregate(
            Sum("df_part", alias_name="df"), Sum("nc_part", alias_name="n_chunks")
        )
        with_ids = zip_with_index(agg, "term", "term_id", start=1)
        with_ids.write_parquet(d, **write_kwargs)

    _stage(paths.dictionary, "dictionary", in_fp, resume, produce_dictionary)

    # ---- stage 5: doc lengths (from runs, column-pruned; sentinels keep
    #               zero-token docs present — indexer.rs:109-116) -----------
    # partial dedup per batch first: a doc's postings rows are colocated, so
    # the shuffle input shrinks from one row per posting to ~one per doc.
    def produce_doc_lengths(d: str) -> None:
        import pandas as pd

        runs = ray.data.read_parquet(paths.runs, columns=["doc_id", "doc_length"])
        dedup = runs.map_batches(
            lambda b: b.drop_duplicates("doc_id"), batch_format="pandas"
        )
        lengths = dedup.groupby("doc_id").aggregate(Max("doc_length", alias_name="doc_length"))
        lengths.write_parquet(d, **write_kwargs)

    _stage(paths.doc_lengths, "doc_lengths", in_fp, resume, produce_doc_lengths)

    # ---- stage 6: corpus stats --------------------------------------------
    if not (resume and os.path.exists(paths.stats)):
        lengths = ray.data.read_parquet(paths.doc_lengths)
        num_docs = lengths.count()
        total_tokens = lengths.sum("doc_length") or 0
        stats = {
            "num_docs": int(num_docs),
            "total_tokens": int(total_tokens),
            "avgdl": (total_tokens / num_docs) if num_docs else 0.0,
            "config": {"chunk_size": config.chunk_size, "salt_span": config.salt_span,
                       "bm25_k1": config.bm25_k1, "bm25_b": config.bm25_b},
            "fingerprint": in_fp,
        }
        tmp = paths.stats + ".tmp"
        with open(tmp, "w") as f:
            json.dump(stats, f, indent=1)
        os.replace(tmp, paths.stats)

    return paths


def load_stats(out_dir: str) -> dict:
    with open(IndexPaths(out_dir).stats) as f:
        return json.load(f)
