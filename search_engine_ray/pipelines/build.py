"""End-to-end index build pipeline (the reference's SearchEngine::build_index,
/root/reference/src/search_engine/mod.rs:41-44 → indexer.rs:193-210, re-shaped
for Ray Data streaming execution; SURVEY.md §7.1):

  webpages parquet (url, warc_ts, html, text, lang)
    → extract (stateless map_batches) → sort(url) → ONE fused task wave that
      stamps deterministic doc_ids AND tokenizes (two outputs per task)
      → runs/  (postings rows ≈ the reference's VB spill runs)  [checkpoint]
      → docs/  (doc_id, url doc metadata)                       [checkpoint]
    → merge: sort(term, doc_id) + vectorized multi-group kernel
      → postings/ (≤128-posting VB chunks with skip metadata)   [checkpoint]
    → dictionary/ (term, term_id = dense rank, df, n_chunks)  ┐ concurrent
      doc_lengths/ (doc_id, doc_length)                       ┘ threads
    → stats.json (N, total tokens, avgdl)

Each stage writes parquet + a lineage manifest; ``build_index(resume=True)``
skips stages whose manifest is complete with a matching fingerprint
(state/manifests.py). The small aggregations (dictionary, doc_lengths) are
size-gated: below ``_small_corpus`` they finish driver-side on pre-reduced
partials (sort/shuffle barriers cost more than the data); above it fully
distributed vectorized paths run (stages/grouped.py — Ray's per-group
aggregate was measured at ~80s for 480k groups, the vectorized path ~3s).
"""

from __future__ import annotations

import json
import os
import time

import ray
import ray.data

from search_engine_ray.config import EngineConfig
from search_engine_ray.stages.doc_ids import zip_with_index
from search_engine_ray.stages.extract import extract_stage
from search_engine_ray.stages.merge import merge_postings
from search_engine_ray.state import manifests


@ray.remote(num_returns=2)
def _stamp_and_tokenize(block, offset: int, lemma_path):
    """One fused task per sorted block: stamp doc_id = offset + row rank
    (zip_with_index semantics, stages/doc_ids.py), tokenize the block, and
    return (postings_table, doc_meta_table)."""
    import numpy as np
    import pyarrow as pa

    from search_engine_ray.stages.tokenize import get_worker_tokenizer, tokenize_batch

    if not isinstance(block, pa.Table):
        block = pa.Table.from_pandas(block, preserve_index=False)
    ids = pa.array(np.arange(offset, offset + block.num_rows, dtype=np.int64), type=pa.int64())
    if "doc_id" in block.column_names:
        block = block.drop_columns(["doc_id"])
    block = block.append_column("doc_id", ids)
    postings = tokenize_batch(block, get_worker_tokenizer(lemma_path))
    doc_meta = block.select(["doc_id", "url"])
    return postings, doc_meta


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
    """Run ``producer(out_dir)`` unless a matching complete manifest exists.

    A (re)build always starts from an EMPTY stage dir: a stale or
    partial previous attempt (different fingerprint, crash mid-write, older
    format) would otherwise leave its parquet files mixed in with the new
    ones."""
    if resume and manifests.stage_complete(paths_dir, fp):
        return
    import shutil

    shutil.rmtree(paths_dir, ignore_errors=True)
    os.makedirs(paths_dir, exist_ok=True)
    t0 = time.perf_counter()
    producer(paths_dir)
    if os.environ.get("SE_RAY_TIMING"):
        print(f"[stage {name}] {time.perf_counter() - t0:.1f}s", flush=True)
    manifests.write_manifest(paths_dir, name, fp)


def _small_corpus(paths: "IndexPaths", threshold_docs: int = 5_000_000) -> bool:
    """True when the docs manifest reports a corpus small enough that tiny
    aggregations are cheaper finished driver-side than through shuffle
    barriers. A documented scale decision, not a correctness fork — both
    paths are tested equal."""
    m = manifests.read_manifest(paths.docs)
    n = (m or {}).get("num_rows") or 0
    return 0 < n <= threshold_docs


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

    # ---- stage 1+2 (fused): extract → sort(url) → ONE task wave that both
    # stamps deterministic doc_ids and tokenizes (two outputs per task:
    # postings runs + doc_meta). Fusing removes a checkpoint write+re-read
    # and a separate stamping wave — the dominant fixed costs at small
    # scale, and one less full pass over the corpus at any scale. ----------
    def produce_docs_and_runs() -> None:
        import threading

        import numpy as np

        if isinstance(input_path, str):
            pages = ray.data.read_parquet(input_path, columns=["url", "html"])
        else:
            pages = input_path.select_columns(["url", "html"])
        extracted = extract_stage(pages, html_col="html").drop_columns(["html"])
        # coalesce before the sort: n_blocks² exchange objects otherwise
        # (same small-object storm as the merge sort — stages/merge.py)
        try:
            ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        except Exception:  # pragma: no cover
            ncpu = 8
        extracted = extracted.repartition(max(16, 2 * ncpu))
        sorted_ds = extracted.sort("url").materialize()
        block_refs, counts = [], []
        for bundle in sorted_ds.iter_internal_ref_bundles():
            for block_ref, meta in bundle.blocks:
                block_refs.append(block_ref)
                counts.append(meta.num_rows)
        offsets = 1 + np.concatenate([[0], np.cumsum(counts)[:-1]]) if counts else []
        outs = [
            _stamp_and_tokenize.remote(ref, int(off), config.lemma_path)
            for ref, off in zip(block_refs, offsets)
        ]
        runs_ds = ray.data.from_arrow_refs([o[0] for o in outs]) if outs else None
        docs_ds = ray.data.from_arrow_refs([o[1] for o in outs]) if outs else None
        import shutil

        # always start from empty dirs (stale/partial prior attempts)
        shutil.rmtree(paths.runs, ignore_errors=True)
        shutil.rmtree(paths.docs, ignore_errors=True)
        os.makedirs(paths.runs, exist_ok=True)
        os.makedirs(paths.docs, exist_ok=True)

        def wdocs():
            if docs_ds is not None:
                docs_ds.write_parquet(paths.docs, **write_kwargs)

        t = threading.Thread(target=wdocs)
        t.start()
        if runs_ds is not None:
            runs_ds.write_parquet(paths.runs, **write_kwargs)
        t.join()
        manifests.write_manifest(paths.docs, "docs", in_fp)
        manifests.write_manifest(paths.runs, "runs", in_fp)

    if not (resume and manifests.stage_complete(paths.runs, in_fp)
            and manifests.stage_complete(paths.docs, in_fp)):
        t0 = time.perf_counter()
        produce_docs_and_runs()
        if os.environ.get("SE_RAY_TIMING"):
            print(f"[stage docs+runs] {time.perf_counter() - t0:.1f}s", flush=True)

    # ---- stage 3: merge shuffle → chunked postings index ------------------
    def produce_postings(d: str) -> None:
        runs = ray.data.read_parquet(paths.runs)
        merge_postings(runs, config).write_parquet(d, **write_kwargs)

    _stage(paths.postings, "postings", in_fp, resume, produce_postings)

    # ---- stage 4: dictionary (df + dense 1-based term_id by sorted term) --
    # partial+final aggregate: per-BLOCK partial combine shrinks the final
    # aggregation input to ~n_blocks × vocab rows (ray_guide.md).
    def produce_dictionary(d: str) -> None:
        import numpy as np
        import pandas as pd
        import pyarrow as pa

        chunks = ray.data.read_parquet(paths.postings, columns=["term", "n_postings"])

        def partial(batch: pd.DataFrame) -> pd.DataFrame:
            g = batch.groupby("term", sort=False)["n_postings"].agg(["sum", "size"])
            return g.rename(columns={"sum": "df_part", "size": "nc_part"}).reset_index()

        partials = chunks.map_batches(partial, batch_format="pandas", batch_size=None).materialize()

        # gate on the MEASURED partial row count (≈ n_blocks × vocab), not
        # doc count: a 10M-term vocab × hundreds of blocks would be GBs on
        # the driver even for a "small" corpus.
        if partials.count() <= 8_000_000:
            # small-side fast path: finish on the driver
            import pyarrow.parquet as pq

            pdf = partials.to_pandas()
            g = (pdf.groupby("term", sort=True)[["df_part", "nc_part"]].sum()
                 .reset_index().rename(columns={"df_part": "df", "nc_part": "n_chunks"}))
            g["term_id"] = np.arange(1, len(g) + 1, dtype=np.int64)
            g = g.astype({"df": np.int64, "n_chunks": np.int64})
            pq.write_table(pa.Table.from_pandas(g, preserve_index=False),
                           os.path.join(d, "dictionary.parquet"))
            return

        # distributed path: vectorized per-term sums over the sorted stream
        from search_engine_ray.stages.grouped import sorted_group_map

        def sum_per_term(batch: pa.Table) -> pa.Table:
            batch = batch.combine_chunks()
            if batch.num_rows == 0:
                return pa.table(
                    {"term": pa.array([], pa.string()), "df": pa.array([], pa.int64()),
                     "n_chunks": pa.array([], pa.int64())}
                )
            enc = batch["term"].dictionary_encode().combine_chunks()
            codes = enc.indices.to_numpy(zero_copy_only=False)
            change = np.empty(len(codes), bool)
            change[0] = True
            np.not_equal(codes[1:], codes[:-1], out=change[1:])
            starts = np.flatnonzero(change)
            df = np.add.reduceat(batch["df_part"].to_numpy(zero_copy_only=False), starts)
            nc = np.add.reduceat(batch["nc_part"].to_numpy(zero_copy_only=False), starts)
            return pa.table(
                {
                    "term": enc.dictionary.take(pa.array(codes[starts])).cast(pa.string()),
                    "df": pa.array(df.astype(np.int64), pa.int64()),
                    "n_chunks": pa.array(nc.astype(np.int64), pa.int64()),
                }
            )

        agg = sorted_group_map(partials, ["term"], sum_per_term)
        with_ids = zip_with_index(agg, "term", "term_id", start=1)
        with_ids.write_parquet(d, **write_kwargs)

    # ---- stage 5: doc lengths (from runs, column-pruned; sentinels keep
    #               zero-token docs present — indexer.rs:109-116) -----------
    def produce_doc_lengths(d: str) -> None:
        import numpy as np
        import pyarrow as pa

        runs = ray.data.read_parquet(paths.runs, columns=["doc_id", "doc_length"])
        dedup = runs.map_batches(
            lambda b: b.drop_duplicates("doc_id"), batch_format="pandas", batch_size=None
        )

        if _small_corpus(paths):
            import pyarrow.parquet as pq

            pdf = dedup.to_pandas().drop_duplicates("doc_id")
            pdf = pdf.astype({"doc_id": np.int64, "doc_length": np.int64})
            pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                           os.path.join(d, "doc_lengths.parquet"))
            return

        # distributed path: vectorized keep-first over the sorted stream —
        # a groupby(doc_id).aggregate means num_docs GROUPS (measured ~80s
        # for 480k groups on Ray's per-group aggregate path)
        from search_engine_ray.stages.grouped import sorted_group_map

        def first_per_doc(batch: pa.Table) -> pa.Table:
            batch = batch.combine_chunks()
            if batch.num_rows == 0:
                return batch
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            keep = np.empty(len(ids), bool)
            keep[0] = True
            np.not_equal(ids[1:], ids[:-1], out=keep[1:])
            return batch.take(pa.array(np.flatnonzero(keep)))

        lengths = sorted_group_map(dedup, ["doc_id"], first_per_doc)
        lengths.write_parquet(d, **write_kwargs)

    # dictionary + doc_lengths are independent — run them concurrently (two
    # driver threads, two simultaneous Dataset executions).
    import threading

    errors: list[BaseException] = []

    def _run(stage_dir, name, producer):
        try:
            _stage(stage_dir, name, in_fp, resume, producer)
        except BaseException as e:  # surface on the driver thread
            errors.append(e)

    threads = [
        threading.Thread(target=_run, args=(paths.dictionary, "dictionary", produce_dictionary)),
        threading.Thread(target=_run, args=(paths.doc_lengths, "doc_lengths", produce_doc_lengths)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if errors:
        raise errors[0]

    # ---- stage 6: corpus stats (one aggregation pass). Resume must check
    # the stored fingerprint, not just existence: a rebuild with different
    # input/config regenerates every stage and would otherwise keep stale
    # stats.json (wrong N/avgdl silently skews BM25). ----------------------
    def _stats_current() -> bool:
        try:
            return load_stats(out_dir).get("fingerprint") == in_fp
        except (FileNotFoundError, json.JSONDecodeError):
            return False

    if not (resume and _stats_current()):
        from ray.data.aggregate import Count, Sum

        lengths = ray.data.read_parquet(paths.doc_lengths)
        agg_row = lengths.aggregate(Count(alias_name="n"), Sum("doc_length", alias_name="s"))
        num_docs = int(agg_row["n"] or 0)
        total_tokens = int(agg_row["s"] or 0)
        stats = {
            "num_docs": num_docs,
            "total_tokens": total_tokens,
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
