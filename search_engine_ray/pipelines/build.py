"""End-to-end index build pipeline (the reference's SearchEngine::build_index,
/root/reference/src/search_engine/mod.rs:41-44 → indexer.rs:193-210, re-shaped
for Ray Data streaming execution; SURVEY.md §7.1):

  webpages parquet (url, warc_ts, html, text, lang)
    → extract (stateless map_batches) → sort(url) → ONE fused task wave that
      stamps deterministic doc_ids AND tokenizes (two outputs per task)
      → runs/shard=K/ hash-sharded postings rows (term, doc_id, pos_enc);
        shard = poly_hash(term) % index_shards                 [checkpoint]
      → docs/  (doc_id, url, doc_length)                       [checkpoint]
    → dictionary/ (term, term_id = dense rank, df, shard) from the runs'
      term column (column-pruned read, partial+final count)    [checkpoint]
    → postings/shard=K/: PER-SHARD int-keyed merge — sort(term_id, doc_id)
      + vectorized multi-group kernel → ≤128-posting VB chunks. Each shard
      is an independent job with its own lineage manifest: a killed build
      resumes by re-running ONLY the incomplete shards (per-partition
      lineage, the reference has nothing comparable). The term STRING never
      rides the merge shuffle (stages/merge.py:merge_shard_postings).
    → doc_lengths/ (projected from docs)        ┐ concurrent with postings
    → stats.json (N, total tokens, avgdl)

Each stage writes parquet + a lineage manifest; ``build_index(resume=True)``
skips stages (and individual postings shards) whose manifest is complete
with a matching fingerprint (state/manifests.py). The hash-shard key is the
ONE partitioning key reused across build and serving: the query engine maps
term → shard with the same hash and reads only that shard's row groups
(query/locator.py).
"""

from __future__ import annotations

import json
import os
import time

import ray
import ray.data

from search_engine_ray.config import EngineConfig
from search_engine_ray.stages.extract import extract_stage
from search_engine_ray.state import manifests


@ray.remote(num_returns=2)
def _stamp_and_tokenize(block, offset: int, lemma_path, n_shards: int):
    """One fused task per sorted block: stamp doc_id = offset + row rank
    (zip_with_index semantics, stages/doc_ids.py), tokenize the block, and
    return (runs_table, doc_meta_table).

    runs rows are (term, doc_id, pos_enc, shard) — sentinel rows are dropped
    here (doc_length now rides on doc_meta, so they carry no information)
    and the hash shard is stamped so the write lands hive-partitioned."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from search_engine_ray.functions.hashing import hash_strings_arrow
    from search_engine_ray.stages.tokenize import get_worker_tokenizer, tokenize_batch

    if not isinstance(block, pa.Table):
        block = pa.Table.from_pandas(block, preserve_index=False)
    ids = pa.array(np.arange(offset, offset + block.num_rows, dtype=np.int64), type=pa.int64())
    if "doc_id" in block.column_names:
        block = block.drop_columns(["doc_id"])
    block = block.append_column("doc_id", ids)
    postings = tokenize_batch(block, get_worker_tokenizer(lemma_path))

    # doc metadata: every doc appears in postings (zero-token docs as
    # sentinel rows), so first-occurrence per doc_id recovers doc_length
    pids = postings["doc_id"].to_numpy(zero_copy_only=False)
    uniq, first_idx = np.unique(pids, return_index=True)
    assert len(uniq) == block.num_rows
    dl = postings["doc_length"].to_numpy(zero_copy_only=False)[first_idx].astype(np.int64)
    doc_meta = block.select(["doc_id", "url"]).append_column(
        "doc_length", pa.array(dl, pa.int64())
    )

    runs = postings.filter(pc.not_equal(postings["term"], "")).select(
        ["term", "doc_id", "pos_enc"]
    )
    shard = (hash_strings_arrow(runs["term"]) % np.uint64(n_shards)).astype(np.int64)
    runs = runs.append_column("shard", pa.array(shard, pa.int64()))
    return runs, doc_meta


class IndexPaths:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.docs = os.path.join(out_dir, "docs")
        self.runs = os.path.join(out_dir, "runs")
        self.postings = os.path.join(out_dir, "postings")
        self.dictionary = os.path.join(out_dir, "dictionary")
        self.doc_lengths = os.path.join(out_dir, "doc_lengths")
        self.stats = os.path.join(out_dir, "stats.json")

    def postings_shard(self, k: int) -> str:
        return os.path.join(self.postings, f"shard={k}")


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


def build_index(
    input_path: str | "ray.data.Dataset",
    out_dir: str,
    config: EngineConfig | None = None,
    resume: bool = False,
) -> IndexPaths:
    """Build the full inverted index under ``out_dir``; returns its layout."""
    config = config or EngineConfig()
    n_shards = config.index_shards
    paths = IndexPaths(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    cfg_fp = manifests.fingerprint(config)
    in_fp = manifests.fingerprint(input_path if isinstance(input_path, str) else "<dataset>", cfg_fp)
    write_kwargs = {}
    if config.min_rows_per_file:
        write_kwargs["min_rows_per_file"] = config.min_rows_per_file

    try:
        ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:  # pragma: no cover
        ncpu = 8

    # ---- stage 1+2 (fused): extract → sort(url) → ONE task wave that both
    # stamps deterministic doc_ids and tokenizes (two outputs per task:
    # hash-sharded postings runs + doc metadata incl. doc_length). Fusing
    # removes a checkpoint write+re-read and a separate stamping wave. ------
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
        extracted = extracted.repartition(max(16, 2 * ncpu))
        sorted_ds = extracted.sort("url").materialize()
        block_refs, counts = [], []
        for bundle in sorted_ds.iter_internal_ref_bundles():
            for block_ref, meta in bundle.blocks:
                block_refs.append(block_ref)
                counts.append(meta.num_rows)
        offsets = 1 + np.concatenate([[0], np.cumsum(counts)[:-1]]) if counts else []
        outs = [
            _stamp_and_tokenize.remote(ref, int(off), config.lemma_path, n_shards)
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
            runs_ds.write_parquet(paths.runs, partition_cols=["shard"])
        t.join()
        manifests.write_manifest(paths.docs, "docs", in_fp)
        manifests.write_manifest(paths.runs, "runs", in_fp)

    if not (resume and manifests.stage_complete(paths.runs, in_fp)
            and manifests.stage_complete(paths.docs, in_fp)):
        t0 = time.perf_counter()
        produce_docs_and_runs()
        if os.environ.get("SE_RAY_TIMING"):
            print(f"[stage docs+runs] {time.perf_counter() - t0:.1f}s", flush=True)

    # ---- stage 3: dictionary (df + dense 1-based term_id by sorted term +
    # hash shard). Built BEFORE the merge from the runs' term column only
    # (parquet column pruning makes this a small dictionary-encoded read):
    # the merge then ships int64 term_ids instead of strings. -------------
    def produce_dictionary(d: str) -> None:
        import numpy as np
        import pandas as pd
        import pyarrow as pa

        from search_engine_ray.functions.hashing import hash_strings_arrow

        terms = ray.data.read_parquet(paths.runs, columns=["term"])

        def partial(batch: pa.Table) -> pa.Table:
            batch = batch.combine_chunks()
            vc = batch["term"].value_counts()
            return pa.table({"term": vc.field("values"), "df_part": vc.field("counts")})

        partials = terms.map_batches(partial, batch_format="pyarrow", batch_size=None).materialize()

        def _shard_col(term_arr: pa.Array) -> pa.Array:
            s = (hash_strings_arrow(term_arr) % np.uint64(n_shards)).astype(np.int64)
            return pa.array(s, pa.int64())

        # gate on the MEASURED partial row count (≈ n_blocks × vocab), not
        # doc count: a 10M-term vocab × hundreds of blocks would be GBs on
        # the driver even for a "small" corpus.
        if partials.count() <= 8_000_000:
            import pyarrow.parquet as pq

            pdf = partials.to_pandas()
            g = (pdf.groupby("term", sort=True)["df_part"].sum()
                 .reset_index().rename(columns={"df_part": "df"}))
            g["term_id"] = np.arange(1, len(g) + 1, dtype=np.int64)
            g = g.astype({"df": np.int64})
            t = pa.Table.from_pandas(g, preserve_index=False)
            t = t.append_column("shard", _shard_col(t["term"].combine_chunks()))
            pq.write_table(t, os.path.join(d, "dictionary.parquet"))
            return

        # distributed path: vectorized per-term sums over the sorted stream
        from search_engine_ray.stages.doc_ids import zip_with_index
        from search_engine_ray.stages.grouped import sorted_group_map

        def sum_per_term(batch: pa.Table) -> pa.Table:
            batch = batch.combine_chunks()
            if batch.num_rows == 0:
                return pa.table(
                    {"term": pa.array([], pa.string()), "df": pa.array([], pa.int64())}
                )
            enc = batch["term"].dictionary_encode().combine_chunks()
            codes = enc.indices.to_numpy(zero_copy_only=False)
            change = np.empty(len(codes), bool)
            change[0] = True
            np.not_equal(codes[1:], codes[:-1], out=change[1:])
            starts = np.flatnonzero(change)
            df = np.add.reduceat(batch["df_part"].to_numpy(zero_copy_only=False), starts)
            return pa.table(
                {
                    "term": enc.dictionary.take(pa.array(codes[starts])).cast(pa.string()),
                    "df": pa.array(df.astype(np.int64), pa.int64()),
                }
            )

        agg = sorted_group_map(partials, ["term"], sum_per_term)
        with_ids = zip_with_index(agg, "term", "term_id", start=1)

        def add_shard(batch: pa.Table) -> pa.Table:
            batch = batch.combine_chunks()
            return batch.append_column("shard", _shard_col(batch["term"]))

        with_ids.map_batches(add_shard, batch_format="pyarrow").write_parquet(d, **write_kwargs)

    _stage(paths.dictionary, "dictionary", in_fp, resume, produce_dictionary)

    # ---- stage 4: postings — per-shard int-keyed merges with per-shard
    # lineage manifests (resume re-runs ONLY incomplete shards) ------------
    def produce_postings_sharded() -> None:
        import shutil
        from concurrent.futures import ThreadPoolExecutor

        import numpy as np
        import pyarrow.parquet as pq

        from search_engine_ray.stages.merge import merge_shard_postings

        os.makedirs(paths.postings, exist_ok=True)
        todo = [
            k for k in range(n_shards)
            if not (resume and manifests.stage_complete(paths.postings_shard(k), in_fp))
        ]
        # clean anything that is not a kept (resume, fingerprint-matching)
        # shard: stale flat files from an older layout or superseded shards
        # would otherwise be double-read by whole-dir consumers
        keep = {f"shard={k}" for k in range(n_shards) if k not in set(todo)}
        for entry in os.listdir(paths.postings):
            if entry in keep:
                continue
            p = os.path.join(paths.postings, entry)
            shutil.rmtree(p, ignore_errors=True)
            if os.path.isfile(p):  # rmtree skips plain files
                os.remove(p)
        if not todo:
            if not manifests.stage_complete(paths.postings, in_fp):
                manifests.write_manifest(paths.postings, "postings", in_fp)
            return

        # driver-side dictionary slices per shard (vocab-sized; the
        # extreme-vocab path would hive-partition the dictionary by shard
        # and read slices per job — documented seam, not needed here)
        dic = pq.read_table(paths.dictionary, columns=["term", "term_id", "shard"])
        terms_np = np.asarray(dic["term"].to_pylist(), dtype=object)
        tids_np = dic["term_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        shards_np = dic["shard"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(tids_np)  # term_id rank == term sort order
        terms_np, tids_np, shards_np = terms_np[order], tids_np[order], shards_np[order]

        n_workers = min(8, max(1, len(todo)))
        n_sort_blocks = max(2, (2 * ncpu) // n_workers)

        def one_shard(k: int) -> None:
            unit_dir = paths.postings_shard(k)
            shutil.rmtree(unit_dir, ignore_errors=True)
            os.makedirs(unit_dir, exist_ok=True)
            shard_dir = os.path.join(paths.runs, f"shard={k}")
            sel = shards_np == k
            if os.path.isdir(shard_dir) and sel.any():
                runs_k = ray.data.read_parquet(
                    shard_dir, columns=["term", "doc_id", "pos_enc"]
                )
                chunks = merge_shard_postings(
                    runs_k, terms_np[sel], tids_np[sel], config,
                    n_sort_blocks=n_sort_blocks,
                )
                chunks.write_parquet(unit_dir, **write_kwargs)
            manifests.write_manifest(unit_dir, f"postings/shard={k}", in_fp)

        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=n_workers) as ex:
            futures = [ex.submit(one_shard, k) for k in todo]
            for f in futures:
                f.result()
        # stage-level manifest on top of the per-shard ones (written last:
        # its presence implies every shard completed for this fingerprint)
        manifests.write_manifest(paths.postings, "postings", in_fp)
        if os.environ.get("SE_RAY_TIMING"):
            print(f"[stage postings] {time.perf_counter() - t0:.1f}s "
                  f"({len(todo)}/{n_shards} shards)", flush=True)

    produce_postings_sharded()

    # ---- stage 5: doc lengths (projection of docs metadata; kept as its
    # own artifact for the serving/oracle read paths) ----------------------
    def produce_doc_lengths(d: str) -> None:
        docs = ray.data.read_parquet(paths.docs, columns=["doc_id", "doc_length"])
        docs.write_parquet(d, **write_kwargs)

    _stage(paths.doc_lengths, "doc_lengths", in_fp, resume, produce_doc_lengths)

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
                       "index_shards": n_shards,
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
