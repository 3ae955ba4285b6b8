"""Composite training-corpus cleaning pipeline — the canonical LLM-data
flow the individual operators exist for, composed end-to-end:

    documents ── exact dedup (md5 keep-list) ──┐
              ── quality stats (vectorizable)  ├─ keep mask ─ write clean
              ── language filter               ┘  corpus, hive-partitioned
                                                  by lang (resumable output)

Shuffle discipline: the only wide operation is the exact-dedup groupby
(md5 → min doc_id); its KEEP-LIST (one int64 per distinct text, far
smaller than the corpus) is broadcast via ``ray.put`` and every other
criterion evaluates row-local inside one map_batches pass over the
corpus — the big side never shuffles. Near-dup removal composes the same
way (minhash_lsh_dedup → clusters → drop non-minimal members) and is kept
optional because it is sketch-based and not SQL-checkable; the default
pipeline is fully oracle-checked by the driver (clean_corpus)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from search_engine_ray.functions.quality import batch_doc_stats, batch_lang_id
from search_engine_ray.pipelines.training_data import exact_dedup, minhash_lsh_dedup


def clean_corpus(
    docs: "ray.data.Dataset",
    min_tokens: int = 10,
    max_stopword_ratio: float = 0.7,
    min_alpha_ratio: float = 0.3,
    langs: tuple[str, ...] = ("en",),
    near_dup: bool = False,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_from_col: str | None = None,
) -> "ray.data.Dataset":
    """→ Dataset of kept documents (id, text, ..., lang_pred, n_tokens).
    ``near_dup=True`` additionally drops non-minimal members of MinHash
    near-dup clusters. ``lang_from_col`` filters on an existing metadata
    column (upstream-provided language — and SQL-checkable) instead of the
    n-gram ``lang_id`` heuristic."""
    docs = docs.materialize()  # consumed by dedup AND the filter pass

    # exact-dedup keep-list: min doc_id per distinct md5(text)
    keepers = exact_dedup(docs, id_col=id_col, text_col=text_col).select_columns(["keep_doc_id"])
    keep_ids = np.sort(np.concatenate([
        b["keep_doc_id"].to_numpy(zero_copy_only=False)
        for b in keepers.iter_batches(batch_format="pyarrow")
    ] or [np.zeros(0, np.int64)]).astype(np.int64))

    drop_ids = np.zeros(0, np.int64)
    if near_dup:
        from search_engine_ray.pipelines.training_data import clusters_distributed

        pairs = minhash_lsh_dedup(docs, id_col=id_col, text_col=text_col)
        cl = clusters_distributed(pairs).to_pandas()
        drop_ids = np.sort(
            cl.loc[cl["doc_id"] != cl["cluster_id"], "doc_id"].to_numpy(np.int64)
        )

    keep_ref = ray.put(keep_ids)
    drop_ref = ray.put(drop_ids)
    lang_set = set(langs)

    def fn(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        if batch.num_rows == 0:
            return batch
        keep_list = ray.get(keep_ref)
        drop_list = ray.get(drop_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        mask = np.isin(ids, keep_list)
        if len(drop_list):
            mask &= ~np.isin(ids, drop_list)
        s = batch_doc_stats(batch[text_col])
        n_tok = s["n_tokens"]
        stopr = s["stopword_ratio"]
        alpha = s["alpha_ratio"]
        if lang_from_col is not None:
            lang_arr = np.array(batch[lang_from_col].to_pylist(), dtype=object)
        else:
            lang_arr = batch_lang_id(batch[text_col])[0]
        mask &= n_tok >= min_tokens
        mask &= stopr <= max_stopword_ratio
        mask &= alpha >= min_alpha_ratio
        mask &= np.isin(lang_arr, list(lang_set))
        sel = np.flatnonzero(mask)
        out = batch.take(pa.array(sel))
        return out.append_column(
            "lang_pred", pa.array(lang_arr[sel].tolist(), pa.string())
        ).append_column("n_tokens", pa.array(n_tok[sel], pa.int64()))

    return docs.map_batches(fn, batch_format="pyarrow")


def write_clean_corpus(docs, out_dir: str, **kw) -> None:
    """Hive-partition the cleaned corpus by predicted language — one
    directory per partition makes re-runs resumable per partition."""
    clean_corpus(docs, **kw).write_parquet(out_dir, partition_cols=["lang_pred"])
