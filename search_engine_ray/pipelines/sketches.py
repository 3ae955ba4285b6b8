"""Mergeable frequency sketches: per-block Misra-Gries-style summaries +
one small groupby, with a GLOBAL deterministic error bound.

Shape (Agarwal et al., "Mergeable Summaries", PODS'12): each block
compresses its EXACT term counts to its top-``m`` entries and reports the
largest count it dropped; the union of summaries (≤ m × n_blocks rows —
small however big the corpus) merges by summing per-term lower bounds,
and the global underestimation error is at most Σ_blocks drop_threshold —
a single scalar shipped alongside the result.

Guarantees (pytest-enforced):
  * reported count ≤ true count ≤ reported count + err_bound
  * every term with true count > err_bound appears in the merged summary
    (a block only drops a term if its local count ≤ the block's drop
    threshold, so a missed term's total ≤ Σ thresholds).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
from ray.data.aggregate import Sum


def _block_summary(counts_fn, m: int):
    """Wrap an exact per-block (term, count) kernel into an MG-style
    summary kernel: keep top-m by (count desc, term asc), report the
    largest dropped count as this block's error contribution."""

    def kernel(batch: pa.Table) -> pa.Table:
        terms, counts = counts_fn(batch)
        empty = pa.table({"term": pa.array([], pa.string()),
                          "c_low": pa.array([], pa.int64()),
                          "err_part": pa.array([], pa.int64())})
        if len(terms) == 0:
            return empty
        if len(terms) <= m:
            err = np.zeros(len(terms), np.int64)
            return pa.table({"term": pa.array(terms, pa.string()),
                             "c_low": pa.array(counts.astype(np.int64), pa.int64()),
                             "err_part": pa.array(err, pa.int64())})
        order = np.lexsort((terms, -counts))
        kept, dropped = order[:m], order[m:]
        drop_thresh = int(counts[dropped].max())
        err = np.zeros(m, np.int64)
        err[0] = drop_thresh  # one carrier row per block for the scalar
        return pa.table({
            "term": pa.array(terms[kept], pa.string()),
            "c_low": pa.array(counts[kept].astype(np.int64), pa.int64()),
            "err_part": pa.array(err, pa.int64()),
        })

    return kernel


def _exact_token_counts(text_col: str):
    """Per-block exact lowercase-whitespace-token counts."""
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        batch = batch.combine_chunks()
        if batch.num_rows == 0:
            return np.zeros(0, object), np.zeros(0, np.int64)
        toks = pc.list_flatten(pc.utf8_split_whitespace(
            pc.utf8_lower(pc.fill_null(batch[text_col], ""))))
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        if len(toks) == 0:
            return np.zeros(0, object), np.zeros(0, np.int64)
        enc = toks.dictionary_encode()
        c = np.bincount(enc.indices.to_numpy(zero_copy_only=False),
                        minlength=len(enc.dictionary))
        keep = np.asarray(enc.dictionary.to_pylist(), dtype=object)
        ne = keep != ""
        return keep[ne], c[np.flatnonzero(ne)].astype(np.int64)

    return fn


def heavy_hitters(docs, k: int = 10, m: int = 1024,
                  text_col: str = "text") -> tuple["pa.Table", int]:
    """(top-k table (term, count_low), global err_bound): approximate
    most-frequent tokens with a deterministic error certificate. ``m``
    trades summary size for tightness (err_bound ≤ n_blocks × T_block/m)."""
    from search_engine_ray.stages.grouped import grouped_reduce

    kernel = _block_summary(_exact_token_counts(text_col), m)
    merged = grouped_reduce(
        docs.map_batches(kernel, batch_format="pyarrow"), ["term"],
        sums=[("c_low", "count_low"), ("err_part", "_e")]).materialize()
    err_bound = int(merged.aggregate(Sum("_e", alias_name="e"))["e"] or 0)
    top = (merged.select_columns(["term", "count_low"])
           .sort(["count_low", "term"], descending=[True, False])
           .limit(k).to_arrow_refs())
    # Ray sort/limit over many small blocks can emit schemaless zero-row
    # blocks; drop them before concat (they carry no data, only a bad schema).
    tbls = [t for t in map(ray.get, top) if t.num_rows]
    tbl = (pa.concat_tables(tbls) if tbls else
           pa.table({"term": pa.array([], pa.string()),
                     "count_low": pa.array([], pa.int64())}))
    return tbl, err_bound


def skew_report(ds, key_col: str, k: int = 10, m: int = 1024) -> dict:
    """Shuffle-skew diagnostic for a prospective groupby/join key: the
    top-k hottest key values (with error certificate) + per-block row
    counts. Cheap enough to run before committing to a partitioning."""

    def key_counts(batch: pa.Table):
        batch = batch.combine_chunks()
        if batch.num_rows == 0:
            return np.zeros(0, object), np.zeros(0, np.int64)
        col = batch[key_col]
        if not (pa.types.is_string(col.type) or pa.types.is_large_string(col.type)):
            col = col.cast(pa.string())
        enc = col.combine_chunks().dictionary_encode()
        c = np.bincount(enc.indices.to_numpy(zero_copy_only=False),
                        minlength=len(enc.dictionary))
        return (np.asarray(enc.dictionary.to_pylist(), dtype=object),
                c.astype(np.int64))

    from search_engine_ray.stages.grouped import grouped_reduce

    kernel = _block_summary(key_counts, m)
    merged = grouped_reduce(
        ds.map_batches(kernel, batch_format="pyarrow"), ["term"],
        sums=[("c_low", "count_low"), ("err_part", "_e")]).materialize()
    err_bound = int(merged.aggregate(Sum("_e", alias_name="e"))["e"] or 0)
    top = (merged.select_columns(["term", "count_low"])
           .sort(["count_low", "term"], descending=[True, False])
           .limit(k).to_pandas())
    total = ds.count()
    hot = top.iloc[0].count_low + err_bound if len(top) else 0
    return {
        "total_rows": int(total),
        "err_bound": err_bound,
        "hot_keys": [(t, int(c)) for t, c in zip(top.term, top.count_low)],
        "max_key_frac_upper": (hot / total) if total else 0.0,
    }
