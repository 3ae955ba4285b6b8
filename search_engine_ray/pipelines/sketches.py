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


# ---------------------------------------------------------------------------
# distinct counting: exact (distributed distinct) + HyperLogLog (one pass)
# ---------------------------------------------------------------------------


def distinct_token_count(docs, text_col: str = "text") -> int:
    """EXACT number of distinct lowercase whitespace tokens in the corpus.
    Per-block kernels emit each block's UNIQUE tokens only (vocab-sized,
    not corpus-sized), then one grouped_reduce distinct — the same
    sort+reduceat path every corpus-cardinality reduction here uses."""
    from search_engine_ray.stages.grouped import grouped_reduce

    counts_fn = _exact_token_counts(text_col)

    def kernel(batch: pa.Table) -> pa.Table:
        terms, _ = counts_fn(batch)
        return pa.table({"term": pa.array(terms, pa.string())})

    uniq = grouped_reduce(docs.map_batches(kernel, batch_format="pyarrow"),
                          ["term"])
    return int(uniq.count())


def hll_distinct_tokens(docs, p: int = 14, text_col: str = "text") -> dict:
    """ONE-PASS approximate distinct-token count via HyperLogLog
    (Flajolet et al. 2007): 2^p registers, relative error ≈ 1.04/sqrt(2^p)
    (~0.8% at p=14). Deterministic (the corpus poly hash seeds it) and
    MERGEABLE: registers combine by elementwise max, so the estimate is
    independent of block layout (pytest-enforced).

    Scale shape: each block emits only its NONZERO (register, rho) pairs
    (≤ 2^p rows); a grouped_reduce max merges them — at no point does a
    worker or the driver hold more than the 2^p-row register table. The
    exact companion is :func:`distinct_token_count`."""
    from search_engine_ray.functions.hashing import hash_strings_arrow
    from search_engine_ray.stages.grouped import grouped_reduce

    m = 1 << p
    rem_bits = 64 - p
    counts_fn = _exact_token_counts(text_col)

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table({"reg": pa.array([], pa.int64()),
                          "rho": pa.array([], pa.int64())})
        terms, _ = counts_fn(batch)
        if len(terms) == 0:
            return empty
        h = hash_strings_arrow(pa.array(terms.tolist(), pa.string()))
        reg = (h >> np.uint64(rem_bits)).astype(np.int64)
        w = h & np.uint64((1 << rem_bits) - 1)
        # rank of first 1-bit in the low rem_bits (rho = rem_bits -
        # bit_length(w) + 1; w == 0 → rem_bits + 1). Exact via float64:
        # w < 2^50 < 2^53 so log2(w+1) rounds correctly at powers of two.
        bl = np.ceil(np.log2(w.astype(np.float64) + 1.0)).astype(np.int64)
        rho = rem_bits - bl + 1
        # per-block register max
        order = np.lexsort((-rho, reg))
        reg_s, rho_s = reg[order], rho[order]
        first = np.empty(len(reg_s), bool)
        first[0] = True
        np.not_equal(reg_s[1:], reg_s[:-1], out=first[1:])
        keep = np.flatnonzero(first)
        return pa.table({"reg": pa.array(reg_s[keep], pa.int64()),
                         "rho": pa.array(rho_s[keep], pa.int64())})

    regs = grouped_reduce(docs.map_batches(partial, batch_format="pyarrow"),
                          ["reg"], maxs=[("rho", "rho")]).to_pandas()
    rho = np.zeros(m, np.int64)
    if len(regs):
        rho[regs["reg"].to_numpy(np.int64)] = regs["rho"].to_numpy(np.int64)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = alpha * m * m / np.sum(np.exp2(-rho.astype(np.float64)))
    zeros = int(np.count_nonzero(rho == 0))
    if raw <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)  # linear counting (small range)
    else:
        est = raw
    return {"estimate": int(round(est)), "p": p,
            "rel_err_bound": 1.04 / np.sqrt(m)}


def count_min_tokens(docs, depth: int = 4, width: int = 2048,
                     text_col: str = "text"):
    """Count-Min sketch of corpus token frequencies (Cormode &
    Muthukrishnan, J.Alg 2005): ``depth`` hash rows × ``width`` counters,
    each token incrementing one counter per row; a point estimate is the
    MIN over its row counters — an OVER-estimate by at most
    ``ε·N = (e/width)·N`` with probability ≥ 1 − e^-depth. The sketch is
    MERGEABLE (entrywise sum), so per-block sketches reduce in one
    fixed-size aggregation however large the corpus — the memory-bounded
    companion of the exact distinct counter and Misra-Gries heavy
    hitters.

    Returns {"sketch": depth×width int64 ndarray, "n_tokens": N,
    "estimate": fn(token) -> int}. Hash rows derive from
    splitmix64(poly_hash(token) ^ row_seed) — deterministic everywhere.
    Never-underestimate + ε-bound are pytest-pinned against exact
    counts."""
    from search_engine_ray.functions.hashing import hash_strings_arrow, mix64

    seeds = mix64(np.arange(1, depth + 1, dtype=np.uint64))
    counts_fn = _exact_token_counts(text_col)

    def block_sketch(batch: pa.Table) -> pa.Table:
        toks, cnts = counts_fn(batch)
        sk = np.zeros((depth, width), np.int64)
        total = int(cnts.sum())
        if len(toks):
            h = hash_strings_arrow(pa.array(toks.tolist(), pa.string()))
            for r in range(depth):
                cells = (mix64(h ^ seeds[r]) % np.uint64(width)).astype(np.int64)
                np.add.at(sk[r], cells, cnts)
        return pa.table({"cell": pa.array(sk.reshape(-1), pa.int64()),
                         "n": pa.array(np.full(depth * width, total, np.int64),
                                       pa.int64())})

    parts = docs.map_batches(block_sketch, batch_format="pyarrow")
    # entrywise merge: every block emits the SAME fixed layout, so the
    # reduction is one vectorized fold over depth*width-row blocks
    sk = np.zeros(depth * width, np.int64)
    n_tokens = 0
    # exact-multiple batches so stacked block-sketches reshape cleanly
    for b in parts.iter_batches(batch_size=depth * width,
                                batch_format="pyarrow"):
        cells = b["cell"].to_numpy(zero_copy_only=False)
        k = len(cells) // (depth * width)
        if k == 0:
            continue
        sk += cells.reshape(k, depth * width).sum(axis=0)
        ns = b["n"].to_numpy(zero_copy_only=False)
        n_tokens += int(ns[:: depth * width].sum())
    sketch = sk.reshape(depth, width)

    def estimate(token: str) -> int:
        from search_engine_ray.functions.hashing import poly_hash_str

        h = np.uint64(poly_hash_str(token.lower()))
        vals = [int(sketch[r, int(mix64(np.array([h ^ seeds[r]]))[0] % np.uint64(width))])
                for r in range(depth)]
        return min(vals)

    return {"sketch": sketch, "n_tokens": n_tokens, "estimate": estimate}
