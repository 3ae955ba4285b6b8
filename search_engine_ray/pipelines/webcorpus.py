"""Web-corpus curation operators (C4 / RefinedWeb-style, over the
input-hint webpages shape): host extraction + per-host stats, per-host
dominance caps, deterministic stratified sampling, and sequence packing
for training-data assembly.

Every operator is a streaming Dataset transform: partial aggregation
inside map_batches, one small groupby for the wide step, nothing
driver-side that scales with the corpus. Each has a DuckDB oracle in
pipelines/driver_queries.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from search_engine_ray.stages.grouped import sorted_group_map
from search_engine_ray.stages.scan import ordered_prefix_sum

def host_of(urls: "pa.Array | pa.ChunkedArray") -> pa.Array:
    """Vectorized url → host ('' when the url has no scheme://host part).
    Host = everything after scheme:// up to the first of / : ? #."""
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    ex = pc.extract_regex(urls, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://(?P<host>[^/:?#]+)")
    host = pc.struct_field(ex, "host")
    return pc.fill_null(host, "")


def with_host(pages, url_col: str = "url", out_col: str = "host"):
    """Stamp a host column onto a webpages-shaped Dataset (map-only)."""

    def fn(batch: pa.Table) -> pa.Table:
        return batch.append_column(out_col, host_of(batch[url_col]))

    return pages.map_batches(fn, batch_format="pyarrow")


#: ONE alternation so RE2's leftmost match picks the page's genuinely
#: FIRST robots meta tag whichever attribute order it uses (two separate
#: extracts would prefer one order over document position). The name must
#: be exactly "robots": a quote / whitespace / slash delimiter after it
#: rejects robots2 / robots-nocontent style custom names.
_ROBOTS_META = (
    r'(?i)<meta[^>]*\bname\s*=\s*["\']?robots["\'\s/][^>]*'
    r'\bcontent\s*=\s*["\']?(?P<a>[^"\'>]*)'
    r'|<meta[^>]*\bcontent\s*=\s*["\']?(?P<b>[^"\'>]*)'
    r'["\']?[^>]*\bname\s*=\s*["\']?robots["\'\s/>]'
)


def _robots_content(html_col) -> "pa.Array":
    """Lowercased content of the page's FIRST robots meta tag ('' when
    absent) — batch-vectorized RE2; one alternation, leftmost match."""
    html = pc.cast(html_col, pa.string())
    ex = pc.extract_regex(html, _ROBOTS_META)
    a = pc.fill_null(pc.struct_field(ex, "a"), "")
    b = pc.fill_null(pc.struct_field(ex, "b"), "")
    # Arrow fills the NON-participating alternation group with '' (not
    # null): prefer a when non-empty, else b — the SQL twin's nullif chain
    return pc.utf8_lower(pc.if_else(pc.not_equal(a, ""), a, b))


def robots_meta_table(pages, url_col: str = "url", html_col: str = "html"):
    """(url, noindex, nofollow) from ``<meta name="robots" ...>``
    directives — the crawl-politeness gate an indexing pipeline applies
    BEFORE extract (pages a site asked out of the index must not enter
    it). The first robots meta tag wins (either attribute order,
    optional quotes, case-insensitive); pages without one are fully
    indexable. Map-only — streams at any scale."""

    def fn(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        if batch.num_rows == 0:
            return pa.table({url_col: pa.array([], pa.string()),
                             "noindex": pa.array([], pa.int64()),
                             "nofollow": pa.array([], pa.int64())})
        content = _robots_content(batch[html_col])
        return pa.table({
            url_col: batch[url_col].cast(pa.string()),
            "noindex": pc.cast(pc.match_substring(content, "noindex"), pa.int64()),
            "nofollow": pc.cast(pc.match_substring(content, "nofollow"), pa.int64()),
        })

    return pages.map_batches(fn, batch_format="pyarrow")


def robots_index_filter(pages, html_col: str = "html"):
    """Drop noindex pages (row-local, one pass) — the composition a
    build pipeline applies directly upstream of extract."""

    def fn(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        if batch.num_rows == 0:
            return batch
        content = _robots_content(batch[html_col])
        return batch.filter(pc.invert(pc.match_substring(content, "noindex")))

    return pages.map_batches(fn, batch_format="pyarrow")


def host_stats(pages, url_col: str = "url", text_col: str = "text"):
    """Per-host (host, n_docs, total_tokens): the curation signal for
    dominance filtering. Partial counts per batch; the final groupby moves
    one row per (batch, host)."""

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        if batch.num_rows == 0:
            return pa.table({"host": pa.array([], pa.string()),
                             "n_part": pa.array([], pa.int64()),
                             "tok_part": pa.array([], pa.int64())})
        hosts = host_of(batch[url_col])
        ntok = _raw_token_counts(batch[text_col])
        enc = hosts.dictionary_encode()
        idx = enc.indices.to_numpy(zero_copy_only=False)
        n = np.bincount(idx, minlength=len(enc.dictionary))
        t = np.bincount(idx, weights=ntok, minlength=len(enc.dictionary))
        return pa.table({
            "host": enc.dictionary.cast(pa.string()),
            "n_part": pa.array(n.astype(np.int64), pa.int64()),
            "tok_part": pa.array(t.astype(np.int64), pa.int64()),
        })

    from search_engine_ray.stages.grouped import grouped_reduce

    # host cardinality scales with the crawl (10^7-10^8 hosts at web
    # scale) — sort+reduceat, not Ray's hash groupby (see grouped_reduce)
    return grouped_reduce(pages.map_batches(partial, batch_format="pyarrow"),
                          ["host"], sums=[("n_part", "n_docs"),
                                          ("tok_part", "total_tokens")])


def _raw_token_counts(texts) -> np.ndarray:
    """Whitespace token count per text (non-empty tokens), vectorized."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    toks = pc.utf8_split_whitespace(pc.fill_null(texts, ""))
    flat = pc.list_flatten(toks)
    lens = pc.fill_null(pc.list_value_length(toks), 0).to_numpy(
        zero_copy_only=False).astype(np.int64)
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    # per-list count of non-empty flattened tokens
    starts = np.zeros(len(lens) + 1, np.int64)
    np.cumsum(lens, out=starts[1:])
    cs = np.concatenate([[0], np.cumsum(nonempty.astype(np.int64))])
    return cs[starts[1:]] - cs[starts[:-1]]


def _topn_kernel(group_col: str, order_col: str, n: int, descending: bool):
    """Vectorized keep-top-n-rows-per-group batch kernel (groups need NOT
    be contiguous): one lexsort ranks every group in the batch at once."""

    def kernel(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        if batch.num_rows == 0:
            return batch
        enc = batch[group_col].dictionary_encode().combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = batch[order_col].to_numpy(zero_copy_only=False)
        if np.issubdtype(vals.dtype, np.datetime64):
            vals = vals.astype("datetime64[us]").astype(np.int64)
        order = np.lexsort((-vals if descending else vals, codes))
        sc = codes[order]
        change = np.empty(len(sc), bool)
        change[0] = True
        change[1:] = sc[1:] != sc[:-1]
        gstart = np.maximum.accumulate(np.where(change, np.arange(len(sc)), 0))
        rank = np.arange(len(sc)) - gstart
        keep = np.sort(order[rank < n])
        return batch.take(pa.array(keep))

    return kernel


def group_topn(ds, group_col: str, order_col: str, n: int = 1,
               descending: bool = False):
    """Keep the ``n`` rows with smallest (or largest) ``order_col`` per
    ``group_col`` group. Two-level: a per-batch combiner bounds what the
    finishing sort moves to ≤n rows per (block, group) — a group with 10^9
    rows ships n per block, not 10^9. ``order_col`` must be unique within
    a group for a deterministic result."""
    kernel = _topn_kernel(group_col, order_col, n, descending)
    pre = ds.map_batches(kernel, batch_format="pyarrow")
    return sorted_group_map(pre, [group_col], kernel,
                            sort_cols=[group_col, order_col])


def host_cap_filter(pages, cap: int, url_col: str = "url",
                    id_col: str = "doc_id"):
    """Keep at most ``cap`` docs per host — the ``cap`` SMALLEST ids
    (deterministic; mirrors 'keep first crawled')."""
    return group_topn(with_host(pages, url_col=url_col), "host", id_col,
                      n=cap, descending=False)


def latest_snapshot(pages, url_col: str = "url", ts_col: str = "warc_ts"):
    """Re-crawl dedup: keep ONE row per url — the newest ``ts_col``
    snapshot (Common-Crawl corpora carry many captures of the same page).
    Timestamps must be distinct per url for determinism (WARC capture
    times are)."""
    return group_topn(pages, url_col, ts_col, n=1, descending=True)


def stratified_sample(docs, fractions: dict[str, float],
                      default_frac: float = 0.0, key_col: str = "lang",
                      id_col: str = "doc_id", method: str = "md5"):
    """Deterministic per-stratum sampling: a doc is kept iff its hash-unit
    u(doc) < fraction(stratum). Partition- and order-invariant (the rule is
    a pure row function), so the sample is reproducible at any scale.

    method='md5'  — u = first 8 hex chars of md5(str(id)); the keep rule
                    compares fixed-width lowercase hex STRINGS, so a DuckDB
                    oracle reproduces it exactly (driver_queries).
    method='mix64' — vectorized integer hash (no per-row Python); same
                    contract, no SQL oracle (DuckDB lacks 64-bit wrapping
                    arithmetic).
    """
    from search_engine_ray.functions.hashing import md5_hex_batch, mix64

    thresholds = {k: f"{min(int(v * 2**32), 2**32 - 1):08x}" for k, v in fractions.items()}
    default_hex = f"{min(int(default_frac * 2**32), 2**32 - 1):08x}"
    thr_int = {k: np.uint64(min(int(v * 2**32), 2**32 - 1)) for k, v in fractions.items()}
    default_int = np.uint64(min(int(default_frac * 2**32), 2**32 - 1))

    def fn(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        if batch.num_rows == 0:
            return batch
        keys = batch[key_col].to_pylist()
        if method == "md5":
            hx = md5_hex_batch([str(int(i)) for i in
                                batch[id_col].to_numpy(zero_copy_only=False)])
            keep = np.array([h[:8] < thresholds.get(k, default_hex)
                             for h, k in zip(hx, keys)], bool)
        else:
            ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            u = mix64(ids.view(np.uint64)) >> np.uint64(32)
            lim = np.array([thr_int.get(k, default_int) for k in keys], np.uint64)
            keep = u < lim
        return batch.take(pa.array(np.flatnonzero(keep)))

    return docs.map_batches(fn, batch_format="pyarrow")


def sample_k(docs, k: int, id_col: str = "doc_id", method: str = "md5"):
    """Deterministic global uniform k-sample: the k rows with the SMALLEST
    hash priority of their id — bottom-k of a pseudorandom permutation, so
    the sample is uniform, reproducible, and EXACTLY min(k, N) rows (the
    exact-size complement of stratified_sample's keep-fraction rule).

    Mergeable by construction: the global bottom-k is the bottom-k of the
    per-block bottom-k's, so every block forwards ≤ k candidate rows and
    the finishing sort touches O(k × blocks), never the corpus — the same
    discipline as value_quantiles_approx / group_topn. Growth-stable:
    adding docs can only displace, never reshuffle, survivors.

    method='md5'  — priority = md5-hex of str(id), string order; a DuckDB
                    oracle reproduces it exactly (ORDER BY md5(...)).
    method='mix64' — vectorized splitmix64 (no per-row Python), the
                    production path; same contract, no SQL oracle."""
    from search_engine_ray.functions.hashing import md5_hex_batch, mix64

    def prune(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        pri_type = pa.string() if method == "md5" else pa.uint64()
        if batch.num_rows == 0:
            return batch.append_column("_pri", pa.array([], pri_type))
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        if method == "md5":
            pri = np.array(md5_hex_batch([str(int(i)) for i in ids]), object)
        else:
            pri = mix64(ids.astype(np.int64).view(np.uint64))
        keep = np.sort(np.argsort(pri, kind="stable")[:k])
        return batch.take(pa.array(keep)).append_column(
            "_pri", pa.array(pri[keep], pri_type))

    pruned = docs.map_batches(prune, batch_format="pyarrow")
    cols = [c for c in docs.schema().names]
    return (pruned.sort(["_pri", id_col]).limit(int(k))
                  .map_batches(lambda b: b.select(cols), batch_format="pyarrow"))


def curriculum_order(docs, id_col: str = "doc_id", text_col: str = "text"):
    """Curriculum ordering: every doc's global position in
    (quality desc, id asc) order — the deterministic 'clean examples
    first' training schedule. → (doc_id, quality_r, position), position
    0-based and gap-free.

    Distributed shape: quality is row-local; the global rank rides
    :func:`~search_engine_ray.stages.scan.ordered_prefix_sum` over a
    packed int64 order key ((10^6 − q6)·2^41 + doc_id — ascending key ≡
    the curriculum order; q6 = quality in millionths), so the only wide
    step is ONE sort and only per-block totals ever reach the driver.
    doc_ids ≥ 2^40 would corrupt the packing and raise."""
    from search_engine_ray.functions.quality import (
        batch_doc_stats,
        batch_quality_score,
        pack_quality_desc_key,
    )
    from search_engine_ray.stages.scan import ordered_prefix_sum

    def key(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        if batch.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "quality_r": pa.array([], pa.float64()),
                             "okey": pa.array([], pa.int64()),
                             "one": pa.array([], pa.int64())})
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        q = batch_quality_score(batch_doc_stats(batch[text_col]))
        okey = pack_quality_desc_key(ids, q)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "quality_r": pa.array(q, pa.float64()),
                         "okey": pa.array(okey, pa.int64()),
                         "one": pa.array(np.ones(len(ids), np.int64), pa.int64())})

    ranked = ordered_prefix_sum(docs.map_batches(key, batch_format="pyarrow"),
                                "okey", "one", out_col="position")

    def finish(batch: pa.Table) -> pa.Table:
        return batch.select([id_col, "quality_r", "position"])

    return ranked.map_batches(finish, batch_format="pyarrow")


def token_budget_head(docs, budget: int, id_col: str = "doc_id",
                      text_col: str = "text"):
    """'The best N tokens': the maximal quality-ordered prefix of the
    corpus whose cumulative token count fits ``budget`` — how a training
    run selects data when compute (tokens), not storage, is the limit.
    Keep rule: inclusive cumulative n_tokens ≤ budget in
    (quality desc, doc_id) order; cumulative counts are monotone, so the
    kept set is a true prefix. → (doc_id, quality_r, n_tokens,
    cum_tokens) with cum_tokens the inclusive running total.

    Same distributed shape as :func:`curriculum_order`: row-local quality
    + packed order key, ONE sort via ordered_prefix_sum (over n_tokens
    this time), then a row-local budget filter."""
    from search_engine_ray.functions.quality import (
        batch_doc_stats,
        batch_quality_score,
        pack_quality_desc_key,
    )
    from search_engine_ray.stages.scan import ordered_prefix_sum

    def key(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        if batch.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "quality_r": pa.array([], pa.float64()),
                             "n_tokens": pa.array([], pa.int64()),
                             "okey": pa.array([], pa.int64())})
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        st = batch_doc_stats(batch[text_col])
        q = batch_quality_score(st)
        okey = pack_quality_desc_key(ids, q)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "quality_r": pa.array(q, pa.float64()),
                         "n_tokens": pa.array(st["n_tokens"].astype(np.int64), pa.int64()),
                         "okey": pa.array(okey, pa.int64())})

    ranked = ordered_prefix_sum(docs.map_batches(key, batch_format="pyarrow"),
                                "okey", "n_tokens", out_col="cum_excl")

    def cut(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        if batch.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "quality_r": pa.array([], pa.float64()),
                             "n_tokens": pa.array([], pa.int64()),
                             "cum_tokens": pa.array([], pa.int64())})
        n = batch["n_tokens"].to_numpy(zero_copy_only=False)
        cum = batch["cum_excl"].to_numpy(zero_copy_only=False) + n
        m = cum <= int(budget)
        return pa.table({
            id_col: batch[id_col].filter(pa.array(m)),
            "quality_r": batch["quality_r"].filter(pa.array(m)),
            "n_tokens": batch["n_tokens"].filter(pa.array(m)),
            "cum_tokens": pa.array(cum[m], pa.int64()),
        })

    return ranked.map_batches(cut, batch_format="pyarrow")


def upsample_mix(docs, weights: dict[str, float], default_weight: float = 1.0,
                 key_col: str = "lang", id_col: str = "doc_id",
                 method: str = "md5"):
    """Epoch-weighted corpus mixing WITH up-sampling — the training-mixture
    step LLM data recipes need that :func:`stratified_sample` cannot do
    (weights may exceed 1: e.g. 2.5 'epochs' of a high-quality stratum,
    0.3 of a low one). Each doc is emitted ``floor(w)`` or ``ceil(w)``
    times; the fractional copy is decided by the SAME hash-unit rule as
    stratified_sample (u(doc) < frac(w)), so E[copies] = w exactly and the
    expansion is a pure row function — deterministic, partition- and
    order-invariant, stable as the corpus grows. → one row per copy with
    ``epoch`` = 0..copies-1 (consumers interleave/shuffle by it; epoch 0
    is precisely the stratified_sample keep-set for frac(w) when
    floor(w)=0).

    Scale shape: row-local ``map_batches`` flat expansion (np.repeat on the
    take indices) — no shuffle, no driver state; output size is
    Σ w(stratum)·|stratum| by construction.

    method='md5' compares fixed-width lowercase hex STRINGS so the DuckDB
    oracle reproduces the rule exactly; method='mix64' is the vectorized
    no-Python-per-row twin (same contract, no SQL oracle)."""
    from search_engine_ray.functions.hashing import md5_hex_batch, mix64

    def _parts(w: float) -> tuple[int, str, np.uint64]:
        if w < 0:
            raise ValueError(f"negative mixture weight {w}")
        base = int(np.floor(w))
        frac = w - base
        lim = min(int(frac * 2**32), 2**32 - 1)
        return base, f"{lim:08x}", np.uint64(lim)

    parts = {k: _parts(v) for k, v in weights.items()}
    dflt = _parts(default_weight)

    def fn(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        epoch_f = pa.field("epoch", pa.int64())
        if batch.num_rows == 0:
            return batch.append_column(epoch_f, pa.array([], pa.int64()))
        keys = batch[key_col].to_pylist()
        base = np.array([parts.get(k, dflt)[0] for k in keys], np.int64)
        if method == "md5":
            hx = md5_hex_batch([str(int(i)) for i in
                                batch[id_col].to_numpy(zero_copy_only=False)])
            extra = np.array([h[:8] < parts.get(k, dflt)[1]
                              for h, k in zip(hx, keys)], np.int64)
        else:
            ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            u = mix64(ids.view(np.uint64)) >> np.uint64(32)
            lim = np.array([parts.get(k, dflt)[2] for k in keys], np.uint64)
            extra = (u < lim).astype(np.int64)
        copies = base + extra
        take = np.repeat(np.arange(len(copies)), copies)
        ends = np.cumsum(copies)
        epoch = np.arange(int(ends[-1]) if len(ends) else 0, dtype=np.int64) \
            - np.repeat(ends - copies, copies)
        return batch.take(pa.array(take)).append_column(
            epoch_f, pa.array(epoch, pa.int64()))

    return docs.map_batches(fn, batch_format="pyarrow")


def facet_counts(docs, ids: "np.ndarray", facet_col: str,
                 id_col: str = "doc_id"):
    """Faceted counts over a retrieval result: (facet value, n_docs) for
    the rows of ``docs`` whose ``id_col`` is in ``ids`` (the matched-doc
    set of a search). The id array is broadcast ONCE (ray.put) and probed
    by searchsorted inside map_batches — the corpus streams, nothing
    corpus-sized moves; per-batch partial counts reduce in one tiny
    groupby. Payload is O(result set): bound it with a selective query or
    a top-k cut before faceting when results can approach corpus size."""
    import ray

    from search_engine_ray.stages.grouped import grouped_reduce

    wanted = np.sort(np.asarray(ids, np.int64))
    ref = ray.put(wanted)

    def part(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        empty = pa.table({facet_col: pa.array([], pa.string()),
                          "n_part": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        w = ray.get(ref)
        v = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(w) == 0:
            return empty
        pos = np.searchsorted(w, v)
        pos[pos >= len(w)] = 0
        mask = w[pos] == v
        if not mask.any():
            return empty
        fv = batch[facet_col].filter(pa.array(mask))
        if isinstance(fv, pa.ChunkedArray):
            fv = fv.combine_chunks()
        enc = fv.dictionary_encode()
        cnt = np.bincount(enc.indices.to_numpy(zero_copy_only=False),
                          minlength=len(enc.dictionary))
        return pa.table({facet_col: enc.dictionary.cast(pa.string()),
                         "n_part": pa.array(cnt.astype(np.int64), pa.int64())})

    parts = docs.map_batches(part, batch_format="pyarrow")
    return grouped_reduce(parts, [facet_col], sums=[("n_part", "n_docs")])


def split_assign(docs, splits: dict[str, float] | None = None,
                 id_col: str = "doc_id", method: str = "md5"):
    """Deterministic train/val/test split assignment: each row gets the
    split whose cumulative hash-unit range contains u(doc). A pure row
    rule (partition- and order-invariant, stable under re-runs and corpus
    growth — a doc never changes split when other docs are added), the
    property that makes held-out sets trustworthy at 100 TB.

    ``splits`` maps name → fraction in DECLARATION order (must sum to ~1;
    the last split absorbs rounding). method='md5' compares fixed-width
    hex strings (exact DuckDB oracle twin); method='mix64' is the
    vectorized no-Python production path under the same contract."""
    from search_engine_ray.functions.hashing import md5_hex_batch, mix64

    if splits is None:
        splits = {"train": 0.9, "val": 0.05, "test": 0.05}
    names = list(splits)
    cum, bounds_hex, bounds_int = 0.0, [], []
    for name in names[:-1]:
        cum += splits[name]
        v = min(int(cum * 2**32), 2**32 - 1)
        bounds_hex.append(f"{v:08x}")
        bounds_int.append(np.uint64(v))

    def fn(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        if batch.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "split": pa.array([], pa.string())})
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if method == "md5":
            hx = [h[:8] for h in md5_hex_batch([str(int(i)) for i in ids])]
            # first bound the unit is below = the split (searchsorted on
            # the sorted cumulative bounds; bounds are ascending hex)
            idx = np.searchsorted(np.array(bounds_hex, dtype=object), np.array(hx, dtype=object),
                                  side="right")
        else:
            u = mix64(ids.view(np.uint64)) >> np.uint64(32)
            idx = np.searchsorted(np.array(bounds_int, np.uint64), u, side="right")
        name_arr = np.array(names, dtype=object)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "split": pa.array(name_arr[idx], pa.string())})

    return docs.map_batches(fn, batch_format="pyarrow")


def pack_sequences(docs, max_len: int, id_col: str = "doc_id",
                   text_col: str = "text"):
    """GPT-style concat-and-chunk packing plan: documents are concatenated
    in ``id_col`` order and cut into fixed ``max_len``-token packs; each doc
    row gains its global token offset and the packs it lands in:

        (doc_id, n_tokens, start_off, pack_first, pack_last)

    The global offset is a distributed prefix sum (stages/scan.py) — two
    streaming passes, only per-block totals touch the driver. The output IS
    the shuffle-free packing plan: a writer task for pack range [a, b) knows
    exactly which doc rows it needs (start_off/pack ids are monotone)."""

    def count(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        if batch.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64())})
        return pa.table({
            id_col: batch[id_col].cast(pa.int64()),
            "n_tokens": pa.array(_raw_token_counts(batch[text_col]), pa.int64()),
        })

    counted = docs.map_batches(count, batch_format="pyarrow")
    scanned = ordered_prefix_sum(counted, id_col, "n_tokens",
                                 out_col="start_off")

    def finish(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        if batch.num_rows == 0:
            return batch.append_column(
                "pack_first", pa.array([], pa.int64())).append_column(
                "pack_last", pa.array([], pa.int64()))
        start = batch["start_off"].to_numpy(zero_copy_only=False)
        n = batch["n_tokens"].to_numpy(zero_copy_only=False)
        first = start // max_len
        last = np.where(n > 0, (start + n - 1) // max_len, first)
        return batch.append_column(
            "pack_first", pa.array(first.astype(np.int64), pa.int64())
        ).append_column("pack_last", pa.array(last.astype(np.int64), pa.int64()))

    return scanned.map_batches(finish, batch_format="pyarrow")


def deterministic_shuffle(docs, id_col: str = "doc_id", salt: str = "shuf",
                          n_shards: int = 8, hash_mode: str = "mix64"):
    """Deterministic global shuffle for training-data ordering: every row
    gets rank = its position in ascending hash(id, salt) order, plus
    ``shard = rank % n_shards`` for round-robin output sharding. Unlike
    ``Dataset.random_shuffle`` the permutation is a pure function of
    (ids, salt) — re-running a failed job, or running at a different
    parallelism, yields byte-identical shards (resumability at 100 TB).

    ``hash_mode``: ``mix64`` (vectorized splitmix64 — the scale path) or
    ``md5`` (matches DuckDB ``md5(id || '-' || salt)``, enabling the SQL
    oracle; per-row hashlib calls, so use it for verification scale only).

    Shape: one sort by (hash key, id); then the ordered_prefix_sum trick
    assigns global ranks — per sorted block only its (first key, n_rows)
    reaches the driver, and the n_blocks-row base table broadcasts back.
    → (id, rank, shard), output blocks in shuffled order."""
    import bisect

    import ray

    from search_engine_ray.functions.hashing import md5_hex_batch, mix64

    def add_key(b: pa.Table) -> pa.Table:
        b = b.combine_chunks()
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if hash_mode == "md5":
            hk = pa.array(md5_hex_batch([f"{i}-{salt}" for i in ids]),
                          pa.string())
        else:
            seed = np.uint64(int.from_bytes(
                salt.encode("utf-8")[:8].ljust(8, b"\0"), "little"))
            hv = mix64(ids.view(np.uint64) ^ seed)
            hk = pa.array([f"{v:016x}" for v in hv], pa.string())
        return pa.table({id_col: pa.array(ids, pa.int64()), "hk": hk})

    srt = (docs.map_batches(add_key, batch_format="pyarrow")
           .sort(["hk", id_col]).materialize())

    def block_head(b: pa.Table) -> pa.Table:
        b = b.combine_chunks()
        if b.num_rows == 0:
            return pa.table({"first": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        ids = b[id_col].to_numpy(zero_copy_only=False)
        return pa.table({"first": pa.array([f"{b['hk'][0].as_py()}:{ids[0]:020d}"]),
                         "n": pa.array([b.num_rows], pa.int64())})

    heads = sorted(
        (r["first"], r["n"])
        for r in srt.map_batches(block_head, batch_format="pyarrow",
                                 batch_size=None).take_all())
    firsts = [h[0] for h in heads]
    bases = np.concatenate([[0], np.cumsum([h[1] for h in heads])[:-1]]).astype(np.int64)
    plan = ray.put((firsts, bases))

    def stamp(b: pa.Table) -> pa.Table:
        b = b.combine_chunks()
        if b.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "rank": pa.array([], pa.int64()),
                             "shard": pa.array([], pa.int64())})
        f, bs = ray.get(plan)
        ids = b[id_col].to_numpy(zero_copy_only=False)
        key = f"{b['hk'][0].as_py()}:{ids[0]:020d}"
        i = bisect.bisect_left(f, key)
        assert i < len(f) and f[i] == key, "block head missing from rank plan"
        rank = bs[i] + np.arange(b.num_rows, dtype=np.int64)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "rank": pa.array(rank, pa.int64()),
                         "shard": pa.array(rank % n_shards, pa.int64())})

    return srt.map_batches(stamp, batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# URL canonicalization (C4/re-crawl-style)
# ---------------------------------------------------------------------------

#: canonicalization rule list — each step is a plain RE2-safe regex both
#: this module and the DuckDB oracle apply in the SAME order (no lookahead,
#: no backtracking), so canonical forms agree byte-for-byte across engines:
#:   1. strip the fragment
#:   2. drop utm_* tracking params (two inner passes + a tail pass: removing
#:      a param can make the next one adjacent)
#:   3. lowercase scheme://authority (ASCII)
#:   4. strip scheme-default ports (:80 http, :443 https)
#:   5. strip a bare trailing slash ("http://h" == "http://h/")
#:   6. strip a dangling '?' or '&' left by param removal
_URL_AUTH_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*"


def _canonical_url_arrow(urls: "pa.Array | pa.ChunkedArray") -> pa.Array:
    """Whole-batch canonicalization: every rule is an Arrow RE2 kernel
    (replace_substring_regex); the lowercase-authority rule composes
    extract + utf8_lower + element-wise join (RE2 rewrites can't change
    case). No per-url Python — this is the hot-path form."""
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    u = pc.fill_null(urls, "").cast(pa.string())
    u = pc.replace_substring_regex(u, r"#.*$", "")
    for _ in range(2):
        u = pc.replace_substring_regex(u, r"([?&])utm_[^&#]*&", r"\1")
    u = pc.replace_substring_regex(u, r"[?&]utm_[^&#]*$", "")
    # lowercase scheme://authority: split at the authority boundary
    head = pc.fill_null(
        pc.struct_field(pc.extract_regex(u, f"(?P<a>{_URL_AUTH_RE})"), "a"), "")
    rest = pc.replace_substring_regex(u, _URL_AUTH_RE, "", max_replacements=1)
    u = pc.binary_join_element_wise(pc.utf8_lower(head), rest, "")
    u = pc.replace_substring_regex(u, r"^(http://[^/:?#]+):80($|[/?])", r"\1\2")
    u = pc.replace_substring_regex(u, r"^(https://[^/:?#]+):443($|[/?])", r"\1\2")
    u = pc.replace_substring_regex(u, r"^([a-z][a-z0-9+.\-]*://[^/?#]+)/$", r"\1")
    return pc.replace_substring_regex(u, r"[?&]$", "")


def canonical_url_batch(urls: list) -> list:
    """List-in/list-out twin of :func:`_canonical_url_arrow` (same kernels
    under one pa.array round-trip; kept for scalar callers and tests)."""
    return _canonical_url_arrow(pa.array(urls, pa.string())).to_pylist()


def canonicalize_urls(pages, url_col: str = "url", out_col: str = "url_canon"):
    """Stamp a canonical-url column (map-only; the dedup key for re-crawl
    dedup — compose with latest_snapshot(url_col=out_col) to keep one
    newest capture per canonical page identity)."""

    def fn(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        return batch.append_column(out_col, _canonical_url_arrow(batch[url_col]))

    return pages.map_batches(fn, batch_format="pyarrow")


def host_mirrors(pages, min_shared: int = 1, max_hosts_per_hash: int = 50,
                 url_col: str = "url", text_col: str = "text"):
    """Mirror detection (the shared-content host-pair signal of Bharat &
    Broder, WWW'99): pairs of hosts serving IDENTICAL page content →
    (host_a, host_b, n_shared, overlap) with ``n_shared`` the number of
    distinct shared contents and ``overlap = n_shared / min(|a|, |b|)``
    over each host's distinct-content counts — the corpus-curation cue
    for collapsing mirrored sites before per-host caps and dedup.

    Content identity is md5(text). A content hash on more than
    ``max_hosts_per_hash`` hosts is dropped BEFORE pair expansion
    (near-universal boilerplate would otherwise amplify quadratically;
    the SQL oracle applies the identical cap). Shuffle shape: distinct
    (hash, host) via grouped_reduce → per-hash pair expansion inside
    complete sorted groups (≤ cap² pairs per group) → pair-count
    grouped_reduce → two hash joins for the per-host denominators.
    Nothing corpus-cardinality ever broadcasts."""
    from search_engine_ray.functions.hashing import md5_hex_batch
    from search_engine_ray.stages.grouped import (
        coalesce_for_join,
        grouped_reduce,
        sorted_group_map,
    )

    hosted = with_host(pages, url_col=url_col)

    def hash_host(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        if batch.num_rows == 0:
            return pa.table({"h": pa.array([], pa.string()),
                             "host": pa.array([], pa.string())})
        return pa.table({
            "h": pa.array(md5_hex_batch(
                pc.fill_null(batch[text_col], "").to_pylist()), pa.string()),
            "host": batch["host"],
        })

    distinct_hh = grouped_reduce(
        hosted.map_batches(hash_host, batch_format="pyarrow"),
        ["h", "host"]).materialize()

    def emit_pairs(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        empty = pa.table({"host_a": pa.array([], pa.string()),
                          "host_b": pa.array([], pa.string())})
        if t.num_rows == 0:
            return empty
        codes = t["h"].dictionary_encode().combine_chunks().indices.to_numpy(
            zero_copy_only=False)
        hosts = t["host"].to_pylist()
        new = np.empty(len(codes), bool)
        new[0] = True
        np.not_equal(codes[1:], codes[:-1], out=new[1:])
        bounds = np.append(np.flatnonzero(new), len(codes))
        a_out, b_out = [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            n = e - s
            if n < 2 or n > max_hosts_per_hash:
                continue
            grp = sorted(hosts[s:e])
            for i in range(n):
                for j in range(i + 1, n):
                    a_out.append(grp[i])
                    b_out.append(grp[j])
        return pa.table({"host_a": pa.array(a_out, pa.string()),
                         "host_b": pa.array(b_out, pa.string())})

    pairs = sorted_group_map(distinct_hh, ["h"], emit_pairs,
                             sort_cols=["h", "host"])
    shared = grouped_reduce(pairs, ["host_a", "host_b"],
                            count="n_shared").filter(
        expr=f"n_shared >= {int(min_shared)}").materialize()
    empty_out = pa.table({"host_a": pa.array([], pa.string()),
                          "host_b": pa.array([], pa.string()),
                          "n_shared": pa.array([], pa.int64()),
                          "overlap_r": pa.array([], pa.float64())})
    if shared.count() == 0:  # no mirrors: skip the joins (whose hash
        import ray.data     # shuffle chokes on schemaless empty blocks)
        return ray.data.from_arrow(empty_out)
    counts = grouped_reduce(distinct_hh, ["host"], count="n_content")

    npart = 8
    ca = counts.map_batches(
        lambda t: pa.table({"host_a": t["host"], "na": t["n_content"]}),
        batch_format="pyarrow")
    cb = counts.map_batches(
        lambda t: pa.table({"host_b": t["host"], "nb": t["n_content"]}),
        batch_format="pyarrow")
    j1 = coalesce_for_join(shared, npart).join(
        coalesce_for_join(ca, npart), join_type="inner",
        num_partitions=npart, on=("host_a",))
    joined = coalesce_for_join(j1, npart).join(
        coalesce_for_join(cb, npart), join_type="inner",
        num_partitions=npart, on=("host_b",))

    def finish(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.table({"host_a": pa.array([], pa.string()),
                             "host_b": pa.array([], pa.string()),
                             "n_shared": pa.array([], pa.int64()),
                             "overlap_r": pa.array([], pa.float64())})
        ns = t["n_shared"].to_numpy(zero_copy_only=False).astype(np.float64)
        na = t["na"].to_numpy(zero_copy_only=False).astype(np.float64)
        nb = t["nb"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "host_a": t["host_a"], "host_b": t["host_b"],
            "n_shared": t["n_shared"].cast(pa.int64()),
            "overlap_r": pa.array(np.round(ns / np.minimum(na, nb), 6),
                                  pa.float64()),
        })

    return joined.map_batches(finish, batch_format="pyarrow")


def host_mirrors_near(pages, url_col: str = "url", id_col: str = "doc_id",
                      text_col: str = "text", min_shared: int = 1,
                      **minhash_kw):
    """NEAR-duplicate mirror detection: host pairs whose pages are
    MinHash-verified near-duplicates of each other — catches mirrors
    that rewrap content with per-site chrome, which exact-hash
    :func:`host_mirrors` misses. → (host_a, host_b, n_near_dups),
    host_a < host_b, counting verified cross-host near-dup page pairs.

    Composition: the standard MinHash-LSH pipeline produces verified
    (a, b, jaccard) doc pairs; two hash joins map doc ids to hosts
    (doc→host is corpus-cardinality and stays sharded — never
    broadcast); same-host pairs drop; one grouped_reduce counts per
    host pair. Sketch-based, so rows-only at the driver (the underlying
    pair pipeline is property-verified in pytest)."""
    from search_engine_ray.pipelines.training_data import minhash_lsh_dedup
    from search_engine_ray.stages.grouped import coalesce_for_join, grouped_reduce

    hosted = with_host(pages, url_col=url_col).materialize()
    pairs = minhash_lsh_dedup(hosted, id_col=id_col, text_col=text_col,
                              **minhash_kw)
    id_host = hosted.map_batches(
        lambda b: pa.table({id_col: b[id_col].cast(pa.int64()),
                            "host": b["host"]}),
        batch_format="pyarrow").materialize()
    npart = 8

    def rn(ds, old, new):
        return ds.map_batches(
            lambda b, o=old, n=new: b.rename_columns(
                [n if c == o else c for c in b.column_names]),
            batch_format="pyarrow")

    j1 = coalesce_for_join(
        pairs.map_batches(lambda b: pa.table({
            "a": b["a"].cast(pa.int64()), "b": b["b"].cast(pa.int64())}),
            batch_format="pyarrow"), npart).join(
        coalesce_for_join(rn(rn(id_host, id_col, "a"), "host", "host_a"), npart),
        join_type="inner", num_partitions=npart, on=("a",))
    j2 = coalesce_for_join(j1, npart).join(
        coalesce_for_join(rn(rn(id_host, id_col, "b"), "host", "host_b"), npart),
        join_type="inner", num_partitions=npart, on=("b",))

    def cross_host(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        empty = pa.table({"host_a": pa.array([], pa.string()),
                          "host_b": pa.array([], pa.string())})
        if t.num_rows == 0:
            return empty
        ha = np.asarray(t["host_a"].to_pylist(), object)
        hb = np.asarray(t["host_b"].to_pylist(), object)
        keep = ha != hb
        lo = np.where(ha[keep] < hb[keep], ha[keep], hb[keep])
        hi = np.where(ha[keep] < hb[keep], hb[keep], ha[keep])
        return pa.table({"host_a": pa.array(lo.tolist(), pa.string()),
                         "host_b": pa.array(hi.tolist(), pa.string())})

    counts = grouped_reduce(
        j2.map_batches(cross_host, batch_format="pyarrow"),
        ["host_a", "host_b"], count="n_near_dups")
    return counts.filter(expr=f"n_near_dups >= {int(min_shared)}")
