"""Web link-graph operators: href extraction from raw html and a
distributed PageRank power iteration.

PageRank is the canonical iterative join+groupby workload for a web-scale
engine: each iteration is

    contribs = edges ⋈ ranks (on src)  →  rank/out_deg per dst
    ranks'   = (1-d)/N + d · (Σ contribs per dst + dangling_mass/N)

Everything per-iteration is a Dataset hash join + a per-batch combiner +
one small groupby; the only driver-side values are three scalars per
iteration (N is iteration-invariant, dangling mass is an aggregate). Edges
and out-degrees are computed once and reused across iterations — at 100 TB
the edge table is the big side and it never re-shuffles (the join
partitioning is reused), while the rank table is one float per node.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data.aggregate import Sum

#: href="..." / href='...' — attribute-value extraction, case-insensitive
_HREF_RE = r"""(?i)href\s*=\s*["']([^"']+)["']"""


def extract_links(pages, url_col: str = "url", html_col: str = "html"):
    """(src, dst) edge Dataset from raw html bytes: every href attribute
    value becomes one edge. One compiled-regex scan per BATCH (rows joined
    on an unmatchable delimiter, offsets mapped back via searchsorted) —
    Arrow has no findall kernel, so this is the batch-vectorized shape."""
    import re

    pat = re.compile(_HREF_RE)

    def fn(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        if batch.num_rows == 0:
            return pa.table({"src": pa.array([], pa.string()),
                             "dst": pa.array([], pa.string())})
        srcs = np.asarray(batch[url_col].to_pylist(), dtype=object)
        texts = [
            (h.decode("utf-8", errors="replace") if isinstance(h, (bytes, bytearray))
             else ("" if h is None else str(h)))
            for h in batch[html_col].to_pylist()
        ]
        # ONE regex pass over the whole batch: rows joined with '"' (the
        # value charset [^"']+ and the attribute prefix both break on a
        # quote, so no match can span rows), match offsets mapped back to
        # rows via searchsorted over the row-start offsets.
        big = '"'.join(texts)
        starts = np.zeros(len(texts), np.int64)
        np.cumsum([len(t) + 1 for t in texts[:-1]], out=starts[1:])
        pos: list[int] = []
        dsts: list[str] = []
        for m in pat.finditer(big):
            pos.append(m.start())
            dsts.append(m.group(1))
        rows = np.searchsorted(starts, np.asarray(pos, np.int64), side="right") - 1
        return pa.table({"src": pa.array(srcs[rows], pa.string()),
                         "dst": pa.array(dsts, pa.string())})

    return pages.map_batches(fn, batch_format="pyarrow")


#: <a ... href="DST" ...>ANCHOR — anchor text runs to the next tag
_ANCHOR_RE = r"""(?is)<a\b[^>]*?href\s*=\s*["']([^"']+)["'][^>]*>([^<]*)"""


#: any <link ...> tag; cannot span rows when rows join on '>'
_LINK_TAG_RE = r"(?is)<link\b[^>]*>"
#: attribute values: quotes optional, unquoted stops at whitespace/>
_HREFLANG_ATTR = r'(?i)\bhreflang\s*=\s*["\']?([^"\'\s>]+)'
_HREF_ATTR = r'(?i)\bhref\s*=\s*["\']?([^"\'\s>]+)'
_REL_ALTERNATE = r'(?i)\brel\s*=\s*["\']?[^"\'>]*alternate'


def extract_hreflang(pages, url_col: str = "url", html_col: str = "html"):
    """(src, hreflang, href) rows from ``<link rel="alternate"
    hreflang=...>`` tags — the EXPLICIT cross-language page alignment
    sites publish (the supervision/eval signal for
    :func:`~search_engine_ray.pipelines.training_data.bitext_mine`'s
    mined pairs). Any attribute order, optional quotes, case-insensitive;
    tags missing rel=alternate, hreflang or href are skipped. One
    compiled-regex findall per BATCH over '>'-joined rows (a tag match
    cannot cross '>', so never a row boundary), then tag-cardinality
    attribute extraction — metadata density, not content density."""
    import re

    tag_pat = re.compile(_LINK_TAG_RE)
    lang_pat = re.compile(_HREFLANG_ATTR)
    href_pat = re.compile(_HREF_ATTR)
    rel_pat = re.compile(_REL_ALTERNATE)

    def fn(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        empty = pa.table({"src": pa.array([], pa.string()),
                          "hreflang": pa.array([], pa.string()),
                          "href": pa.array([], pa.string())})
        if batch.num_rows == 0:
            return empty
        srcs = np.asarray(batch[url_col].to_pylist(), dtype=object)
        texts = [
            (h.decode("utf-8", errors="replace") if isinstance(h, (bytes, bytearray))
             else ("" if h is None else str(h)))
            for h in batch[html_col].to_pylist()
        ]
        big = ">".join(texts)
        starts = np.zeros(len(texts), np.int64)
        np.cumsum([len(t) + 1 for t in texts[:-1]], out=starts[1:])
        pos, langs, hrefs = [], [], []
        for m in tag_pat.finditer(big):
            tag = m.group(0)
            if not rel_pat.search(tag):
                continue
            lm, hm = lang_pat.search(tag), href_pat.search(tag)
            if lm and hm:
                pos.append(m.start())
                langs.append(lm.group(1).lower())
                hrefs.append(hm.group(1))
        if not pos:
            return empty
        rows = np.searchsorted(starts, np.asarray(pos, np.int64), side="right") - 1
        return pa.table({"src": pa.array(srcs[rows], pa.string()),
                         "hreflang": pa.array(langs, pa.string()),
                         "href": pa.array(hrefs, pa.string())})

    return pages.map_batches(fn, batch_format="pyarrow")


_REL_CANONICAL = r'(?i)\brel\s*=\s*["\']?canonical["\'\s/>]'


def extract_canonical_tags(pages, url_col: str = "url", html_col: str = "html"):
    """(src, canonical) rows from ``<link rel="canonical" href=...>`` —
    the site-declared duplicate-group key that OVERRIDES URL
    normalization heuristics (webcorpus.canonical_urls) when present:
    dedup should group by the declared canonical first, the normalized
    URL as fallback. First canonical tag per page wins (sites publishing
    several are malformed); same batch findall shape as
    :func:`extract_hreflang`."""
    import re

    tag_pat = re.compile(_LINK_TAG_RE)
    href_pat = re.compile(_HREF_ATTR)
    rel_pat = re.compile(_REL_CANONICAL)

    def fn(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        empty = pa.table({"src": pa.array([], pa.string()),
                          "canonical": pa.array([], pa.string())})
        if batch.num_rows == 0:
            return empty
        srcs = np.asarray(batch[url_col].to_pylist(), dtype=object)
        texts = [
            (h.decode("utf-8", errors="replace") if isinstance(h, (bytes, bytearray))
             else ("" if h is None else str(h)))
            for h in batch[html_col].to_pylist()
        ]
        big = ">".join(texts)
        starts = np.zeros(len(texts), np.int64)
        np.cumsum([len(t) + 1 for t in texts[:-1]], out=starts[1:])
        seen: set[int] = set()
        pos, canon = [], []
        for m in tag_pat.finditer(big):
            tag = m.group(0)
            if not rel_pat.search(tag):
                continue
            hm = href_pat.search(tag)
            if not hm:
                continue
            row = int(np.searchsorted(starts, m.start(), side="right") - 1)
            if row in seen:  # first tag per page wins
                continue
            seen.add(row)
            pos.append(row)
            canon.append(hm.group(1))
        if not pos:
            return empty
        rows = np.asarray(pos, np.int64)
        return pa.table({"src": pa.array(srcs[rows], pa.string()),
                         "canonical": pa.array(canon, pa.string())})

    return pages.map_batches(fn, batch_format="pyarrow")


def extract_anchor_texts(pages, url_col: str = "url", html_col: str = "html"):
    """(src, dst, anchor) from raw html: the text between an <a href> tag
    and the next tag. Same one-scan-per-batch shape as extract_links; rows
    join on '"<' (group 1 breaks on the quote, group 2 and the literal tag
    parts break on '<', so no match spans rows)."""
    import re

    pat = re.compile(_ANCHOR_RE)

    def fn(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        empty = pa.table({"src": pa.array([], pa.string()),
                          "dst": pa.array([], pa.string()),
                          "anchor": pa.array([], pa.string())})
        if batch.num_rows == 0:
            return empty
        srcs = np.asarray(batch[url_col].to_pylist(), dtype=object)
        texts = [
            (h.decode("utf-8", errors="replace") if isinstance(h, (bytes, bytearray))
             else ("" if h is None else str(h)))
            for h in batch[html_col].to_pylist()
        ]
        big = '"<'.join(texts)
        starts = np.zeros(len(texts), np.int64)
        np.cumsum([len(t) + 2 for t in texts[:-1]], out=starts[1:])
        pos: list[int] = []
        dsts: list[str] = []
        anchors: list[str] = []
        for m in pat.finditer(big):
            pos.append(m.start())
            dsts.append(m.group(1))
            anchors.append(m.group(2))
        rows = np.searchsorted(starts, np.asarray(pos, np.int64), side="right") - 1
        return pa.table({"src": pa.array(srcs[rows], pa.string()),
                         "dst": pa.array(dsts, pa.string()),
                         "anchor": pa.array(anchors, pa.string())})

    return pages.map_batches(fn, batch_format="pyarrow")


def anchor_terms(pages, k: int = 3, url_col: str = "url",
                 html_col: str = "html"):
    """Per-TARGET anchor-text term profile — the classic link-text ranking
    signal: (dst, rank, term, n) with the top-k lowercase whitespace tokens
    of all anchors pointing at dst (rank by n desc, term asc). Combiner
    per batch; one groupby on (dst, term); per-dst top-k via the bounded
    group_topn shape."""
    anchors = extract_anchor_texts(pages, url_col=url_col, html_col=html_col)

    def explode(b: pa.Table) -> pa.Table:
        b = b.combine_chunks()
        empty = pa.table({"dst": pa.array([], pa.string()),
                          "term": pa.array([], pa.string()),
                          "n_part": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        toks = pc.utf8_split_whitespace(pc.utf8_lower(b["anchor"]))
        lens = pc.fill_null(pc.list_value_length(toks), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(toks)
        if len(flat) == 0:
            return empty
        dsts = b["dst"].take(pa.array(np.repeat(np.arange(len(lens)), lens)))
        keep = pc.not_equal(flat, "")
        tbl = pa.table({"dst": dsts.combine_chunks(), "term": flat}).filter(keep)
        if tbl.num_rows == 0:
            return empty
        # per-batch (dst, term) counts: dictionary-encode both columns and
        # bincount the fused code — sparse_knn's df_partial shape, no pandas
        de = tbl["dst"].combine_chunks().dictionary_encode()
        te = tbl["term"].combine_chunks().dictionary_encode()
        dc = de.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        tc = te.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nt = len(te.dictionary)
        uniq, counts = np.unique(dc * nt + tc, return_counts=True)
        return pa.table({
            "dst": de.dictionary.take(pa.array(uniq // nt)).cast(pa.string()),
            "term": te.dictionary.take(pa.array(uniq % nt)).cast(pa.string()),
            "n_part": pa.array(counts.astype(np.int64), pa.int64())})

    # (dst × term) cardinality scales with the anchor corpus —
    # sort+reduceat, not Ray's hash groupby (see grouped_reduce)
    from search_engine_ray.stages.grouped import grouped_reduce, sorted_group_map

    counts = grouped_reduce(anchors.map_batches(explode, batch_format="pyarrow"),
                            ["dst", "term"], sums=[("n_part", "n")])

    # top-k per dst by (n desc, term asc) — a two-column order, so rank in
    # a sorted_group_map kernel (group_topn orders by one column only)

    def topk_block(b: pa.Table) -> pa.Table:
        b = b.combine_chunks()
        if b.num_rows == 0:
            return pa.table({"dst": pa.array([], pa.string()),
                             "rank": pa.array([], pa.int64()),
                             "term": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        enc = b["dst"].dictionary_encode().combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        terms = np.asarray(b["term"].to_pylist(), dtype=object)
        order = np.lexsort((terms, -n, codes))
        sc = codes[order]
        change = np.empty(len(sc), bool)
        change[0] = True
        change[1:] = sc[1:] != sc[:-1]
        gstart = np.maximum.accumulate(np.where(change, np.arange(len(sc)), 0))
        rank = np.arange(len(sc)) - gstart
        sel = rank < k
        take = order[sel]
        return pa.table({
            "dst": b["dst"].take(pa.array(take)),
            "rank": pa.array(rank[sel] + 1, pa.int64()),
            "term": b["term"].take(pa.array(take)),
            "n": b["n"].take(pa.array(take)).cast(pa.int64()),
        })

    return sorted_group_map(counts, ["dst"], topk_block,
                            sort_cols=["dst", "term"])


def _nparts() -> int:
    try:
        ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:  # pragma: no cover
        ncpu = 8
    return max(4, ncpu // 2)


def _sum_by_key(ds, key_col: str, val_col: str, out_col: str):
    """Partial per-batch float sums + one node-cardinality sort+reduceat
    reduction (grouped_reduce; Ray's hash groupby is superlinear in group
    count and this runs once per PageRank iteration)."""
    from search_engine_ray.stages.grouped import grouped_reduce

    def partial(b: pa.Table) -> pa.Table:
        b = b.combine_chunks()
        if b.num_rows == 0:
            return pa.table({key_col: pa.array([], pa.string()),
                             "s_part": pa.array([], pa.float64())})
        enc = b[key_col].dictionary_encode().combine_chunks()
        s = np.bincount(enc.indices.to_numpy(zero_copy_only=False),
                        weights=b[val_col].to_numpy(zero_copy_only=False),
                        minlength=len(enc.dictionary))
        return pa.table({key_col: enc.dictionary.cast(pa.string()),
                         "s_part": pa.array(s, pa.float64())})

    return grouped_reduce(ds.map_batches(partial, batch_format="pyarrow"),
                          [key_col], sums=[("s_part", out_col)])


def degree_stats(edges):
    """(node, out_deg, in_deg) for every node in the graph — the basic
    connectivity profile (and the skew signal for partitioning decisions:
    a dst with in_deg ≈ |E| means the contribution groupby needs salting).
    Two combiner+groupby passes and one hash join; nothing driver-side."""

    def count_col(col: str, out: str):
        def partial(b: pa.Table) -> pa.Table:
            b = b.combine_chunks()
            if b.num_rows == 0:
                return pa.table({"node": pa.array([], pa.string()),
                                 "d_part": pa.array([], pa.int64())})
            enc = b[col].dictionary_encode().combine_chunks()
            c = np.bincount(enc.indices.to_numpy(zero_copy_only=False),
                            minlength=len(enc.dictionary))
            return pa.table({"node": enc.dictionary.cast(pa.string()),
                             "d_part": pa.array(c.astype(np.int64), pa.int64())})

        from search_engine_ray.stages.grouped import grouped_reduce

        return grouped_reduce(edges.map_batches(partial, batch_format="pyarrow"),
                              ["node"], sums=[("d_part", out)])

    out_d = count_col("src", "out_deg")
    in_d = count_col("dst", "in_deg")
    joined = out_d.join(in_d, join_type="full_outer",
                        num_partitions=_nparts(), on=("node",))

    def fill(b: pa.Table) -> pa.Table:
        b = b.combine_chunks()
        o = b["out_deg"].to_numpy(zero_copy_only=False)
        i = b["in_deg"].to_numpy(zero_copy_only=False)
        o = np.where(np.isnan(o.astype(np.float64)), 0, o).astype(np.int64)
        i = np.where(np.isnan(i.astype(np.float64)), 0, i).astype(np.int64)
        return pa.table({"node": b["node"],
                         "out_deg": pa.array(o, pa.int64()),
                         "in_deg": pa.array(i, pa.int64())})

    return joined.map_batches(fill, batch_format="pyarrow")


def resolve_redirects(redirects, max_chain: int = 32,
                      src_col: str = "src", dst_col: str = "dst"):
    """Resolve HTTP-redirect chains to their terminal target → (src,
    final_url, hops) for every source whose chain ends within
    ``max_chain`` hops; cycles and longer chains produce NO row (they
    have no terminal). The canonical crawl-frontier op: dedup and
    ranking must credit the final URL, not the hop.

    Input is (src, dst) one-hop redirect edges; a src with several
    recorded targets keeps its MIN dst (deterministic). Pointer
    JUMPING, not a walk: each round composes the mapping with itself
    (one hash join), so chain depth covered doubles per round —
    ceil(log2(max_chain)) joins total, the clusters_distributed
    shortcut applied to paths. Hops compose additively through the
    jump, so the reported count is the true unit-step chain length."""
    import math

    from search_engine_ray.stages.grouped import coalesce_for_join, grouped_reduce

    base = grouped_reduce(
        redirects.map_batches(
            lambda b: pa.table({"src": b[src_col].cast(pa.string()),
                                "dst": b[dst_col].cast(pa.string())}),
            batch_format="pyarrow"),
        ["src"], mins=[("dst", "dst")])

    def seed(b: pa.Table) -> pa.Table:
        b = b.combine_chunks()
        # self-redirects are degenerate cycles — no terminal
        keep = pc.invert(pc.equal(b["src"], b["dst"]))
        t = b.filter(keep)
        return pa.table({"src": t["src"], "cur": t["dst"],
                         "hops": pa.array(np.ones(t.num_rows, np.int64),
                                          pa.int64())})

    m = coalesce_for_join(base.map_batches(seed, batch_format="pyarrow"),
                          _nparts())
    rounds = max(1, math.ceil(math.log2(max(2, max_chain))))
    for _ in range(rounds):
        j = m.join(m, join_type="left_outer", num_partitions=_nparts(),
                   on=("cur",), right_on=("src",), right_suffix="_m")

        def compose(b: pa.Table) -> pa.Table:
            b = b.combine_chunks()
            if b.num_rows == 0:
                return pa.table({"src": pa.array([], pa.string()),
                                 "cur": pa.array([], pa.string()),
                                 "hops": pa.array([], pa.int64())})
            hit = pc.is_valid(b["cur_m"])
            cur = pc.if_else(hit, b["cur_m"], b["cur"])
            hops = pc.add(b["hops"],
                          pc.if_else(hit, pc.fill_null(b["hops_m"], 0),
                                     pa.scalar(0, pa.int64())))
            # a jump that lands back on the ORIGIN is a cycle: freeze it
            # past max_chain so it can't masquerade as resolved later
            cyc = pc.equal(cur, b["src"])
            hops = pc.if_else(cyc, pa.scalar(int(max_chain) + 1, pa.int64()),
                              hops)
            return pa.table({"src": b["src"], "cur": cur,
                             "hops": hops.cast(pa.int64())})

        m = coalesce_for_join(j.map_batches(compose, batch_format="pyarrow"),
                              _nparts())

    # terminal = cur is not itself a redirect source; drop over-cap rows
    fin = m.join(base, join_type="left_outer", num_partitions=_nparts(),
                 on=("cur",), right_on=("src",), right_suffix="_t")

    def finish(b: pa.Table) -> pa.Table:
        b = b.combine_chunks()
        if b.num_rows == 0:
            return pa.table({"src": pa.array([], pa.string()),
                             "final_url": pa.array([], pa.string()),
                             "hops": pa.array([], pa.int64())})
        terminal = pc.is_null(b["dst"])  # right's only non-key column
        ok = pc.and_(terminal,
                     pc.less_equal(b["hops"], pa.scalar(int(max_chain),
                                                        pa.int64())))
        t = b.filter(ok)
        return pa.table({"src": t["src"], "final_url": t["cur"],
                         "hops": t["hops"]})

    return fin.map_batches(finish, batch_format="pyarrow")


def reciprocal_link_stats(edges, src_col: str = "src", dst_col: str = "dst"):
    """Per-source-host reciprocal-link profile — the classic link-farm /
    link-exchange spam signal (organic webs link mostly one-way;
    mutual-admiration rings don't): → (host, n_edges, n_reciprocal,
    reciprocal_frac_r) over DISTINCT non-self directed edges, where an
    edge is reciprocal iff its reverse also exists.

    Shape: one pair-cardinality distinct reduce, then ONE sort-co-group
    on the unordered (lo, hi) endpoint key — a bucket holds at most the
    two directions, so reciprocity is a group-size-2 test, no self-join —
    and a host-cardinality combiner reduce. Nothing driver-side."""
    from search_engine_ray.pipelines.webcorpus import host_of
    from search_engine_ray.stages.grouped import grouped_reduce, sorted_group_map

    def norm(b: pa.Table) -> pa.Table:
        b = b.combine_chunks()
        s = b[src_col].cast(pa.string())
        d = b[dst_col].cast(pa.string())
        keep = pc.invert(pc.equal(s, d))  # self-loops are never reciprocal
        t = pa.table({"src": s, "dst": d}).filter(keep).combine_chunks()
        lo = pc.min_element_wise(t["src"], t["dst"])
        hi = pc.max_element_wise(t["src"], t["dst"])
        return pa.table({"lo": lo, "hi": hi, "src": t["src"], "dst": t["dst"]})

    distinct = grouped_reduce(
        edges.map_batches(norm, batch_format="pyarrow"),
        ["lo", "hi", "src", "dst"])

    def recip_kernel(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        empty = pa.table({"host": pa.array([], pa.string()),
                          "n_part": pa.array([], pa.int64()),
                          "r_part": pa.array([], pa.int64())})
        n = t.num_rows
        if n == 0:
            return empty
        le = t["lo"].dictionary_encode().combine_chunks()
        he = t["hi"].dictionary_encode().combine_chunks()
        lc = le.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        hc = he.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        fused = lc * (hc.max() + 1 if n else 1) + hc
        change = np.r_[True, fused[1:] != fused[:-1]]
        gid = np.cumsum(change) - 1
        sizes = np.bincount(gid)
        recip = (sizes[gid] == 2).astype(np.int64)  # both directions present
        hosts = host_of(t["src"])
        enc = hosts.dictionary_encode().combine_chunks() \
            if isinstance(hosts, pa.ChunkedArray) else hosts.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        nh = len(enc.dictionary)
        return pa.table({
            "host": enc.dictionary.cast(pa.string()),
            "n_part": pa.array(np.bincount(codes, minlength=nh).astype(np.int64),
                               pa.int64()),
            "r_part": pa.array(np.bincount(codes, weights=recip,
                                           minlength=nh).astype(np.int64),
                               pa.int64())})

    parts = sorted_group_map(distinct, ["lo", "hi"], recip_kernel)
    red = grouped_reduce(parts, ["host"],
                         sums=[("n_part", "n_edges"), ("r_part", "n_reciprocal")])

    def finish(b: pa.Table) -> pa.Table:
        b = b.combine_chunks()
        n = b["n_edges"].to_numpy(zero_copy_only=False).astype(np.float64)
        r = b["n_reciprocal"].to_numpy(zero_copy_only=False).astype(np.float64)
        return b.append_column(
            "reciprocal_frac_r",
            pa.array(np.round(r / np.maximum(n, 1), 6), pa.float64()))

    return red.map_batches(finish, batch_format="pyarrow")


def pagerank(edges, n_iters: int = 3, damping: float = 0.85,
             round_digits: int = 6, tol: float | None = None):
    """(node, rank_r) after ``n_iters`` power iterations from the uniform
    start, with dangling-node mass redistributed uniformly. Nodes = distinct
    src ∪ dst. Deterministic up to float64 summation order (ranks are
    rounded to ``round_digits``).

    ``tol``: optional L1 convergence stop — iterate until
    Σ|rank' - rank| < tol (checked with one extra small join per
    iteration over the rank table, never the edges), capped at
    ``n_iters``. With tol set, pass a generous n_iters cap."""
    edges = edges.materialize()

    def halves(b: pa.Table, col: str) -> pa.Table:
        # per-batch dedup so the distinct groupby moves unique ids only
        return pa.table({"node": b[col].combine_chunks().unique().cast(pa.string())})

    from search_engine_ray.stages.grouped import grouped_reduce

    nodes = grouped_reduce(
        edges.map_batches(lambda b: halves(b, "src"), batch_format="pyarrow")
        .union(edges.map_batches(lambda b: halves(b, "dst"), batch_format="pyarrow")),
        ["node"]).materialize()  # node-cardinality distinct
    n_nodes = nodes.count()

    # out-degrees (src, out_deg), computed once
    def deg_partial(b: pa.Table) -> pa.Table:
        b = b.combine_chunks()
        if b.num_rows == 0:
            return pa.table({"src": pa.array([], pa.string()),
                             "d_part": pa.array([], pa.int64())})
        enc = b["src"].dictionary_encode().combine_chunks()
        c = np.bincount(enc.indices.to_numpy(zero_copy_only=False),
                        minlength=len(enc.dictionary))
        return pa.table({"src": enc.dictionary.cast(pa.string()),
                         "d_part": pa.array(c.astype(np.int64), pa.int64())})

    deg = grouped_reduce(edges.map_batches(deg_partial, batch_format="pyarrow"),
                         ["src"], sums=[("d_part", "out_deg")]).materialize()
    nparts = _nparts()

    # ranks_0: uniform 1/N
    r0 = 1.0 / n_nodes
    ranks = nodes.map_batches(
        lambda b: pa.table({"node": b["node"],
                            "rank": pa.array(np.full(b.num_rows, r0), pa.float64())}),
        batch_format="pyarrow").materialize()

    for _ in range(n_iters):
        # per-node share = rank/out_deg for nodes WITH outlinks
        withdeg = ranks.join(
            deg.map_batches(lambda b: pa.table({"node": b["src"], "out_deg": b["out_deg"]}),
                            batch_format="pyarrow"),
            join_type="left_outer", num_partitions=nparts, on=("node",))

        def share(b: pa.Table) -> pa.Table:
            b = b.combine_chunks()
            if b.num_rows == 0:
                return pa.table({"node": pa.array([], pa.string()),
                                 "share": pa.array([], pa.float64()),
                                 "dangling": pa.array([], pa.float64())})
            r = b["rank"].to_numpy(zero_copy_only=False)
            d = b["out_deg"].to_numpy(zero_copy_only=False).astype(np.float64)
            isdang = np.isnan(d) | (d == 0)
            return pa.table({
                "node": b["node"],
                "share": pa.array(np.where(isdang, 0.0, r / np.where(isdang, 1.0, d)),
                                  pa.float64()),
                "dangling": pa.array(np.where(isdang, r, 0.0), pa.float64()),
            })

        shares = withdeg.map_batches(share, batch_format="pyarrow").materialize()
        dang_mass = shares.aggregate(Sum("dangling", alias_name="m"))["m"] or 0.0

        contrib_rows = edges.join(
            shares.map_batches(lambda b: pa.table({"src": b["node"], "share": b["share"]}),
                               batch_format="pyarrow"),
            join_type="inner", num_partitions=nparts, on=("src",))
        sums = _sum_by_key(contrib_rows, "dst", "share", "s")
        base = (1.0 - damping) / n_nodes + damping * dang_mass / n_nodes

        merged = nodes.join(
            sums.map_batches(lambda b: pa.table({"node": b["dst"], "s": b["s"]}),
                             batch_format="pyarrow"),
            join_type="left_outer", num_partitions=nparts, on=("node",))

        def new_rank(b: pa.Table) -> pa.Table:
            b = b.combine_chunks()
            if b.num_rows == 0:
                return pa.table({"node": pa.array([], pa.string()),
                                 "rank": pa.array([], pa.float64())})
            s = b["s"].to_numpy(zero_copy_only=False)
            s = np.where(np.isnan(s), 0.0, s)
            return pa.table({"node": b["node"],
                             "rank": pa.array(base + damping * s, pa.float64())})

        new_ranks = merged.map_batches(new_rank, batch_format="pyarrow").materialize()
        if tol is not None:
            both = new_ranks.join(
                ranks.map_batches(
                    lambda b: pa.table({"node": b["node"], "prev": b["rank"]}),
                    batch_format="pyarrow"),
                join_type="inner", num_partitions=nparts, on=("node",))

            def absdiff(b: pa.Table) -> pa.Table:
                b = b.combine_chunks()
                d = np.abs(b["rank"].to_numpy(zero_copy_only=False)
                           - b["prev"].to_numpy(zero_copy_only=False))
                return pa.table({"d": pa.array([float(d.sum())], pa.float64())})

            delta = both.map_batches(absdiff, batch_format="pyarrow") \
                .aggregate(Sum("d", alias_name="s"))["s"] or 0.0
            ranks = new_ranks
            if delta < tol:
                break
        else:
            ranks = new_ranks

    def finish(b: pa.Table) -> pa.Table:
        b = b.combine_chunks()
        return pa.table({
            "node": b["node"],
            "rank_r": pa.array(
                np.round(b["rank"].to_numpy(zero_copy_only=False), round_digits),
                pa.float64()),
        })

    return ranks.map_batches(finish, batch_format="pyarrow")


def hits(edges, n_iters: int = 3, round_digits: int = 6):
    """HITS hubs & authorities (Kleinberg, JACM'99): mutual
    reinforcement — auth(v) = Σ hub(u) over edges u→v, hub(u) = Σ auth(v)
    over u→v — L1-normalized after each half-step, from a uniform hub
    start. → (node, auth_r, hub_r) over distinct src ∪ dst (0.0 where a
    node has no in/out links). The topic-distillation companion of
    PageRank: authorities are what navigational queries want, hubs are
    the link-list pages pointing at them.

    Distributed shape = pagerank's: each half-step is ONE edges ⋈ scores
    hash join plus a node-cardinality sort+reduceat reduction; the
    normalizer rides a scalar aggregate. Nothing holds more than the
    node-cardinality score table."""
    from ray.data.aggregate import Sum

    from search_engine_ray.stages.grouped import coalesce_for_join, grouped_reduce

    edges = edges.materialize()
    nparts = _nparts()

    def halves(b: pa.Table, col: str) -> pa.Table:
        return pa.table({"node": b[col].combine_chunks().unique().cast(pa.string())})

    nodes = grouped_reduce(
        edges.map_batches(lambda b: halves(b, "src"), batch_format="pyarrow")
        .union(edges.map_batches(lambda b: halves(b, "dst"), batch_format="pyarrow")),
        ["node"]).materialize()
    n_nodes = nodes.count()
    if n_nodes == 0:
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.string()),
            "auth_r": pa.array([], pa.float64()),
            "hub_r": pa.array([], pa.float64())}))

    def _norm_over_nodes(sums, key_col: str):
        """nodes LEFT JOIN per-key sums → L1-normalized score table
        (node, v); missing keys get 0."""
        total = sums.aggregate(Sum("s", alias_name="t"))["t"] or 0.0
        merged = coalesce_for_join(nodes, nparts).join(
            coalesce_for_join(
                sums.map_batches(lambda b: pa.table({"node": b[key_col], "s": b["s"]}),
                                 batch_format="pyarrow"), nparts),
            join_type="left_outer", num_partitions=nparts, on=("node",))

        def fin(b: pa.Table) -> pa.Table:
            b = b.combine_chunks()
            if b.num_rows == 0:
                return pa.table({"node": pa.array([], pa.string()),
                                 "v": pa.array([], pa.float64())})
            s = b["s"].to_numpy(zero_copy_only=False)
            s = np.where(np.isnan(s), 0.0, s)
            v = s / total if total else s
            return pa.table({"node": b["node"],
                             "v": pa.array(v, pa.float64())})

        return merged.map_batches(fin, batch_format="pyarrow").materialize()

    h0 = 1.0 / n_nodes
    hubs = nodes.map_batches(
        lambda b: pa.table({"node": b["node"],
                            "v": pa.array(np.full(b.num_rows, h0), pa.float64())}),
        batch_format="pyarrow").materialize()
    auth = hubs  # placeholder; set in the loop

    for _ in range(n_iters):
        rows = coalesce_for_join(edges, nparts).join(
            coalesce_for_join(
                hubs.map_batches(lambda b: pa.table({"src": b["node"], "h": b["v"]}),
                                 batch_format="pyarrow"), nparts),
            join_type="inner", num_partitions=nparts, on=("src",))
        auth = _norm_over_nodes(_sum_by_key(rows, "dst", "h", "s"), "dst")
        rows2 = coalesce_for_join(edges, nparts).join(
            coalesce_for_join(
                auth.map_batches(lambda b: pa.table({"dst": b["node"], "a": b["v"]}),
                                 batch_format="pyarrow"), nparts),
            join_type="inner", num_partitions=nparts, on=("dst",))
        hubs = _norm_over_nodes(_sum_by_key(rows2, "src", "a", "s"), "src")

    both = coalesce_for_join(auth.map_batches(
        lambda b: pa.table({"node": b["node"], "a": b["v"]}),
        batch_format="pyarrow"), nparts).join(
        coalesce_for_join(
            hubs.map_batches(lambda b: pa.table({"node": b["node"], "h": b["v"]}),
                             batch_format="pyarrow"), nparts),
        join_type="inner", num_partitions=nparts, on=("node",))

    def fin(b: pa.Table) -> pa.Table:
        b = b.combine_chunks()
        if b.num_rows == 0:
            return pa.table({"node": pa.array([], pa.string()),
                             "auth_r": pa.array([], pa.float64()),
                             "hub_r": pa.array([], pa.float64())})
        return pa.table({
            "node": b["node"],
            "auth_r": pa.array(np.round(
                b["a"].to_numpy(zero_copy_only=False), round_digits), pa.float64()),
            "hub_r": pa.array(np.round(
                b["h"].to_numpy(zero_copy_only=False), round_digits), pa.float64()),
        })

    return both.map_batches(fin, batch_format="pyarrow")


def link_components(edges, max_iters: int = 100):
    """Connected components of the UNDIRECTED link graph → (node,
    component) with ``component`` = the lexicographically smallest url in
    the component — the web-graph grouping behind site clustering and
    crawl-frontier partitioning. Nodes dense-rank via one sort
    (zip_with_index, so the min integer label IS the lexicographic min
    url — exact, no hash-collision risk), edges map to int pairs through
    two hash joins, and the component labels come from the same
    distributed min-label propagation as near-dup clustering
    (training_data.clusters_distributed, label-sum fixpoint)."""
    from search_engine_ray.pipelines.training_data import clusters_distributed
    from search_engine_ray.stages.doc_ids import zip_with_index
    from search_engine_ray.stages.grouped import coalesce_for_join, grouped_reduce

    edges = edges.materialize()
    nparts = _nparts()

    def halves(b: pa.Table, col: str) -> pa.Table:
        return pa.table({"node": b[col].combine_chunks().unique().cast(pa.string())})

    nodes = grouped_reduce(
        edges.map_batches(lambda b: halves(b, "src"), batch_format="pyarrow")
        .union(edges.map_batches(lambda b: halves(b, "dst"), batch_format="pyarrow")),
        ["node"])
    ids = zip_with_index(nodes, "node", "nid", start=1).materialize()

    def side(col: str, out: str):
        return ids.map_batches(
            lambda b, c=col, o=out: pa.table({c: b["node"], o: b["nid"]}),
            batch_format="pyarrow")

    pairs = (coalesce_for_join(edges, nparts)
             .join(coalesce_for_join(side("src", "a"), nparts),
                   join_type="inner", num_partitions=nparts, on=("src",)))
    pairs = (coalesce_for_join(pairs, nparts)
             .join(coalesce_for_join(side("dst", "b"), nparts),
                   join_type="inner", num_partitions=nparts, on=("dst",))
             .select_columns(["a", "b"]))

    comp = clusters_distributed(pairs, max_iters=max_iters)

    # label ids back to urls: nid -> node for both the member and the rep
    back = coalesce_for_join(
        comp.map_batches(
            lambda b: pa.table({"nid": b["doc_id"].cast(pa.int64()),
                                "rep": b["cluster_id"].cast(pa.int64())}),
            batch_format="pyarrow"), nparts).join(
        coalesce_for_join(ids.map_batches(
            lambda b: pa.table({"nid": b["nid"], "node": b["node"]}),
            batch_format="pyarrow"), nparts),
        join_type="inner", num_partitions=nparts, on=("nid",))
    out = coalesce_for_join(
        back.map_batches(lambda b: pa.table({"node": b["node"],
                                             "rep": b["rep"]}),
                         batch_format="pyarrow"), nparts).join(
        coalesce_for_join(ids.map_batches(
            lambda b: pa.table({"rep": b["nid"], "component": b["node"]}),
            batch_format="pyarrow"), nparts),
        join_type="inner", num_partitions=nparts, on=("rep",))
    return out.select_columns(["node", "component"])
