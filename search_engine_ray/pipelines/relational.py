"""Relational pipelines over the TPC-H-shaped side tables — the classic
fact-table aggregate and the multi-way star join, expressed Ray-Data-first
(pruned reads, per-batch combiners, ONE fact-fact hash join, broadcast
dimensions). They demonstrate the engine's relational side next to the
full-text core; shapes generalize to any fact/dimension layout.

Scale notes (100-TB discipline):
* pricing_summary never shuffles rows — per-batch partial sums at group
  cardinality (a handful of (returnflag, linestatus) pairs) reduce in one
  tiny exchange; averages derive from sums/counts row-locally at the end.
* revenue_by_nation's only big exchange is lineitem ⋈ orders on orderkey
  (fact-fact, unavoidable); customer⇒nation collapses to ONE broadcast
  int→name lookup built driver-side (nation is 25 rows; customer is
  dimension-sized — at extreme scale where customer stops fitting, swap
  the lookup for a second hash join on custkey; documented seam).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from search_engine_ray.stages.grouped import grouped_reduce


def pricing_summary(lineitem: "ray.data.Dataset",
                    cutoff: "np.datetime64 | str" = "1998-09-01"
                    ) -> pd.DataFrame:
    """TPC-H Q1 shape: shipped-before-cutoff lines grouped by
    (l_returnflag, l_linestatus) with the standard sums/averages/count.
    → tiny DataFrame sorted by (returnflag, linestatus); column names
    match the oracle (sum_qty, sum_base_price, sum_disc_price,
    sum_charge, avg_qty, avg_price, avg_disc, count_order), averages
    rounded to 6."""
    cut = np.datetime64(str(cutoff), "us")

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        empty = pa.table({"l_returnflag": pa.array([], pa.string()),
                          "l_linestatus": pa.array([], pa.string()),
                          "s_qty": pa.array([], pa.float64()),
                          "s_price": pa.array([], pa.float64()),
                          "s_disc_price": pa.array([], pa.float64()),
                          "s_charge": pa.array([], pa.float64()),
                          "s_disc": pa.array([], pa.float64()),
                          "n": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        ship = batch["l_shipdate"].to_numpy(zero_copy_only=False)
        keep = ship <= cut
        if not keep.any():
            return empty
        b = batch.filter(pa.array(keep))
        qty = b["l_quantity"].to_numpy(zero_copy_only=False)
        price = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = b["l_discount"].to_numpy(zero_copy_only=False)
        tax = b["l_tax"].to_numpy(zero_copy_only=False)
        # composite group key via dictionary-encoding both small columns
        rf = b["l_returnflag"].dictionary_encode().combine_chunks()
        ls = b["l_linestatus"].dictionary_encode().combine_chunks()
        k = (rf.indices.to_numpy(zero_copy_only=False).astype(np.int64)
             * (len(ls.dictionary) + 1)
             + ls.indices.to_numpy(zero_copy_only=False))
        uniq, inv = np.unique(k, return_inverse=True)
        dp = price * (1.0 - disc)
        agg = lambda v: np.bincount(inv, weights=v, minlength=len(uniq))  # noqa: E731
        rf_of = rf.dictionary.take(pa.array(uniq // (len(ls.dictionary) + 1)))
        ls_of = ls.dictionary.take(pa.array(uniq % (len(ls.dictionary) + 1)))
        return pa.table({"l_returnflag": rf_of.cast(pa.string()),
                         "l_linestatus": ls_of.cast(pa.string()),
                         "s_qty": pa.array(agg(qty), pa.float64()),
                         "s_price": pa.array(agg(price), pa.float64()),
                         "s_disc_price": pa.array(agg(dp), pa.float64()),
                         "s_charge": pa.array(agg(dp * (1.0 + tax)), pa.float64()),
                         "s_disc": pa.array(agg(disc), pa.float64()),
                         "n": pa.array(np.bincount(inv, minlength=len(uniq))
                                       .astype(np.int64), pa.int64())})

    red = grouped_reduce(
        lineitem.map_batches(partial, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        sums=[("s_qty", "sum_qty"), ("s_price", "sum_base_price"),
              ("s_disc_price", "sum_disc_price"), ("s_charge", "sum_charge"),
              ("s_disc", "s_disc"), ("n", "count_order")],
    ).to_pandas()
    red["avg_qty"] = (red["sum_qty"] / red["count_order"]).round(6)
    red["avg_price"] = (red["sum_base_price"] / red["count_order"]).round(6)
    red["avg_disc"] = (red["s_disc"] / red["count_order"]).round(6)
    for c in ("sum_qty", "sum_base_price", "sum_disc_price", "sum_charge"):
        red[c] = red[c].round(4)
    out = red[["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
               "sum_disc_price", "sum_charge", "avg_qty", "avg_price",
               "avg_disc", "count_order"]]
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


def revenue_by_nation(lineitem: "ray.data.Dataset", orders: "ray.data.Dataset",
                      customer: "ray.data.Dataset", nation: "ray.data.Dataset",
                      date_from: str = "1996-01-01",
                      date_to: str = "1997-01-01",
                      broadcast_cap: int = 5_000_000) -> pd.DataFrame:
    """Star join: revenue Σ l_extendedprice·(1−l_discount) per customer
    nation for orders placed in [date_from, date_to). ONE fact-fact hash
    join (lineitem ⋈ filtered orders on l_orderkey); the customer⇒nation
    path follows the corpus operators' broadcast-or-join discipline:
    ≤ ``broadcast_cap`` customer rows collapse into a broadcast
    custkey→nation-name lookup (one ray.put, read per task), above it
    customer becomes a (o_custkey, n_name) Dataset — nation, always
    dim-tiny, broadcast onto it — hash-joined to the fact stream on
    o_custkey, so no worker ever holds the customer table.
    → (n_name, revenue_r) rounded to 4, identical on both paths."""
    d0 = np.datetime64(date_from, "us")
    d1 = np.datetime64(date_to, "us")

    use_join = customer.count() > broadcast_cap
    if use_join:
        # nation stays a broadcast (25ish rows); customer streams
        nat = nation.select_columns(["n_nationkey", "n_name"]).to_pandas()
        nk_sorted = np.sort(nat.n_nationkey.to_numpy().astype(np.int64))
        nord = np.argsort(nat.n_nationkey.to_numpy().astype(np.int64),
                          kind="stable")
        nref = ray.put((nk_sorted, nat.n_name.to_numpy()[nord]))

        def cust_named(batch: pa.Table) -> pa.Table:
            batch = batch.combine_chunks()
            if batch.num_rows == 0:
                return pa.table({"o_custkey": pa.array([], pa.int64()),
                                 "n_name": pa.array([], pa.string())})
            nks, nnames = ray.get(nref)
            nkeys = batch["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            i = np.clip(np.searchsorted(nks, nkeys), 0, len(nks) - 1)
            if not (nks[i] == nkeys).all():  # FK violation → loud, not wrong
                missing = nkeys[nks[i] != nkeys][:5]
                raise ValueError(f"c_nationkey values missing from nation: {missing}")
            return pa.table({"o_custkey": batch["c_custkey"].cast(pa.int64()),
                             "n_name": pa.array(list(nnames[i]), pa.string())})

        cn = (customer.select_columns(["c_custkey", "c_nationkey"])
              .map_batches(cust_named, batch_format="pyarrow"))
        ref = None
    else:
        # dimension lookup: custkey -> nation name (driver-side, dim-sized)
        cust = customer.select_columns(["c_custkey", "c_nationkey"]).to_pandas()
        nat = nation.select_columns(["n_nationkey", "n_name"]).to_pandas()
        nname = dict(zip(nat.n_nationkey, nat.n_name))
        ck = np.sort(cust.c_custkey.to_numpy().astype(np.int64))
        order_ = np.argsort(cust.c_custkey.to_numpy().astype(np.int64), kind="stable")
        cnation = np.asarray([nname[int(v)] for v in
                              cust.c_nationkey.to_numpy()[order_]], object)
        ref = ray.put((ck, cnation))

    def ofilter(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        if batch.num_rows == 0:
            return pa.table({"l_orderkey": pa.array([], pa.int64()),
                             "o_custkey": pa.array([], pa.int64())})
        od = batch["o_orderdate"].to_numpy(zero_copy_only=False)
        keep = (od >= d0) & (od < d1)
        b = batch.filter(pa.array(keep))
        return pa.table({"l_orderkey": b["o_orderkey"].cast(pa.int64()),
                         "o_custkey": b["o_custkey"].cast(pa.int64())})

    o = orders.select_columns(["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(ofilter, batch_format="pyarrow")
    li = lineitem.select_columns(["l_orderkey", "l_extendedprice", "l_discount"])
    try:
        ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:  # pragma: no cover
        ncpu = 8
    npart = max(4, ncpu // 2)
    # no coalesce_for_join here: both sides are corpus-scale-safe as-is
    # (the read produces no empty blocks; ofilter's empties carry a
    # schema, which is all the hash-shuffle join needs) — the fact table
    # must not pay the helper's materialize
    j = li.join(o, join_type="inner", num_partitions=npart, on=("l_orderkey",))

    def rev_partial(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        if batch.num_rows == 0:
            return pa.table({"n_name": pa.array([], pa.string()),
                             "rev": pa.array([], pa.float64())})
        if ref is not None:  # broadcast path: resolve names per batch
            ckeys, cnames = ray.get(ref)
            cust_ids = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            i = np.clip(np.searchsorted(ckeys, cust_ids), 0, len(ckeys) - 1)
            if not (ckeys[i] == cust_ids).all():  # FK violation → loud, not wrong
                missing = cust_ids[ckeys[i] != cust_ids][:5]
                raise ValueError(f"o_custkey values missing from customer: {missing}")
            names = cnames[i]
            uniq, inv = np.unique(names, return_inverse=True)
            uniq = list(uniq)
        else:  # join path: n_name arrived on the joined rows
            import pyarrow.compute as pc

            nn = batch["n_name"]
            if nn.null_count:  # FK violation → loud, like the broadcast path
                miss = batch.filter(pc.is_null(nn))["o_custkey"].to_pylist()[:5]
                raise ValueError(f"o_custkey values missing from customer: {miss}")
            enc = nn.dictionary_encode().combine_chunks()
            inv = enc.indices.to_numpy(zero_copy_only=False)
            uniq = enc.dictionary.cast(pa.string())
        rev = (batch["l_extendedprice"].to_numpy(zero_copy_only=False)
               * (1.0 - batch["l_discount"].to_numpy(zero_copy_only=False)))
        return pa.table({"n_name": pa.array(uniq, pa.string()),
                         "rev": pa.array(np.bincount(inv, weights=rev,
                                                     minlength=len(uniq)),
                                         pa.float64())})

    if use_join:
        from search_engine_ray.stages.grouped import coalesce_for_join

        # left_outer, not inner: a custkey missing from customer must fail
        # LOUDLY (null n_name in rev_partial), exactly like the broadcast
        # path — an inner join would silently drop that revenue. Both join
        # inputs coalesce: join1's empty output partitions are schemaless
        # and break join2's key resolution (hash joins fully buffer their
        # inputs anyway; this adds one pass of the date-FILTERED rows)
        j = coalesce_for_join(j, npart).join(
            coalesce_for_join(cn, npart), join_type="left_outer",
            num_partitions=npart, on=("o_custkey",))
    out = grouped_reduce(j.map_batches(rev_partial, batch_format="pyarrow"),
                         ["n_name"], sums=[("rev", "revenue")]).to_pandas()
    out["revenue_r"] = out["revenue"].round(4)
    return out[["n_name", "revenue_r"]].sort_values("n_name").reset_index(drop=True)


def validate_table(ds: "ray.data.Dataset", rules: list[dict],
                   id_col: str | None = None, sample_k: int = 3):
    """Data-quality validation (the expectations pattern): evaluate each
    rule over the whole Dataset and report per-rule violation counts
    plus up to ``sample_k`` offending ids. → (rule, n_violations,
    sample_ids string). Rules (all vectorized batch checks):

      {"rule": name, "kind": "not_null",  "col": c}
      {"rule": name, "kind": "unique",    "col": c}           (global)
      {"rule": name, "kind": "range",     "col": c, "lo": x, "hi": y}
      {"rule": name, "kind": "in_set",    "col": c, "allowed": [...]}
      {"rule": name, "kind": "regex",     "col": c, "pattern": p}

    Row-local rules reduce per block (rule-cardinality partials);
    ``unique`` is the one wide rule — one duplicate-key grouped reduce
    whose output is O(duplicated keys). The violation report is the
    gate a pipeline checks before publishing a snapshot."""
    import pyarrow.compute as pc

    from search_engine_ray.stages.grouped import grouped_reduce, sorted_group_map

    local = [r for r in rules if r["kind"] != "unique"]
    uniq_rules = [r for r in rules if r["kind"] == "unique"]

    def check(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        names, counts, samples = [], [], []
        ids = (batch[id_col].to_numpy(zero_copy_only=False)
               if id_col and id_col in batch.column_names else None)
        for r in local:
            col = batch[r["col"]]
            if r["kind"] == "not_null":
                bad = pc.is_null(col)
            elif r["kind"] == "range":
                v = pc.fill_null(col, r["lo"])  # nulls are not_null's job
                bad = pc.or_(pc.less(v, r["lo"]), pc.greater(v, r["hi"]))
            elif r["kind"] == "in_set":
                bad = pc.invert(pc.is_in(
                    pc.fill_null(col.cast(pa.string()), ""),
                    value_set=pa.array([str(a) for a in r["allowed"]],
                                       pa.string())))
            elif r["kind"] == "regex":
                bad = pc.invert(pc.match_substring_regex(
                    pc.fill_null(col.cast(pa.string()), ""), r["pattern"]))
            else:
                raise ValueError(f"unknown rule kind {r['kind']!r}")
            mask = bad.to_numpy(zero_copy_only=False)
            n = int(mask.sum())
            names.append(r["rule"])
            counts.append(n)
            if n and ids is not None:
                offenders = np.sort(ids[mask])[:sample_k]
                samples.append(",".join(str(int(x)) for x in offenders))
            else:
                samples.append("")
        return pa.table({"rule": pa.array(names, pa.string()),
                         "n_part": pa.array(counts, pa.int64()),
                         "sample": pa.array(samples, pa.string())})

    def combine(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.table({"rule": pa.array([], pa.string()),
                             "n_violations": pa.array([], pa.int64()),
                             "sample_ids": pa.array([], pa.string())})
        import pandas as pd_

        df = t.to_pandas()
        out = (df.groupby("rule", sort=True)
               .agg(n_violations=("n_part", "sum"),
                    sample_ids=("sample", lambda s: ",".join(
                        sorted(set(x for v in s if v
                                   for x in v.split(",")), key=int)[:sample_k])))
               .reset_index())
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = ds.map_batches(check, batch_format="pyarrow") if local else None
    results = []
    if parts is not None:
        results.append(sorted_group_map(parts, ["rule"], combine))

    for r in uniq_rules:
        col = r["col"]

        def dup_partial(batch: pa.Table, c=col) -> pa.Table:
            batch = batch.combine_chunks()
            enc = batch[c].cast(pa.string()).dictionary_encode().combine_chunks()
            n = np.bincount(enc.indices.to_numpy(zero_copy_only=False),
                            minlength=len(enc.dictionary))
            return pa.table({"k": enc.dictionary.cast(pa.string()),
                             "c_part": pa.array(n.astype(np.int64), pa.int64())})

        dups = grouped_reduce(ds.map_batches(dup_partial, batch_format="pyarrow"),
                              ["k"], sums=[("c_part", "c")]).filter(expr="c > 1")

        def dup_finish(t: pa.Table, name=r["rule"]) -> pa.Table:
            t = t.combine_chunks()
            c = t["c"].to_numpy(zero_copy_only=False)
            ks = t["k"].to_pylist()
            extra = int((c - 1).sum())
            # numeric order when keys are numeric (matches the local-rule
            # path and the ORDER BY <id> oracle — '2' before '10', not
            # after '100'); lexicographic fallback for non-numeric columns
            try:
                ks = sorted(ks, key=int)
            except (TypeError, ValueError):
                ks = sorted(ks)
            sample = ",".join(ks[:sample_k])
            return pa.table({"rule": pa.array([name], pa.string()),
                             "n_violations": pa.array([extra], pa.int64()),
                             "sample_ids": pa.array([sample], pa.string())})

        import ray.data as _rd

        dup_pdf = dups.to_pandas()
        if len(dup_pdf):
            tbl = dup_finish(pa.Table.from_pandas(dup_pdf, preserve_index=False))
        else:
            tbl = pa.table({"rule": pa.array([r["rule"]], pa.string()),
                            "n_violations": pa.array([0], pa.int64()),
                            "sample_ids": pa.array([""], pa.string())})
        results.append(_rd.from_arrow(tbl))

    out = results[0]
    for more in results[1:]:
        out = out.union(more)
    return out
