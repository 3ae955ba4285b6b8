"""Event-stream operators over the events table (event_id, ts, user_id,
event_type, value, props): tumbling-window aggregation and gap-based
sessionization — the windowed/streaming-aggregate operator family a
training-data pipeline needs for behavioural data, expressed batch-first
(a windowed aggregate over a bounded table ≡ the replay of the streaming
computation; the partitioning key — user_id for sessions, window bucket
for tumbling windows — is exactly what a streaming shard would key on).

Both operators are SQL-expressible and oracle-checked by the driver
(event_windows, event_sessions).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

US_PER_HOUR = 3_600_000_000
US_PER_MIN = 60_000_000


def _ts_us(col) -> np.ndarray:
    """Timestamp column → epoch MICROseconds, whatever the storage unit
    (parquet testdata is timestamp[us], pandas-sourced data timestamp[ns] —
    a raw int64 cast would silently scale gaps 1000x)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_timestamp(arr.type) and arr.type.unit != "us":
        arr = arr.cast(pa.timestamp("us"))
    return arr.cast(pa.int64()).to_numpy(zero_copy_only=False)


def tumbling_window_agg(events: "ray.data.Dataset", window_us: int = US_PER_HOUR):
    """Tumbling windows per (window_start, event_type) → n_events +
    sum_value. Partial aggregation happens inside map_batches (vectorized
    bucket arithmetic); the final groupby only moves ~n_windows ×
    n_event_types rows however large the input."""

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        ts = _ts_us(batch["ts"])
        win = (ts // window_us) * window_us
        etype = batch["event_type"]
        # composite grouping via dictionary codes + window bucket. Window
        # starts are factorized to DENSE codes first: win is an epoch-µs
        # value (~1.8e15), so `win * k + code` would silently overflow int64
        # once k (distinct event types per batch) passes ~5000.
        enc = (etype.combine_chunks() if isinstance(etype, pa.ChunkedArray) else etype).dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uw_win, wcodes = np.unique(win, return_inverse=True)
        k = np.int64(len(enc.dictionary) + 1)
        uw, inv = np.unique(wcodes * k + codes, return_inverse=True)
        n = np.bincount(inv)
        sv = np.bincount(inv, weights=batch["value"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "window_start_us": pa.array(uw_win[(uw // k).astype(np.int64)], pa.int64()),
                "event_type": enc.dictionary.take(pa.array((uw % k).astype(np.int64))).cast(pa.string()),
                "n_part": pa.array(n.astype(np.int64), pa.int64()),
                "v_part": pa.array(sv, pa.float64()),
            }
        )

    from search_engine_ray.stages.grouped import grouped_reduce

    # (window x type) cardinality grows with the event span — sort+reduceat
    partials = events.map_batches(partial, batch_format="pyarrow")
    agg = grouped_reduce(partials, ["window_start_us", "event_type"],
                         sums=[("n_part", "n_events"), ("v_part", "sum_value")])

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "window_start_us": batch["window_start_us"],
                "event_type": batch["event_type"],
                "n_events": batch["n_events"].cast(pa.int64()),
                "sum_value": batch["sum_value"],
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def hopping_window_agg(events: "ray.data.Dataset", window_us: int = US_PER_HOUR,
                       hop_us: int = US_PER_HOUR // 4):
    """HOPPING (sliding) windows per (window_start, event_type): windows of
    ``window_us`` starting every ``hop_us``; an event at t belongs to the
    ``window_us / hop_us`` windows with start in (t - window_us, t]. Same
    partial-aggregation shape as the tumbling op — each batch explodes
    events × r windows, combines locally, and the final groupby moves only
    ~n_windows × n_event_types rows. ``window_us`` must be a multiple of
    ``hop_us`` (aligned hops; the general case is a composition)."""
    if window_us % hop_us:
        raise ValueError("window_us must be a multiple of hop_us")
    r = window_us // hop_us

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        empty = pa.table({"window_start_us": pa.array([], pa.int64()),
                          "event_type": pa.array([], pa.string()),
                          "n_part": pa.array([], pa.int64()),
                          "v_part": pa.array([], pa.float64())})
        if batch.num_rows == 0:
            return empty
        ts = _ts_us(batch["ts"])
        etype = batch["event_type"]
        enc = (etype.combine_chunks() if isinstance(etype, pa.ChunkedArray)
               else etype).dictionary_encode()
        codes = np.repeat(enc.indices.to_numpy(zero_copy_only=False).astype(np.int64), r)
        # r covering window starts per event: (ts//hop - j) * hop, j = 0..r-1
        base = ts // hop_us
        starts = ((np.repeat(base, r) - np.tile(np.arange(r, dtype=np.int64), len(ts)))
                  * hop_us)
        vals = np.repeat(batch["value"].to_numpy(zero_copy_only=False), r)
        uw_win, wcodes = np.unique(starts, return_inverse=True)
        k = np.int64(len(enc.dictionary) + 1)
        uw, inv = np.unique(wcodes * k + codes, return_inverse=True)
        n = np.bincount(inv)
        sv = np.bincount(inv, weights=vals)
        return pa.table(
            {
                "window_start_us": pa.array(uw_win[(uw // k).astype(np.int64)], pa.int64()),
                "event_type": enc.dictionary.take(pa.array((uw % k).astype(np.int64))).cast(pa.string()),
                "n_part": pa.array(n.astype(np.int64), pa.int64()),
                "v_part": pa.array(sv, pa.float64()),
            }
        )

    from search_engine_ray.stages.grouped import grouped_reduce

    # (window x type) cardinality grows with the event span — sort+reduceat
    partials = events.map_batches(partial, batch_format="pyarrow")
    agg = grouped_reduce(partials, ["window_start_us", "event_type"],
                         sums=[("n_part", "n_events"), ("v_part", "sum_value")])

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "window_start_us": batch["window_start_us"],
                "event_type": batch["event_type"],
                "n_events": batch["n_events"].cast(pa.int64()),
                "sum_value": batch["sum_value"],
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def value_quantiles(events: "ray.data.Dataset", qs: list[float],
                    col: str = "value") -> "pa.Table":
    """EXACT linear-interpolated quantiles of ``col`` (the quantile_cont
    contract), distributed: one global sort of the single pruned column,
    then ONLY the ≤ 2·len(qs) rows at the target ranks leave the workers —
    the driver never holds the column. → pa.Table (q, value).

    At 100 TB the sort is the honest cost of EXACT quantiles (a mergeable
    sketch trades exactness for one pass; this operator is the exact
    companion an approximate sketch would be verified against)."""
    import ray

    sorted_ds = events.select_columns([col]).sort(col).materialize()
    counts, refs = [], []
    for bundle in sorted_ds.iter_internal_ref_bundles():
        for block_ref, meta in bundle.blocks:
            refs.append(block_ref)
            counts.append(meta.num_rows)
    n = int(sum(counts))
    if n == 0:
        return pa.table({"q": pa.array([], pa.float64()),
                         "value": pa.array([], pa.float64())})
    bounds = np.zeros(len(counts) + 1, np.int64)
    np.cumsum(counts, out=bounds[1:])
    ranks = np.asarray([q * (n - 1) for q in qs], np.float64)
    lo = np.floor(ranks).astype(np.int64)
    hi = np.ceil(ranks).astype(np.int64)
    need = np.unique(np.concatenate([lo, hi]))

    @ray.remote
    def fetch(block, local_ranks):
        tbl = block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)
        v = tbl[col].to_numpy(zero_copy_only=False)
        return v[np.asarray(local_ranks, np.int64)]

    by_block: dict[int, list[int]] = {}
    for rk in need:
        b = int(np.searchsorted(bounds, rk, side="right") - 1)
        by_block.setdefault(b, []).append(int(rk - bounds[b]))
    futures = {b: fetch.remote(refs[b], lr) for b, lr in by_block.items()}
    got: dict[int, float] = {}
    for b, fut in futures.items():
        vals = ray.get(fut)
        for rk_local, v in zip(by_block[b], vals):
            got[int(bounds[b] + rk_local)] = float(v)
    frac = ranks - lo
    out = [got[int(l)] + (got[int(h)] - got[int(l)]) * f
           for l, h, f in zip(lo, hi, frac)]
    return pa.table({"q": pa.array(qs, pa.float64()),
                     "value": pa.array(out, pa.float64())})


def value_quantiles_approx(events: "ray.data.Dataset", qs: list[float],
                           col: str = "value", key_col: str = "event_id",
                           sample_size: int = 4096, seed: int = 11) -> "pa.Table":
    """ONE-PASS approximate quantiles via a deterministic mergeable
    hash-rank sample: every row gets h = mix64(key ^ seed) and the global
    ``sample_size`` smallest-h rows form a uniform sample of the dataset
    whatever its physical partitioning (the hash IS the reservoir priority
    — merging partial top-N by h is exactly the top-N of the union, so the
    sketch is mergeable and the result is independent of block layout).
    Quantiles interpolate within the sample (quantile_cont contract);
    rank error is O(1/sqrt(sample_size)).

    The exact companion is :func:`value_quantiles` (full sort); this is the
    one-pass scale path — per block only ``sample_size`` (h, value) pairs
    move, no shuffle at all."""
    from search_engine_ray.functions.hashing import mix64

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        if batch.num_rows == 0:
            return pa.table({"_h": pa.array([], pa.int64()),
                             col: pa.array([], pa.float64())})
        keys = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        # order-preserving signed mapping (h ^ 2^63): the per-batch
        # argpartition and the driver's nsmallest MUST rank in the same
        # domain, or a raw .view(int64) flips the top bit's meaning and the
        # merged sample depends on the block layout
        h = (mix64(keys.view(np.uint64) ^ np.uint64(seed))
             ^ np.uint64(1 << 63)).view(np.int64)
        kk = min(sample_size, len(keys))
        idx = np.argpartition(h, kk - 1)[:kk]
        return pa.table({
            "_h": pa.array(h[idx], pa.int64()),
            col: pa.array(batch[col].to_numpy(zero_copy_only=False)[idx]
                          .astype(np.float64), pa.float64()),
        })

    parts = events.select_columns([key_col, col]).map_batches(
        partial, batch_format="pyarrow").to_pandas()
    if not len(parts):
        return pa.table({"q": pa.array([], pa.float64()),
                         "value": pa.array([], pa.float64())})
    sample = parts.nsmallest(min(sample_size, len(parts)), "_h")[col].to_numpy()
    out = np.quantile(sample, np.asarray(qs, np.float64))  # linear interp
    return pa.table({"q": pa.array(qs, pa.float64()),
                     "value": pa.array(out, pa.float64())})


def asof_join(left: "ray.data.Dataset", right: "ray.data.Dataset",
              key_col: str = "user_id", ts_col: str = "ts",
              id_col: str = "event_id", value_col: str = "value"):
    """AS-OF join: each left event matched to the right event with the
    GREATEST ts <= left ts for the same key (inner semantics — unmatched
    left rows drop; ties on right ts break by greatest ``id_col``).
    → (key, l_<id>, l_ts_us, r_<id>, r_ts_us, r_<value>).

    Ray Data has no asof join, so it is composed: tag both sides, union,
    then ONE sort by (key, ts, side) via sorted_group_map — within each
    whole-key batch a single ``np.maximum.accumulate`` carries the index
    of the latest right row forward across every group at once (no
    per-key Python). Right rows sort BEFORE left rows at equal ts, so
    ts-equal matches are inclusive, like DuckDB's ``ASOF JOIN ... ON
    l.ts >= r.ts``. The one sort is the honest cost; at 100 TB both
    sides are already key-partitioned and each partition sorts locally —
    exactly the shape sorted_group_map executes."""
    from search_engine_ray.stages.grouped import sorted_group_map

    def prep(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            batch = batch.combine_chunks()
            return pa.table({
                "k": batch[key_col].cast(pa.int64()),
                "ts_us": pa.array(_ts_us(batch[ts_col]), pa.int64()),
                "side": pa.array(np.full(batch.num_rows, side, np.int8), pa.int8()),
                "eid": batch[id_col].cast(pa.int64()),
                "val": batch[value_col].cast(pa.float64()),
            })
        return fn

    tagged = (right.map_batches(prep(0), batch_format="pyarrow")
              .union(left.map_batches(prep(1), batch_format="pyarrow")))

    def kernel(b: pa.Table) -> pa.Table:
        b = b.combine_chunks()
        empty = pa.table({key_col: pa.array([], pa.int64()),
                          "l_" + id_col: pa.array([], pa.int64()),
                          "l_ts_us": pa.array([], pa.int64()),
                          "r_" + id_col: pa.array([], pa.int64()),
                          "r_ts_us": pa.array([], pa.int64()),
                          "r_" + value_col: pa.array([], pa.float64())})
        n = b.num_rows
        if n == 0:
            return empty
        key = b["k"].to_numpy(zero_copy_only=False)
        side = b["side"].to_numpy(zero_copy_only=False)
        ts = b["ts_us"].to_numpy(zero_copy_only=False)
        eid = b["eid"].to_numpy(zero_copy_only=False)
        val = b["val"].to_numpy(zero_copy_only=False)
        idx = np.arange(n, dtype=np.int64)
        # latest right-row index at or before each row (sort puts right
        # first at equal ts, so equality is inclusive)
        last_r = np.maximum.accumulate(np.where(side == 0, idx, -1))
        # segment starts: a match from a PREVIOUS key is invalid
        is_start = np.empty(n, bool)
        is_start[0] = True
        np.not_equal(key[1:], key[:-1], out=is_start[1:])
        gstart = np.maximum.accumulate(np.where(is_start, idx, 0))
        ok = (side == 1) & (last_r >= gstart)
        li = np.flatnonzero(ok)
        if len(li) == 0:
            return empty
        ri = last_r[li]
        return pa.table({
            key_col: pa.array(key[li], pa.int64()),
            "l_" + id_col: pa.array(eid[li], pa.int64()),
            "l_ts_us": pa.array(ts[li], pa.int64()),
            "r_" + id_col: pa.array(eid[ri], pa.int64()),
            "r_ts_us": pa.array(ts[ri], pa.int64()),
            "r_" + value_col: pa.array(val[ri], pa.float64()),
        })

    return sorted_group_map(tagged, ["k"], kernel,
                            sort_cols=["k", "ts_us", "side", "eid"])


def broadcast_range_join(ds: "ray.data.Dataset", ranges: "pa.Table",
                         val_col: str = "value", lo_col: str = "lo",
                         hi_col: str = "hi", label_col: str = "band",
                         keep_cols: tuple = ("event_id",)):
    """Range (interval) join against a SMALL ranges table: each row joins
    every range with lo <= val < hi — inner, multi-match (overlapping
    ranges emit one output row per match). → keep_cols + (val, label).

    The ranges table ships ONCE via ray.put and every batch matches
    against it vectorized (one n×m comparison per batch — m is small by
    contract; a big-big range join needs grid-bucket partitioning on the
    range axis instead, same pattern as the LSH band shuffle)."""
    import ray

    lo = ranges[lo_col].to_numpy(zero_copy_only=False).astype(np.float64)
    hi = ranges[hi_col].to_numpy(zero_copy_only=False).astype(np.float64)
    labels = ranges[label_col].to_pylist()
    ref = ray.put((lo, hi, np.asarray(labels, dtype=object)))

    def fn(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        rlo, rhi, rlab = ray.get(ref)
        cols = {c: pa.array([], batch[c].type) for c in keep_cols}
        cols[val_col] = pa.array([], pa.float64())
        cols[label_col] = pa.array([], pa.string())
        if batch.num_rows == 0:
            return pa.table(cols)
        v = batch[val_col].to_numpy(zero_copy_only=False).astype(np.float64)
        m2 = (v[:, None] >= rlo[None, :]) & (v[:, None] < rhi[None, :])
        li, rj = np.nonzero(m2)
        take = pa.array(li)
        out = {c: batch[c].take(take) for c in keep_cols}
        out[val_col] = pa.array(v[li], pa.float64())
        out[label_col] = pa.array(rlab[rj].tolist(), pa.string())
        return pa.table(out)

    return ds.map_batches(fn, batch_format="pyarrow")


def sessionize(events: "ray.data.Dataset", gap_us: int = 30 * US_PER_MIN):
    """Gap-based sessionization: a user's events sorted by (ts, event_id)
    start a new session when the gap to the previous event exceeds
    ``gap_us``. → (user_id, session_idx 1-based, n_events,
    session_start_us, session_end_us).

    One sorted pass: sorted_group_map guarantees whole-user groups per
    batch and the kernel detects session breaks + aggregates sessions for
    MANY users at once, fully vectorized (the hot path has no per-user
    Python). The sort key (user_id) is the partition key a streaming
    deployment would shard on."""
    from search_engine_ray.stages.grouped import sorted_group_map

    def prep(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        return pa.table(
            {
                "user_id": batch["user_id"],
                "ts_us": pa.array(_ts_us(batch["ts"]), pa.int64()),
                "event_id": batch["event_id"],
            }
        )

    slim = events.map_batches(prep, batch_format="pyarrow")

    def kernel(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        empty = pa.table(
            {"user_id": pa.array([], pa.int64()),
             "session_idx": pa.array([], pa.int64()),
             "n_events": pa.array([], pa.int64()),
             "session_start_us": pa.array([], pa.int64()),
             "session_end_us": pa.array([], pa.int64())}
        )
        n = batch.num_rows
        if n == 0:
            return empty
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        ts = batch["ts_us"].to_numpy(zero_copy_only=False)
        new_user = np.empty(n, bool)
        new_user[0] = True
        np.not_equal(uid[1:], uid[:-1], out=new_user[1:])
        gap = np.empty(n, bool)
        gap[0] = True
        gap[1:] = (ts[1:] - ts[:-1]) > gap_us
        new_sess = new_user | gap
        sess_starts = np.flatnonzero(new_sess)
        sess_len = np.diff(np.append(sess_starts, n))
        # 1-based session index within each user
        sess_user = uid[sess_starts]
        user_change = np.empty(len(sess_starts), bool)
        user_change[0] = True
        np.not_equal(sess_user[1:], sess_user[:-1], out=user_change[1:])
        user_first_sess = np.maximum.accumulate(
            np.where(user_change, np.arange(len(sess_starts)), 0)
        )
        sess_idx = np.arange(len(sess_starts)) - user_first_sess + 1
        return pa.table(
            {
                "user_id": pa.array(sess_user, pa.int64()),
                "session_idx": pa.array(sess_idx.astype(np.int64), pa.int64()),
                "n_events": pa.array(sess_len.astype(np.int64), pa.int64()),
                "session_start_us": pa.array(ts[sess_starts], pa.int64()),
                "session_end_us": pa.array(ts[np.append(sess_starts[1:], n) - 1], pa.int64()),
            }
        )

    return sorted_group_map(slim, ["user_id"], kernel,
                            sort_cols=["user_id", "ts_us", "event_id"])


def grouped_value_quantiles(events: "ray.data.Dataset", qs: list[float],
                            key_col: str = "event_type",
                            val_col: str = "value"):
    """EXACT per-key quantiles (quantile_cont contract): one sort by
    (key, value) via sorted_group_map, then ONE vectorized interpolation
    across ALL groups in a block — rank offsets are plain arithmetic on
    the group-start index, no per-group Python. → (key, q, value); output
    is len(keys) × len(qs) rows however large the input.

    Scale shape: the value column is pruned before the sort and the
    result is group-cardinality; for corpus-scale key counts the sort is
    the same one every grouped_reduce pays."""
    from search_engine_ray.stages.grouped import sorted_group_map

    qarr = np.asarray(qs, np.float64)

    def slim(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        return pa.table({
            key_col: batch[key_col],
            val_col: batch[val_col].cast(pa.float64()),
        })

    def kernel(b: pa.Table) -> pa.Table:
        b = b.combine_chunks()
        empty = pa.table({key_col: pa.array([], pa.string()),
                          "q": pa.array([], pa.float64()),
                          val_col: pa.array([], pa.float64())})
        n = b.num_rows
        if n == 0:
            return empty
        keys = b[key_col]
        v = b[val_col].to_numpy(zero_copy_only=False)
        codes = keys.dictionary_encode().combine_chunks().indices.to_numpy(
            zero_copy_only=False)
        starts = np.flatnonzero(np.concatenate(
            [[True], codes[1:] != codes[:-1]]))
        lens = np.diff(np.append(starts, n))
        g = len(starts)
        # rank = (len-1) * q per (group, q), interpolated — all vectorized
        ranks = (lens - 1)[:, None] * qarr[None, :]          # (g, nq)
        lo = np.floor(ranks).astype(np.int64)
        hi = np.ceil(ranks).astype(np.int64)
        frac = ranks - lo
        base = starts[:, None]
        vals = v[base + lo] * (1.0 - frac) + v[base + hi] * frac
        return pa.table({
            key_col: keys.take(pa.array(np.repeat(starts, len(qarr)))),
            "q": pa.array(np.tile(qarr, g), pa.float64()),
            val_col: pa.array(vals.ravel(), pa.float64()),
        })

    return sorted_group_map(
        events.map_batches(slim, batch_format="pyarrow"), [key_col], kernel,
        sort_cols=[key_col, val_col])


def funnel(events: "ray.data.Dataset", steps: list[str],
           horizon_us: int = US_PER_HOUR):
    """Sequential min-time FUNNEL analysis: per user, step 1 completes at
    the user's first step-1 event; step i completes at the first step-i
    event AT OR AFTER the previous completion and within ``horizon_us``
    of it (the stepwise-window funnel of product analytics). → one row
    per step: (step_idx 1-based, event_type, n_users) with n_users the
    users who completed steps 1..i — monotonically non-increasing.

    Shape: events filter to the step types, whole-user groups arrive
    sorted by (user, ts) (sorted_group_map), and the kernel advances ALL
    users through a step at once — per step one searchsorted over fused
    (user code, dense ts rank) keys clipped to each user's segment, no
    per-user Python. Per-block partial counts reduce in a k-row
    groupby."""
    from ray.data.aggregate import Sum

    from search_engine_ray.stages.grouped import sorted_group_map

    step_ix = {s: i for i, s in enumerate(steps)}
    if len(step_ix) != len(steps):
        raise ValueError("funnel steps must be distinct")

    def prep(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        keep = pc.is_in(batch["event_type"],
                        value_set=pa.array(steps, pa.string()))
        b = batch.filter(keep)
        # index_in against the steps list IS the step index (no Python loop)
        six = pc.index_in(b["event_type"],
                          value_set=pa.array(steps, pa.string())).cast(pa.int64())
        return pa.table({"user_id": b["user_id"].cast(pa.int64()),
                         "ts_us": pa.array(_ts_us(b["ts"]), pa.int64()),
                         "step": six})

    slim = events.map_batches(prep, batch_format="pyarrow")

    def kernel(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        empty = pa.table({"step_idx": pa.array([], pa.int64()),
                          "n_part": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        u = batch["user_id"].to_numpy(zero_copy_only=False)
        ts = batch["ts_us"].to_numpy(zero_copy_only=False)
        st = batch["step"].to_numpy(zero_copy_only=False)
        ucodes = np.cumsum(np.concatenate(([0], (u[1:] != u[:-1]).astype(np.int64))))
        n_users = int(ucodes[-1]) + 1
        uniq_ts = np.unique(ts)
        m = np.int64(len(uniq_ts) + 1)
        counts = np.zeros(len(steps), np.int64)
        t_prev = np.full(n_users, -1, np.int64)  # -1 = dead
        alive = np.zeros(n_users, bool)
        for i in range(len(steps)):
            sel = st == i
            us, tss = ucodes[sel], ts[sel]
            order = np.lexsort((tss, us))
            us, tss = us[order], tss[order]
            tsr = np.searchsorted(uniq_ts, tss)
            fused = us * m + tsr
            if i == 0:
                first = np.empty(len(us), bool)
                if len(us):
                    first[0] = True
                    first[1:] = us[1:] != us[:-1]
                    alive[us[first]] = True
                    t_prev[us[first]] = tss[first]
            else:
                live = np.flatnonzero(alive)
                if not len(live) or not len(us):
                    alive[:] = False
                else:
                    target = live * m + np.searchsorted(uniq_ts, t_prev[live])
                    pos = np.searchsorted(fused, target)
                    ok = pos < len(fused)
                    posc = np.minimum(pos, len(fused) - 1)
                    ok &= us[posc] == live
                    ok &= (tss[posc] - t_prev[live]) <= horizon_us
                    alive[:] = False
                    alive[live[ok]] = True
                    t_prev[live[ok]] = tss[posc[ok]]
            counts[i] = int(alive.sum())
        return pa.table({"step_idx": pa.array(np.arange(1, len(steps) + 1), pa.int64()),
                         "n_part": pa.array(counts, pa.int64())})

    import ray.data as _rd

    # a zero row per step rides along so corpora containing NONE of the
    # step types still yield one row per step (n_users = 0), matching the
    # SQL oracle's shape
    zeros = _rd.from_arrow(pa.table({
        "step_idx": pa.array(np.arange(1, len(steps) + 1), pa.int64()),
        "n_part": pa.array(np.zeros(len(steps), np.int64), pa.int64())}))
    agg = sorted_group_map(slim, ["user_id"], kernel,
                           sort_cols=["user_id", "ts_us", "step"]
                           ).union(zeros).groupby("step_idx").aggregate(
        Sum("n_part", alias_name="n_users"))

    def finish(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        ix = batch["step_idx"].to_numpy(zero_copy_only=False)
        return pa.table({
            "step_idx": batch["step_idx"].cast(pa.int64()),
            "event_type": pa.array([steps[int(i) - 1] for i in ix], pa.string()),
            "n_users": batch["n_users"].cast(pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


US_PER_WEEK = 7 * 24 * US_PER_HOUR


def cohort_retention(events: "ray.data.Dataset",
                     period_us: int = US_PER_WEEK):
    """Cohort retention (the product-analytics retention triangle): users
    cohort by the period of their FIRST event (floor(ts / period)); for
    each (cohort, offset) the count of cohort users active in period
    cohort+offset. → (cohort_period, period_offset, n_users), offset 0
    row = cohort size.

    Shape: per-user first period via one user-cardinality grouped
    reduce; cohort assignment rides a sharded hash join back onto the
    (user, period) activity table (itself deduped by a grouped reduce) —
    nothing user- or event-cardinality ever broadcasts; the final count
    reduce is (cohorts × offsets)-cardinality."""
    from search_engine_ray.stages.grouped import coalesce_for_join, grouped_reduce

    def prep(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        ts = _ts_us(batch["ts"])
        return pa.table({
            "user_id": batch["user_id"].cast(pa.int64()),
            "period": pa.array(ts // period_us, pa.int64()),
        })

    up = events.map_batches(prep, batch_format="pyarrow")
    activity = grouped_reduce(up, ["user_id", "period"]).materialize()
    first = grouped_reduce(activity, ["user_id"],
                           mins=[("period", "cohort_period")])
    try:
        ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:  # pragma: no cover
        ncpu = 8
    npart = max(4, ncpu // 2)
    joined = coalesce_for_join(activity, npart).join(
        coalesce_for_join(first, npart), join_type="inner",
        num_partitions=npart, on=("user_id",))

    def offs(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        p = batch["period"].to_numpy(zero_copy_only=False)
        c = batch["cohort_period"].to_numpy(zero_copy_only=False)
        return pa.table({
            "cohort_period": pa.array(c, pa.int64()),
            "period_offset": pa.array(p - c, pa.int64()),
        })

    return grouped_reduce(joined.map_batches(offs, batch_format="pyarrow"),
                          ["cohort_period", "period_offset"],
                          count="n_users")


def window_anomalies(events: "ray.data.Dataset",
                     window_us: int = US_PER_HOUR,
                     z_threshold: float = 2.0, round_digits: int = 6):
    """Volume-anomaly detection: tumbling per-(window, event_type)
    counts z-scored against THAT event type's own window distribution
    (population mean/std over its observed windows); windows with
    |z| ≥ ``z_threshold`` flag — the monitoring primitive behind spike /
    outage alerts on event streams. → (window_start_us, event_type,
    n_events, z_r), anomalous rows only.

    Composition: :func:`tumbling_window_agg` (partial-agg counts,
    windows × types cardinality) → per-type moment aggregation (one
    tiny groupby) → a row-local z-score + filter. Population std (÷ n)
    so the SQL oracle's ``stddev_pop`` matches exactly."""
    from ray.data.aggregate import Count, Sum

    win = tumbling_window_agg(events, window_us=window_us).materialize()

    def sq(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        n = batch["n_events"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({"event_type": batch["event_type"],
                         "n": pa.array(n, pa.float64()),
                         "n2": pa.array(n * n, pa.float64())})

    mom = (win.map_batches(sq, batch_format="pyarrow")
           .groupby("event_type")
           .aggregate(Count(alias_name="k"), Sum("n", alias_name="s"),
                      Sum("n2", alias_name="s2")).to_pandas())
    stats = {}
    for r in mom.itertuples():
        mean = r.s / r.k
        var = max(r.s2 / r.k - mean * mean, 0.0)
        stats[r.event_type] = (mean, float(np.sqrt(var)))

    import ray as _ray

    ref = _ray.put(stats)

    def z(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        empty = pa.table({"window_start_us": pa.array([], pa.int64()),
                          "event_type": pa.array([], pa.string()),
                          "n_events": pa.array([], pa.int64()),
                          "z_r": pa.array([], pa.float64())})
        if batch.num_rows == 0:
            return empty
        st = _ray.get(ref)
        n = batch["n_events"].to_numpy(zero_copy_only=False).astype(np.float64)
        types = batch["event_type"].to_pylist()
        mean = np.array([st[t][0] for t in types])
        sd = np.array([st[t][1] for t in types])
        zs = np.where(sd > 0, (n - mean) / np.where(sd > 0, sd, 1.0), 0.0)
        keep = np.abs(zs) >= z_threshold
        return pa.table({
            "window_start_us": batch["window_start_us"].cast(pa.int64()).filter(pa.array(keep)),
            "event_type": batch["event_type"].filter(pa.array(keep)),
            "n_events": batch["n_events"].cast(pa.int64()).filter(pa.array(keep)),
            "z_r": pa.array(np.round(zs[keep], round_digits), pa.float64()),
        })

    return win.map_batches(z, batch_format="pyarrow")
