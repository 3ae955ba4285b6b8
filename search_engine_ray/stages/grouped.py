"""sorted_group_map: vectorized multi-group processing without map_groups.

``GroupedData.map_groups`` invokes the UDF once per group — hundreds of
thousands of tiny Python calls for high-cardinality keys (measured: the
dominant cost of LSH bucket processing). This helper gives the same
complete-group guarantee while letting the UDF see MANY whole groups per
call, vectorized:

    sort(keys) → per sorted block:
        interior groups (not touching block edges) → block_fn(batch)
        edge groups → collected, re-sorted, coalesced to one block →
        block_fn(batch)  [a group may straddle blocks; the repair pass sees
        it whole]

Use when per-group work is vectorizable across groups and groups are small
relative to a block (LSH buckets, per-key windows). For groups with heavy
skew prefer per-fragment processing like stages/merge.py (the edge set here
inherits the inspection paradox: a boundary lands in big groups more often).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def coalesce_for_join(ds, n_parts: int):
    """Workaround for a Ray Data wart on the road to ``Dataset.join``:
    map_batches normalizes EMPTY output blocks to zero-column (schemaless)
    blocks — even when the UDF returns a correctly-typed empty table — and
    the hash-shuffle join then fails with "No match or multiple matches for
    key field reference ... on right side" when such a block lands in a
    partition. ``repartition`` rebuilds blocks and drops the schemaless
    empties — but itself PADS with schemaless empties when asked for more
    partitions than there are rows, so the partition count is clamped to
    the row count (and an all-empty dataset is rebuilt from its known
    schema). Call this on any join input produced by a filter/map chain
    that can yield empty blocks; only tiny data ever has them — at scale
    every block is full — so the extra exchange is cheap exactly when it
    triggers.

    Cost note: the row count requires executing the plan, so the input is
    materialized (pinned once; the hash-shuffle join consumes its inputs
    fully anyway). Callers route PAIR/LABEL-cardinality datasets here —
    corpus-scale join sides should go through their own explicit
    materialize-or-stream decision rather than this helper."""
    ds = ds.materialize()
    n = ds.count()
    if n == 0:
        import ray.data as _rd

        sch = ds.schema()
        if sch is None or not sch.names:  # pragma: no cover — nothing recoverable
            return ds
        empty = pa.table({name: pa.array([], type=t)
                          for name, t in zip(sch.names, sch.types)})
        return _rd.from_arrow(empty)
    return ds.repartition(max(1, min(int(n_parts), n)))


def _group_change_mask(batch: pa.Table, key_cols: list[str]) -> np.ndarray:
    """bool[n]: True where a new (key_cols) group starts (batch sorted)."""
    n = batch.num_rows
    change = np.zeros(n, bool)
    change[0] = True
    for col in key_cols:
        arr = batch[col]
        if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
            codes = arr.dictionary_encode().combine_chunks().indices.to_numpy(zero_copy_only=False)
        else:
            codes = arr.to_numpy(zero_copy_only=False)
        change[1:] |= codes[1:] != codes[:-1]
    return change


def _interior(batch: pa.Table, key_cols: list[str]) -> pa.Table:
    batch = batch.combine_chunks()
    if batch.num_rows == 0:
        return batch
    change = _group_change_mask(batch, key_cols)
    gid = np.cumsum(change) - 1
    keep = (gid != 0) & (gid != gid[-1])
    if keep.all():
        return batch
    return batch.take(pa.array(np.flatnonzero(keep)))


def _edges(batch: pa.Table, key_cols: list[str]) -> pa.Table:
    batch = batch.combine_chunks()
    if batch.num_rows == 0:
        return batch
    change = _group_change_mask(batch, key_cols)
    gid = np.cumsum(change) - 1
    sel = (gid == 0) | (gid == gid[-1])
    return batch.take(pa.array(np.flatnonzero(sel)))


def grouped_reduce(ds, keys: list[str], sums=(), mins=(), maxs=(),
                   count: str | None = None):
    """Algebraic per-group reduction via sort + run-length ``reduceat`` —
    the drop-in for ``ds.groupby(keys).aggregate(Sum/Min/Max/Count)``
    wherever the GROUP COUNT scales with the corpus (docs, vocab, nodes,
    candidate pairs). Ray's hash-shuffle aggregator is superlinear in
    group count (measured, 32 CPUs, 1.3 rows/group: 2.8 s at 100k groups,
    12.7 s at 1M, 40.9 s at 4M) while this path stays flat (1.4-3.4 s
    across the same sweep). Keep Ray's groupby for small fixed
    cardinalities (languages, query ids) where its pipelining is free.

    ``sums``/``mins``/``maxs``: sequences of (col, alias); ``count``:
    alias for the per-group row count. With no reducers at all the result
    is the distinct key set. Output dtypes follow the input columns
    (counts are int64); output block order is NOT globally key-sorted."""
    sums, mins, maxs = list(sums), list(mins), list(maxs)

    def red(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            cols = {k: t[k] for k in keys}
            for col, alias in [*sums, *mins, *maxs]:
                cols[alias] = t[col]
            if count:
                cols[count] = pa.array([], pa.int64())
            return pa.table(cols)
        change = _group_change_mask(t, keys)
        b = np.flatnonzero(change)
        idx = pa.array(b)
        out = {k: t[k].take(idx) for k in keys}
        for col, alias in sums:
            out[alias] = pa.array(
                np.add.reduceat(t[col].to_numpy(zero_copy_only=False), b))
        for col, alias in mins:
            out[alias] = pa.array(
                np.minimum.reduceat(t[col].to_numpy(zero_copy_only=False), b))
        for col, alias in maxs:
            out[alias] = pa.array(
                np.maximum.reduceat(t[col].to_numpy(zero_copy_only=False), b))
        if count:
            out[count] = pa.array(
                np.diff(np.append(b, t.num_rows)).astype(np.int64), pa.int64())
        return pa.table(out)

    return sorted_group_map(ds, list(keys), red)


def sorted_group_map(ds, group_cols: list[str], block_fn, sort_cols: list[str] | None = None,
                     repair_target_rows: int = 400_000):
    """Apply ``block_fn(batch)`` (pa.Table → pa.Table) to batches containing
    only COMPLETE (group_cols) groups, many groups per call. ``sort_cols``
    (default group_cols) may append extra keys for deterministic in-group
    row order; it must start with group_cols.

    Boundary repair is two-level: block-edge groups above
    ``repair_target_rows`` get their own sort whose INTERIOR groups process
    distributed — only the second sort's own 2×n_blocks boundary groups
    serialize into one task (the old single-level ``repartition(1)``
    funneled EVERY edge row through one task, and under Zipf skew block
    boundaries land in hot groups — the inspection paradox made that ~30%
    of all rows)."""
    sort_cols = sort_cols or group_cols
    assert sort_cols[: len(group_cols)] == group_cols
    srt = ds.sort(sort_cols).materialize()
    interior = srt.map_batches(
        lambda b: block_fn(_interior(b, group_cols)), batch_format="pyarrow", batch_size=None
    )
    edge_rows = srt.map_batches(
        lambda b: _edges(b, group_cols), batch_format="pyarrow", batch_size=None
    ).materialize()

    def _single_task(rows):
        return (
            rows.sort(sort_cols)
            .repartition(1)
            .map_batches(block_fn, batch_format="pyarrow", batch_size=None)
        )

    if edge_rows.count() <= repair_target_rows:
        return interior.union(_single_task(edge_rows))
    srt2 = edge_rows.sort(sort_cols).materialize()
    interior2 = srt2.map_batches(
        lambda b: block_fn(_interior(b, group_cols)), batch_format="pyarrow", batch_size=None
    )
    final_edges = srt2.map_batches(
        lambda b: _edges(b, group_cols), batch_format="pyarrow", batch_size=None
    )
    return interior.union(interior2).union(_single_task(final_edges))
