"""Distributed ordered prefix sum (the classic two-pass parallel scan).

Ray Data has no scan/cumsum operator; this builds one from primitives the
streaming executor already has:

    sort(order_col)  →  materialized range-partitioned blocks
    pass 1: per-BLOCK (first_key, block_total) — n_blocks tiny rows to the
            driver (NOT the data; a 100 TB input with 100k blocks sends 100k
            pairs), exclusive-scanned there
    pass 2: per-block vectorized cumsum + the block's base offset, looked up
            by the block's first key

Safety: both passes stream the SAME materialized sorted dataset with
``batch_size=None`` (one batch per block, zero-copy), so the block
decomposition is identical. Pass 2 still verifies it: the batch's first key
must hit an exact pass-1 entry, and keys must be strictly increasing within
the batch — any block drift or duplicate-key split fails loudly instead of
producing silently wrong offsets.

``order_col`` values must be globally unique (use a doc_id / row id).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


def ordered_prefix_sum(ds, order_col: str, value_col: str,
                       out_col: str = "prefix_sum"):
    """Dataset → same rows + ``out_col`` = EXCLUSIVE prefix sum of
    ``value_col`` in ascending ``order_col`` order (first row gets 0).
    Output is sorted by ``order_col``."""
    srt = ds.sort(order_col).materialize()

    def block_sums(b: pa.Table) -> pa.Table:
        b = b.combine_chunks()
        if b.num_rows == 0:
            return pa.table({"first_key": pa.array([], pa.int64()),
                             "block_total": pa.array([], pa.int64())})
        keys = b[order_col].to_numpy(zero_copy_only=False)
        vals = b[value_col].to_numpy(zero_copy_only=False)
        return pa.table({
            "first_key": pa.array([int(keys[0])], pa.int64()),
            "block_total": pa.array([int(vals.sum())], pa.int64()),
        })

    # n_blocks rows — the only thing that ever reaches the driver
    parts = srt.map_batches(block_sums, batch_format="pyarrow",
                            batch_size=None).take_all()
    firsts = np.array(sorted(p["first_key"] for p in parts), np.int64)
    totals = np.array([t for _, t in sorted(
        (p["first_key"], p["block_total"]) for p in parts)], np.int64)
    if len(np.unique(firsts)) != len(firsts):  # pragma: no cover - guarded
        raise ValueError(f"duplicate {order_col} across block boundaries; "
                         "ordered_prefix_sum needs a unique order column")
    bases = np.concatenate([[0], np.cumsum(totals)[:-1]]).astype(np.int64)
    plan_ref = ray.put((firsts, bases))

    def stamp(b: pa.Table) -> pa.Table:
        b = b.combine_chunks()
        if b.num_rows == 0:
            return b.append_column(out_col, pa.array([], pa.int64()))
        firsts_l, bases_l = ray.get(plan_ref)
        keys = b[order_col].to_numpy(zero_copy_only=False)
        if len(keys) > 1 and not (keys[1:] > keys[:-1]).all():
            raise ValueError(f"{order_col} not strictly increasing within a "
                             "sorted block — duplicate keys?")
        i = int(np.searchsorted(firsts_l, keys[0]))
        if i >= len(firsts_l) or firsts_l[i] != keys[0]:
            raise RuntimeError(
                "block decomposition drifted between scan passes "
                f"(first key {keys[0]} not in pass-1 plan)")
        vals = b[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        exc = np.empty(len(vals), np.int64)
        exc[0] = bases_l[i]
        np.cumsum(vals[:-1], out=exc[1:])
        exc[1:] += bases_l[i]
        return b.append_column(out_col, pa.array(exc, pa.int64()))

    return srt.map_batches(stamp, batch_format="pyarrow", batch_size=None)
