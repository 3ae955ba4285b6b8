"""Deterministic dense-rank id assignment (zip_with_index).

The reference assigns doc_ids sequentially in single-threaded read order
(/root/reference/src/indexer/indexer.rs:52,105) and term_ids as a 1-based
dense rank in merge order (/root/reference/src/indexer/spimi.rs:60,76,95).
Under parallelism "read order" is undefined, so our contract is: ids are the
1-based dense rank of a sort key (doc_id ← url, term_id ← term). The result
is invariant to partition count / parallelism — pytest-checked.

Implementation: ``ds.sort(key)`` (range-partitioned, globally ordered
blocks) → per-block row counts from block metadata (no data fetch) → driver
prefix sums (one int per block) → a tiny remote task per block stamps
``offset + arange(n)``. This is the one operator that drops below the
Dataset API (SURVEY.md §7.4): it needs block *ordinals*, which map_batches
cannot see. Cost: metadata pass + one zero-copy column append per block.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


@ray.remote(num_cpus=0.5)
def _stamp_block(block, offset: int, id_column: str) -> pa.Table:
    # blocks are Arrow by default but pandas when an upstream stage used
    # batch_format="pandas" — normalize to Arrow
    if not isinstance(block, pa.Table):
        block = pa.Table.from_pandas(block, preserve_index=False)
    ids = pa.array(np.arange(offset, offset + block.num_rows, dtype=np.int64), type=pa.int64())
    if id_column in block.column_names:
        block = block.drop_columns([id_column])
    return block.append_column(id_column, ids)


def zip_with_index(
    ds: "ray.data.Dataset",
    sort_key: str,
    id_column: str,
    start: int = 1,
    assume_sorted: bool = False,
) -> "ray.data.Dataset":
    """Sort by ``sort_key`` and add ``id_column`` = start + global row rank.

    ``assume_sorted`` skips the sort when the input is already globally
    sorted by ``sort_key`` (e.g. the output of a sort-based groupby)."""
    ds = (ds if assume_sorted else ds.sort(sort_key)).materialize()
    block_refs: list = []
    counts: list[int] = []
    for bundle in ds.iter_internal_ref_bundles():
        for block_ref, meta in bundle.blocks:
            block_refs.append(block_ref)
            counts.append(meta.num_rows)
    offsets = start + np.concatenate([[0], np.cumsum(counts)[:-1]]) if counts else []
    stamped = [
        _stamp_block.remote(ref, int(off), id_column)
        for ref, off in zip(block_refs, offsets)
    ]
    if not stamped:
        # empty input: preserve the input schema PLUS the id column (a bare
        # `return ds` would drop the column downstream consumers rely on)
        schema = ds.schema()
        base = getattr(schema, "base_schema", None)
        if base is not None and id_column not in base.names:
            base = base.append(pa.field(id_column, pa.int64()))
        return ray.data.from_arrow(base.empty_table() if base is not None
                                   else pa.table({id_column: pa.array([], pa.int64())}))
    return ray.data.from_arrow_refs(stamped)
