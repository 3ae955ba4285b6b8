"""sorted_group_map: complete-group guarantee incl. block-straddling keys."""

import numpy as np
import pyarrow as pa
import pytest

from search_engine_ray.stages.grouped import sorted_group_map


def make_group_sums():
    def group_sums(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        if batch.num_rows == 0:
            return pa.table({"k": pa.array([], pa.int64()), "s": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        k = batch["k"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        change = np.empty(len(k), bool)
        change[0] = True
        np.not_equal(k[1:], k[:-1], out=change[1:])
        starts = np.flatnonzero(change)
        return pa.table({
            "k": pa.array(k[starts], pa.int64()),
            "s": pa.array(np.add.reduceat(v, starts), pa.int64()),
            "n": pa.array(np.diff(np.append(starts, len(k))), pa.int64()),
        })
    return group_sums


@pytest.mark.parametrize("num_blocks", [1, 3, 16])
def test_groups_never_split(ray_session, num_blocks):
    import ray.data

    rng = np.random.default_rng(3)
    # heavily skewed keys so block boundaries land inside big groups
    keys = rng.zipf(1.3, size=5000) % 50
    vals = rng.integers(0, 100, size=5000)
    rows = [{"k": int(a), "v": int(b)} for a, b in zip(keys, vals)]
    ds = ray.data.from_items(rows, override_num_blocks=num_blocks)
    out = sorted_group_map(ds, ["k"], make_group_sums()).to_pandas()
    # one output row per key per *appearance* is NOT allowed: exactly one per key
    agg = out.groupby("k")[["s", "n"]].sum()
    import pandas as pd

    expect = pd.DataFrame({"k": keys, "v": vals}).groupby("k")["v"].agg(["sum", "size"])
    assert len(out) == out["k"].nunique(), "a group was split across calls"
    assert (agg["s"].sort_index().to_numpy() == expect["sum"].sort_index().to_numpy()).all()
    assert (agg["n"].sort_index().to_numpy() == expect["size"].sort_index().to_numpy()).all()


def test_empty_dataset(ray_session):
    import ray.data

    ds = ray.data.from_items([{"k": 1, "v": 2}]).filter(lambda r: False)
    out = sorted_group_map(ds, ["k"], make_group_sums()).to_pandas()
    assert len(out) == 0


@pytest.mark.parametrize("repair_target_rows", [0, 100, 10**9])
def test_two_level_repair_paths_agree(ray_session, repair_target_rows):
    """Forcing the distributed second-level repair (repair_target_rows=0 /
    tiny) must give identical results to the single-task path (huge)."""
    import pandas as pd
    import ray.data

    rng = np.random.default_rng(7)
    keys = rng.zipf(1.2, size=8000) % 40   # hot keys straddle every boundary
    vals = rng.integers(0, 100, size=8000)
    rows = [{"k": int(a), "v": int(b)} for a, b in zip(keys, vals)]
    ds = ray.data.from_items(rows, override_num_blocks=11)
    out = sorted_group_map(ds, ["k"], make_group_sums(),
                           repair_target_rows=repair_target_rows).to_pandas()
    agg = out.groupby("k")[["s", "n"]].sum()
    expect = pd.DataFrame({"k": keys, "v": vals}).groupby("k")["v"].agg(["sum", "size"])
    assert len(out) == out["k"].nunique(), "a group was split across calls"
    assert (agg["s"].sort_index().to_numpy() == expect["sum"].sort_index().to_numpy()).all()
    assert (agg["n"].sort_index().to_numpy() == expect["size"].sort_index().to_numpy()).all()
