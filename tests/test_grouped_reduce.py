"""grouped_reduce ≡ ray groupby().aggregate() for Sum/Min/Max/Count on
random multi-block inputs (int and string keys, single and composite)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _mk(n=20_000, n_keys=3_000, parts=6, seed=0, str_keys=False):
    import ray.data

    rng = np.random.default_rng(seed)
    k = rng.integers(0, n_keys, n).astype(np.int64)
    tbl = pa.table({
        "k": pa.array([f"key-{x:06d}" for x in k]) if str_keys else pa.array(k),
        "k2": pa.array(rng.integers(0, 3, n).astype(np.int64)),
        "v": pa.array(rng.integers(-50, 50, n).astype(np.int64)),
        "f": pa.array(rng.standard_normal(n)),
    })
    return ray.data.from_arrow(tbl).repartition(parts)


@pytest.mark.parametrize("str_keys", [False, True])
def test_matches_ray_groupby(ray_session, str_keys):
    from ray.data.aggregate import Count, Max, Min, Sum

    from search_engine_ray.stages.grouped import grouped_reduce

    ds = _mk(str_keys=str_keys)
    ours = grouped_reduce(ds, ["k"], sums=[("v", "sv"), ("f", "sf")],
                          mins=[("v", "mv")], maxs=[("f", "xf")],
                          count="n").to_pandas()
    ref = ds.groupby("k").aggregate(
        Sum("v", alias_name="sv"), Sum("f", alias_name="sf"),
        Min("v", alias_name="mv"), Max("f", alias_name="xf"),
        Count(alias_name="n")).to_pandas()
    a = ours.sort_values("k").reset_index(drop=True)
    b = ref.sort_values("k").reset_index(drop=True)[a.columns]
    pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()),
                                  check_exact=False, rtol=1e-12)


def test_composite_keys_and_distinct(ray_session):
    from ray.data.aggregate import Sum

    from search_engine_ray.stages.grouped import grouped_reduce

    ds = _mk(n=5_000, n_keys=400)
    ours = grouped_reduce(ds, ["k", "k2"], sums=[("v", "sv")]).to_pandas()
    ref = ds.groupby(["k", "k2"]).aggregate(Sum("v", alias_name="sv")).to_pandas()
    a = ours.sort_values(["k", "k2"]).reset_index(drop=True)
    b = ref.sort_values(["k", "k2"]).reset_index(drop=True)[a.columns]
    pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()))
    # no reducers → distinct keys
    dist = grouped_reduce(ds, ["k", "k2"]).to_pandas()
    assert len(dist) == len(a)
    assert not dist.duplicated(["k", "k2"]).any()
