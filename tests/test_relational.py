"""revenue_by_nation broadcast-or-join seam: both paths must produce the
same (n_name, revenue_r) table; broadcast_cap=0 forces the hash-join path
the 100-TB shape uses when customer stops fitting a worker."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _tpch_tiny():
    import ray.data

    nation = pa.table({
        "n_nationkey": pa.array([0, 1, 2], pa.int64()),
        "n_name": pa.array(["ALPHA", "BETA", "GAMMA"], pa.string()),
    })
    customer = pa.table({
        "c_custkey": pa.array([10, 11, 12, 13, 14], pa.int64()),
        "c_nationkey": pa.array([0, 1, 2, 0, 1], pa.int64()),
    })
    rng = np.random.default_rng(4)
    n_orders = 40
    okey = np.arange(1, n_orders + 1, dtype=np.int64)
    dates = np.array(
        ["1996-03-01" if i % 3 else "1995-01-01" for i in range(n_orders)],
        dtype="datetime64[us]")
    orders = pa.table({
        "o_orderkey": pa.array(okey, pa.int64()),
        "o_custkey": pa.array(10 + (okey % 5), pa.int64()),
        "o_orderdate": pa.array(dates, pa.timestamp("us")),
    })
    n_li = 120
    lkey = rng.integers(1, n_orders + 1, n_li).astype(np.int64)
    price = np.round(rng.uniform(10, 1000, n_li), 2)
    disc = np.round(rng.uniform(0, 0.1, n_li), 2)
    lineitem = pa.table({
        "l_orderkey": pa.array(lkey, pa.int64()),
        "l_extendedprice": pa.array(price, pa.float64()),
        "l_discount": pa.array(disc, pa.float64()),
    })
    ds = {k: ray.data.from_arrow(t).repartition(3)
          for k, t in [("nation", nation), ("customer", customer),
                       ("orders", orders), ("lineitem", lineitem)]}
    # pandas reference
    odf = orders.to_pandas()
    odf = odf[(odf.o_orderdate >= "1996-01-01") & (odf.o_orderdate < "1997-01-01")]
    ldf = lineitem.to_pandas()
    j = ldf.merge(odf, left_on="l_orderkey", right_on="o_orderkey")
    j = j.merge(customer.to_pandas(), left_on="o_custkey", right_on="c_custkey")
    j = j.merge(nation.to_pandas(), left_on="c_nationkey", right_on="n_nationkey")
    j["rev"] = j.l_extendedprice * (1.0 - j.l_discount)
    want = (j.groupby("n_name")["rev"].sum().round(4).rename("revenue_r")
            .reset_index().sort_values("n_name").reset_index(drop=True))
    return ds, want


@pytest.mark.parametrize("cap", [5_000_000, 0])
def test_revenue_by_nation_paths_match(ray_session, cap):
    from search_engine_ray.pipelines.relational import revenue_by_nation

    ds, want = _tpch_tiny()
    got = revenue_by_nation(ds["lineitem"], ds["orders"], ds["customer"],
                            ds["nation"], broadcast_cap=cap)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want,
                                  check_dtype=False)


def test_revenue_join_path_fk_violation_is_loud(ray_session):
    """The join path must fail like the broadcast path on an o_custkey
    missing from customer, not silently drop that revenue."""
    import numpy as np
    import ray.data

    from search_engine_ray.pipelines.relational import revenue_by_nation

    nation = ray.data.from_arrow(pa.table(
        {"n_nationkey": pa.array([0], pa.int64()),
         "n_name": pa.array(["X"], pa.string())}))
    customer = ray.data.from_arrow(pa.table(
        {"c_custkey": pa.array([1], pa.int64()),
         "c_nationkey": pa.array([0], pa.int64())}))
    orders = ray.data.from_arrow(pa.table(
        {"o_orderkey": pa.array([10], pa.int64()),
         "o_custkey": pa.array([9999], pa.int64()),  # not in customer
         "o_orderdate": pa.array(np.array(["1996-05-01"], "datetime64[us]"),
                                 pa.timestamp("us"))}))
    lineitem = ray.data.from_arrow(pa.table(
        {"l_orderkey": pa.array([10], pa.int64()),
         "l_extendedprice": pa.array([100.0], pa.float64()),
         "l_discount": pa.array([0.0], pa.float64())}))
    for cap in (0, 5_000_000):  # join path and broadcast path alike
        with pytest.raises(Exception, match="missing from customer"):
            revenue_by_nation(lineitem, orders, customer, nation,
                              broadcast_cap=cap)
