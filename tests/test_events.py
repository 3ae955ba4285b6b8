"""Event windowing + sessionization: vectorized multi-user kernel vs a
per-user reference, gap boundaries, users straddling partitions."""

import numpy as np
import pandas as pd
import pytest

from search_engine_ray.pipelines.events import US_PER_MIN, sessionize, tumbling_window_agg

BASE_US = 1_700_000_000_000_000 - (1_700_000_000_000_000 % 3_600_000_000)  # hour-aligned


def _events(rows):
    """rows: (event_id, user_id, minutes_offset, value)."""
    return pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "user_id": [r[1] for r in rows],
            "ts": pd.to_datetime([BASE_US + r[2] * US_PER_MIN for r in rows], unit="us"),
            "event_type": ["click"] * len(rows),
            "value": [float(r[3]) for r in rows],
        }
    )


def _sessions_reference(df, gap_min=30):
    out = []
    for uid, g in df.sort_values(["user_id", "ts", "event_id"]).groupby("user_id"):
        ts = g["ts"].astype("int64").to_numpy() // 1000  # ns → us
        sess = 0
        start = None
        prev = None
        rows = []
        for t in ts:
            if prev is None or t - prev > gap_min * US_PER_MIN:
                if start is not None:
                    rows.append((sess, n, start, prev))
                sess += 1
                start = t
                n = 0
            n += 1
            prev = t
        rows.append((sess, n, start, prev))
        for s, n_, a, b in rows:
            out.append({"user_id": uid, "session_idx": s, "n_events": n_,
                        "session_start_us": a, "session_end_us": b})
    return pd.DataFrame(out)


class TestSessionize:
    @pytest.mark.parametrize("n_blocks", [1, 4])
    def test_matches_reference_with_gap_boundaries(self, ray_session, n_blocks):
        import ray.data

        rows = []
        eid = 0
        # user 1: exactly-30min gaps (NOT a break; break is strictly >)
        for off in [0, 30, 60, 91, 121]:   # break before 91 (31min gap)
            rows.append((eid, 1, off, 1.0)); eid += 1
        # user 2: single event
        rows.append((eid, 2, 10, 2.0)); eid += 1
        # user 3: many sessions, interleaved arrival order
        for off in [0, 5, 100, 105, 200]:
            rows.append((eid, 3, off, 3.0)); eid += 1
        np.random.default_rng(1).shuffle(rows)
        df = _events(rows)
        ds = ray.data.from_pandas(df).repartition(n_blocks)
        got = (sessionize(ds).to_pandas()
               .sort_values(["user_id", "session_idx"]).reset_index(drop=True))
        want = (_sessions_reference(df)
                .sort_values(["user_id", "session_idx"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))
        # user 1: the 30-min gaps do NOT split; only the 31-min gap does
        assert got[got["user_id"] == 1]["session_idx"].max() == 2

    def test_user_straddling_blocks(self, ray_session):
        import ray.data

        # one user, events spread over many blocks — complete-group
        # guarantee must still produce ONE session row
        rows = [(i, 7, i, 1.0) for i in range(40)]  # 1-min apart → 1 session
        ds = ray.data.from_pandas(_events(rows)).repartition(8)
        got = sessionize(ds).to_pandas()
        assert len(got) == 1
        assert got.iloc[0]["n_events"] == 40


class TestTumblingWindows:
    def test_counts_and_sums(self, ray_session):
        import ray.data

        rows = [(0, 1, 0, 1.5), (1, 1, 59, 2.5), (2, 2, 60, 4.0), (3, 2, 121, 8.0)]
        ds = ray.data.from_pandas(_events(rows))
        out = tumbling_window_agg(ds).to_pandas().sort_values("window_start_us")
        assert list(out["n_events"]) == [2, 1, 1]
        assert list(out["sum_value"]) == [4.0, 4.0, 8.0]
        ws = out["window_start_us"].to_numpy()
        assert ((ws % 3_600_000_000) == 0).all()


class TestHoppingWindows:
    def test_each_event_covers_r_windows(self, ray_session):
        import ray.data

        from search_engine_ray.pipelines.events import hopping_window_agg

        rows = [(0, 1, 0, 1.5), (1, 1, 59, 2.5), (2, 2, 61, 4.0)]
        ds = ray.data.from_pandas(_events(rows))
        out = hopping_window_agg(ds, window_us=3_600_000_000,
                                 hop_us=900_000_000).to_pandas()
        # every event lands in exactly r = 4 windows
        assert out["n_events"].sum() == len(rows) * 4
        assert abs(out["sum_value"].sum() - sum(r[3] for r in rows) * 4) < 1e-9
        ws = out["window_start_us"].to_numpy()
        assert ((ws % 900_000_000) == 0).all()
        # an event at minute 0 appears in windows starting at -45, -30, -15, 0
        w0 = out[out["window_start_us"] <= BASE_US]
        assert len(w0) == 4

    def test_rejects_unaligned_hop(self, ray_session):
        import ray.data

        from search_engine_ray.pipelines.events import hopping_window_agg

        with pytest.raises(ValueError):
            hopping_window_agg(ray.data.from_pandas(_events([(0, 1, 0, 1.0)])),
                               window_us=10, hop_us=3)


class TestValueQuantiles:
    @pytest.mark.parametrize("n_blocks", [1, 7])
    def test_matches_numpy_interpolation(self, ray_session, n_blocks):
        import ray.data

        from search_engine_ray.pipelines.events import value_quantiles

        rng = np.random.default_rng(3)
        vals = rng.normal(size=501)
        df = pd.DataFrame({"value": vals})
        ds = ray.data.from_pandas(df).repartition(n_blocks)
        qs = [0.0, 0.1, 0.5, 0.9, 1.0]
        out = value_quantiles(ds, qs).to_pandas()
        want = np.quantile(vals, qs)  # linear interpolation == quantile_cont
        np.testing.assert_allclose(out["value"].to_numpy(), want, rtol=1e-12)

    def test_empty_input(self, ray_session):
        import ray.data

        from search_engine_ray.pipelines.events import value_quantiles

        ds = ray.data.from_pandas(pd.DataFrame({"value": pd.Series(dtype=float)}))
        assert value_quantiles(ds, [0.5]).num_rows == 0


class TestApproxQuantiles:
    def test_partition_invariant_and_bounded_rank_error(self, ray_session):
        import ray.data

        from search_engine_ray.pipelines.events import value_quantiles_approx

        rng = np.random.default_rng(5)
        n = 20_000
        vals = rng.lognormal(size=n)
        df = pd.DataFrame({"event_id": np.arange(n), "value": vals})
        qs = [0.1, 0.5, 0.9]
        outs = []
        for blocks in (1, 13):
            ds = ray.data.from_pandas(df).repartition(blocks)
            outs.append(value_quantiles_approx(ds, qs, sample_size=2048)
                        .to_pandas()["value"].to_numpy())
        # mergeable hash-rank sample ⇒ identical result at any partitioning
        np.testing.assert_array_equal(outs[0], outs[1])
        # rank error of each estimate vs the exact distribution
        svals = np.sort(vals)
        for q, est in zip(qs, outs[0]):
            rank = np.searchsorted(svals, est) / n
            assert abs(rank - q) < 0.05, (q, rank)

    def test_sample_covers_small_input_exactly(self, ray_session):
        import ray.data

        from search_engine_ray.pipelines.events import value_quantiles_approx

        df = pd.DataFrame({"event_id": np.arange(101),
                           "value": np.arange(101, dtype=float)})
        ds = ray.data.from_pandas(df).repartition(4)
        out = value_quantiles_approx(ds, [0.0, 0.5, 1.0], sample_size=4096).to_pandas()
        # sample == whole input → exact quantiles
        np.testing.assert_allclose(out["value"].to_numpy(), [0.0, 50.0, 100.0])


class TestAsofJoin:
    def _run(self, ray_session, left_rows, right_rows, parts=3):
        import ray.data

        from search_engine_ray.pipelines.events import asof_join

        l = ray.data.from_pandas(_events(left_rows)).repartition(parts)
        r = ray.data.from_pandas(_events(right_rows)).repartition(parts)
        return (asof_join(l, r).to_pandas()
                .sort_values(["user_id", "l_event_id"]).reset_index(drop=True))

    def test_matches_latest_at_or_before(self, ray_session):
        # user 1: rights at t=0,10,20; lefts at 5,10,25
        out = self._run(ray_session,
                        left_rows=[(100, 1, 5, 0), (101, 1, 10, 0), (102, 1, 25, 0)],
                        right_rows=[(200, 1, 0, 1.0), (201, 1, 10, 2.0), (202, 1, 20, 3.0)])
        assert out["l_event_id"].tolist() == [100, 101, 102]
        # t=5 → right@0; t=10 → right@10 (inclusive); t=25 → right@20
        assert out["r_event_id"].tolist() == [200, 201, 202]
        assert out["r_value"].tolist() == [1.0, 2.0, 3.0]

    def test_inner_semantics_and_key_isolation(self, ray_session):
        # left before any right drops; user 2's rights never match user 1
        out = self._run(ray_session,
                        left_rows=[(100, 1, 5, 0), (101, 2, 50, 0)],
                        right_rows=[(200, 2, 10, 7.0), (201, 1, 30, 9.0)])
        assert out["l_event_id"].tolist() == [101]
        assert out["r_event_id"].tolist() == [200]

    def test_right_ts_tie_breaks_by_max_id(self, ray_session):
        out = self._run(ray_session,
                        left_rows=[(100, 1, 10, 0)],
                        right_rows=[(200, 1, 10, 1.0), (205, 1, 10, 2.0), (201, 1, 10, 3.0)])
        assert out["r_event_id"].tolist() == [205]
        assert out["r_value"].tolist() == [2.0]

    def test_users_straddle_partitions(self, ray_session):
        rng = np.random.default_rng(7)
        lefts = [(i, int(rng.integers(1, 6)), int(rng.integers(0, 600)), 0)
                 for i in range(100, 180)]
        rights = [(i, int(rng.integers(1, 6)), int(rng.integers(0, 600)), float(i))
                  for i in range(300, 360)]
        out = self._run(ray_session, lefts, rights, parts=7)
        # scalar reference
        import pandas as pd
        ldf, rdf = _events(lefts), _events(rights)
        exp = []
        for _, lr in ldf.iterrows():
            cand = rdf[(rdf.user_id == lr.user_id) & (rdf.ts <= lr.ts)]
            if len(cand):
                best = cand.sort_values(["ts", "event_id"]).iloc[-1]
                exp.append((lr.event_id, best.event_id))
        exp.sort()
        got = sorted(zip(out["l_event_id"], out["r_event_id"]))
        assert [tuple(map(int, e)) for e in got] == [tuple(map(int, e)) for e in exp]


class TestBroadcastRangeJoin:
    def test_overlapping_multi_match(self, ray_session):
        import pyarrow as pa
        import ray.data

        from search_engine_ray.pipelines.events import broadcast_range_join

        df = pd.DataFrame({"event_id": [1, 2, 3, 4],
                           "value": [5.0, 12.0, 27.0, -1.0]})
        bands = pa.table({"band": pa.array(["low", "mid", "high"]),
                          "lo": pa.array([0.0, 10.0, 25.0]),
                          "hi": pa.array([15.0, 30.0, 1e9])})
        out = (broadcast_range_join(ray.data.from_pandas(df).repartition(2), bands)
               .to_pandas().sort_values(["event_id", "band"]).reset_index(drop=True))
        got = list(zip(out["event_id"], out["band"]))
        # 5→low; 12→low+mid (overlap); 27→mid+high; -1→nothing
        assert got == [(1, "low"), (2, "low"), (2, "mid"), (3, "high"), (3, "mid")]


class TestGroupedQuantiles:
    def test_matches_numpy_per_group(self, ray_session):
        import ray.data

        from search_engine_ray.pipelines.events import grouped_value_quantiles

        rng = np.random.default_rng(5)
        n = 3000
        df = pd.DataFrame({
            "event_type": rng.choice(["a", "b", "c"], size=n),
            "value": rng.normal(size=n) * 10,
        })
        qs = [0.0, 0.25, 0.5, 0.9, 1.0]
        out = (grouped_value_quantiles(
            ray.data.from_pandas(df).repartition(6), qs)
            .to_pandas().sort_values(["event_type", "q"]).reset_index(drop=True))
        for et, g in df.groupby("event_type"):
            exp = np.quantile(g["value"].to_numpy(), qs)
            got = out[out.event_type == et].sort_values("q")["value"].to_numpy()
            np.testing.assert_allclose(got, exp, rtol=1e-12)

    def test_single_row_groups(self, ray_session):
        import ray.data

        from search_engine_ray.pipelines.events import grouped_value_quantiles

        df = pd.DataFrame({"event_type": ["x", "y"], "value": [3.0, 7.0]})
        out = (grouped_value_quantiles(ray.data.from_pandas(df), [0.1, 0.9])
               .to_pandas().sort_values(["event_type", "q"]))
        # one-row group: every quantile equals the single value
        assert out["value"].tolist() == [3.0, 3.0, 7.0, 7.0]


def test_funnel(ray_session):
    import pyarrow as pa
    import ray.data

    from search_engine_ray.pipelines.events import funnel

    US = 1_000_000
    rows = [
        # u1 completes all three within the 10s windows
        (1, "view", 0), (1, "click", 5 * US), (1, "purchase", 12 * US),
        # u2: click comes BEFORE the view → funnel stops after view
        (2, "click", 0), (2, "view", 3 * US),
        # u3: click outside the horizon
        (3, "view", 0), (3, "click", 60 * US),
        # u4: view+click, no purchase
        (4, "view", 0), (4, "click", 1 * US),
        # u5: no view at all
        (5, "purchase", 0),
        # u6: click at EXACTLY the view timestamp (>= contract)
        (6, "view", 7 * US), (6, "click", 7 * US), (6, "purchase", 8 * US),
    ]
    tbl = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows], pa.string()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
    })
    out = (funnel(ray.data.from_arrow(tbl), ["view", "click", "purchase"],
                  horizon_us=10 * US).to_pandas()
           .sort_values("step_idx").reset_index(drop=True))
    assert out["event_type"].tolist() == ["view", "click", "purchase"]
    # view: u1,u2,u3,u4,u6 ; click-after-view in horizon: u1,u2? u2's click
    # precedes its view → no; u4, u6 ; purchase: u1, u6
    assert out["n_users"].tolist() == [5, 3, 2]


def test_cohort_retention(ray_session):
    import pyarrow as pa
    import ray.data

    from search_engine_ray.pipelines.events import cohort_retention

    W = 100  # tiny period for the test
    rows = [  # (user, ts)
        (1, 10), (1, 110), (1, 310),      # cohort 0, active offsets 0,1,3
        (2, 50), (2, 70),                 # cohort 0, offset 0 only (dedup)
        (3, 150), (3, 250),               # cohort 1, offsets 0,1
        (4, 120),                         # cohort 1, offset 0
    ]
    tbl = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
    })
    out = (cohort_retention(ray.data.from_arrow(tbl), period_us=W)
           .to_pandas().sort_values(["cohort_period", "period_offset"])
           .reset_index(drop=True))
    got = {(r.cohort_period, r.period_offset): r.n_users
           for r in out.itertuples()}
    assert got == {(0, 0): 2, (0, 1): 1, (0, 3): 1,
                   (1, 0): 2, (1, 1): 1}


def test_window_anomalies(ray_session):
    import pyarrow as pa
    import ray.data

    from search_engine_ray.pipelines.events import window_anomalies

    H = 3_600_000_000
    rows = []
    # type 'a': 9 quiet windows of 2 events, one spike window of 30
    for w in range(9):
        rows += [(w * H + 1, "a", 1.0)] * 2
    rows += [(9 * H + 1, "a", 1.0)] * 30
    # type 'b': perfectly flat → sd 0 → never anomalous
    for w in range(10):
        rows += [(w * H + 5, "b", 1.0)] * 3
    tbl = pa.table({
        "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[1] for r in rows], pa.string()),
        "value": pa.array([r[2] for r in rows], pa.float64()),
    })
    out = window_anomalies(ray.data.from_arrow(tbl),
                           z_threshold=2.0).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["event_type"] == "a" and r["n_events"] == 30
    assert int(r["window_start_us"]) == 9 * H
    # z spec: mean 4.8, var = (9*2^2+30^2)/10 - 4.8^2
    m = (9 * 2 + 30) / 10
    sd = np.sqrt((9 * 4 + 900) / 10 - m * m)
    assert r["z_r"] == round((30 - m) / sd, 6)


def test_funnel_no_matching_events_emits_zero_rows(ray_session):
    import pyarrow as pa
    import ray.data

    from search_engine_ray.pipelines.events import funnel

    tbl = pa.table({
        "event_id": pa.array([1], pa.int64()),
        "user_id": pa.array([1], pa.int64()),
        "event_type": pa.array(["other"], pa.string()),
        "ts": pa.array([0], pa.timestamp("us")),
    })
    out = (funnel(ray.data.from_arrow(tbl), ["view", "click"], 10)
           .to_pandas().sort_values("step_idx").reset_index(drop=True))
    assert out["n_users"].tolist() == [0, 0]
    assert out["event_type"].tolist() == ["view", "click"]
