"""Trajectory operators vs their DuckDB window-function twins."""

import duckdb
import numpy as np
import pandas as pd

from geo_index_ray.pipelines.trajectory import (
    dwell_segments,
    od_matrix,
    sql_dwell_segments,
    sql_od_matrix,
    sql_trajectory_stats,
    trajectory_stats,
)


def _events(n=400, users=12, seed=5):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame(
        {
            "event_id": np.arange(1, n + 1, dtype=np.int64),
            "user_id": rng.integers(1, users + 1, n).astype(np.int64),
            "ts": pd.to_datetime("2026-01-01")
            + pd.to_timedelta(rng.integers(0, 10**9, n), unit="us"),
        }
    )
    # duplicate timestamps to exercise the (ts, event_id) tiebreak
    df.loc[10:20, "ts"] = df.loc[5, "ts"]
    return df


def _cmp(out: pd.DataFrame, df: pd.DataFrame, sql: str):
    con = duckdb.connect()
    con.register("events", df)
    ora = con.sql(sql).df()
    cols = sorted(out.columns)
    assert cols == sorted(ora.columns)
    a = out[cols].sort_values(cols).reset_index(drop=True)
    b = ora[cols].sort_values(cols).reset_index(drop=True).astype(a.dtypes)
    pd.testing.assert_frame_equal(a, b)
    return a


class TestTrajectoryStats:
    def test_matches_sql_twin(self, ray_session):
        import ray.data

        df = _events()
        ds = ray.data.from_pandas(df).repartition(5)
        out = trajectory_stats(ds).to_pandas()
        a = _cmp(out, df, sql_trajectory_stats("events"))
        assert (a["n_legs"] >= 1).all()
        assert (a["max_leg_sq_md"] <= a["path_sq_md"]).all()

    def test_single_event_users_absent(self, ray_session):
        import ray.data

        df = _events(n=8, users=40, seed=1)  # most users have 1 event
        df.loc[:1, "user_id"] = 7  # exactly one user with 2 events
        singles = df.groupby("user_id").size()
        lone = set(singles[singles == 1].index)
        ds = ray.data.from_pandas(df)
        out = trajectory_stats(ds).to_pandas()
        assert lone.isdisjoint(set(out["user_id"]))
        _cmp(out, df, sql_trajectory_stats("events"))


class TestOdMatrix:
    def test_matches_sql_twin(self, ray_session):
        import ray.data

        df = _events()
        ds = ray.data.from_pandas(df).repartition(7)
        out = od_matrix(ds, res=2).to_pandas()
        a = _cmp(out, df, sql_od_matrix("events", res=2))
        # transition conservation: total trips == total legs
        n_legs = (df.groupby("user_id").size() - 1).clip(lower=0).sum()
        assert a["n_trips"].sum() == n_legs

    def test_partition_invariant(self, ray_session):
        import ray.data

        df = _events(seed=11)
        a = od_matrix(ray.data.from_pandas(df), res=2).to_pandas()
        b = od_matrix(
            ray.data.from_pandas(df).repartition(13), res=2
        ).to_pandas()
        cols = ["from_cell", "to_cell", "n_trips"]
        pd.testing.assert_frame_equal(
            a[cols].sort_values(cols).reset_index(drop=True),
            b[cols].sort_values(cols).reset_index(drop=True),
        )


class TestDwellSegments:
    def test_matches_sql_twin(self, ray_session):
        import ray.data

        df = _events(n=600, users=6, seed=3)  # few users → long runs at res 1
        ds = ray.data.from_pandas(df).repartition(4)
        out = dwell_segments(ds, res=1).to_pandas()
        assert len(out) > 0
        a = _cmp(out, df, sql_dwell_segments("events", res=1))
        assert (a["n_events"] >= 2).all()
        assert (a["dur_us"] >= 0).all()

    def test_min_events_filter_keeps_ordinals(self, ray_session):
        import ray.data

        df = _events(n=600, users=6, seed=3)
        ds = ray.data.from_pandas(df)
        all_runs = dwell_segments(ds, res=1, min_events=1).to_pandas()
        filtered = dwell_segments(
            ray.data.from_pandas(df), res=1, min_events=3
        ).to_pandas()
        # filtered is exactly the >=3 subset of the full run list,
        # ordinals unchanged
        key = ["user_id", "seg_seq", "cell", "n_events", "dur_us"]
        big = all_runs[all_runs["n_events"] >= 3]
        pd.testing.assert_frame_equal(
            big[key].sort_values(key).reset_index(drop=True),
            filtered[key].sort_values(key).reset_index(drop=True),
        )


class TestStateTransitions:
    def test_matches_sql_twin(self, ray_session):
        import duckdb
        import ray.data

        from geo_index_ray.pipelines.trajectory import (
            sql_state_transitions,
            state_transitions,
        )

        rng = np.random.default_rng(17)
        n = 500
        df = pd.DataFrame(
            {
                "event_id": np.arange(1, n + 1, dtype=np.int64),
                "user_id": rng.integers(1, 15, n).astype(np.int64),
                "ts": pd.to_datetime("2026-01-01")
                + pd.to_timedelta(rng.integers(0, 10**8, n), unit="us"),
                "state": rng.choice(["view", "click", "buy"], n),
            }
        )
        ds = ray.data.from_pandas(df).repartition(6)
        out = (
            state_transitions(ds, "state")
            .to_pandas()
            .sort_values(["from_state", "to_state"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("events", df)
        ora = (
            con.sql(
                sql_state_transitions("events", "state")
                + " ORDER BY from_state, to_state"
            )
            .df()
            .astype(out.dtypes)
        )
        pd.testing.assert_frame_equal(out, ora)
        n_legs = (df.groupby("user_id").size() - 1).sum()
        assert out["n_trans"].sum() == n_legs
