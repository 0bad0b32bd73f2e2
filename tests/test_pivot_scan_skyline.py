"""Tests for pivot_counts / running_sum (events.py) and
skyline / mode_per_key (ranking.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


def _events_df(n=4000, users=37, seed=5):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, users, n),
            "ts": pd.to_datetime(
                rng.integers(0, 10**9, n), unit="us"
            ).astype("datetime64[us]"),
            "event_type": rng.choice(["a", "b", "c", "d"], n),
            "value": np.round(rng.uniform(0, 100, n), 2),
        }
    )


class TestPivotCounts:
    def test_matches_pandas_crosstab(self):
        import ray.data

        from geo_index_ray.pipelines import events

        df = _events_df()
        got = (
            events.pivot_counts(
                ray.data.from_pandas(df).repartition(7),
                "user_id", "event_type", ["a", "b", "c"],
            )
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        ct = pd.crosstab(df["user_id"], df["event_type"])
        for t in ("a", "b", "c"):
            assert (got[f"n_{t}"].to_numpy()
                    == ct[t].to_numpy()).all(), t
        # rows of a type NOT pivoted still count toward the total
        tot = df.groupby("user_id").size().sort_index()
        assert (got["n_total"].to_numpy() == tot.to_numpy()).all()
        assert got["n_a"].dtype == np.int64

    def test_absent_type_counts_zero(self):
        import ray.data

        from geo_index_ray.pipelines import events

        df = _events_df(300, users=5)
        got = events.pivot_counts(
            ray.data.from_pandas(df).repartition(3),
            "user_id", "event_type", ["a", "zzz"],
        ).to_pandas()
        assert (got["n_zzz"] == 0).all()


class TestRunningSum:
    def test_matches_pandas_cumsum(self):
        import ray.data

        from geo_index_ray.pipelines import events

        df = _events_df()
        got = (
            events.running_sum(
                ray.data.from_pandas(df).repartition(6),
                "user_id", "ts", "event_id", "value",
            )
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        want = df.sort_values(["user_id", "ts", "event_id"]).copy()
        cents = np.round(want["value"].to_numpy() * 100).astype(np.int64)
        want["run"] = (
            pd.Series(cents).groupby(want["user_id"].to_numpy()).cumsum()
            / 100.0
        ).to_numpy()
        want = want.sort_values("event_id").reset_index(drop=True)
        assert len(got) == len(df)
        assert np.array_equal(
            got["running_value"].to_numpy(), want["run"].to_numpy()
        )

    def test_hot_key_exact(self):
        # one user owns 90% of events; prefix sums stay exact int64
        import ray.data

        from geo_index_ray.pipelines import events

        df = _events_df(3000, users=10)
        df.loc[: int(0.9 * len(df)), "user_id"] = 3
        got = events.running_sum(
            ray.data.from_pandas(df).repartition(5),
            "user_id", "ts", "event_id", "value",
        ).to_pandas()
        total = np.round(
            df.loc[df.user_id == 3, "value"].to_numpy() * 100
        ).astype(np.int64).sum()
        assert (
            got.loc[got.user_id == 3, "running_value"].max()
            == total / 100.0
        )


def _brute_skyline(ids, x, y):
    keep = []
    for i in range(len(x)):
        dominated = False
        for j in range(len(x)):
            if i == j:
                continue
            if (
                x[j] <= x[i]
                and y[j] >= y[i]
                and (x[j] < x[i] or y[j] > y[i])
            ):
                dominated = True
                break
        if not dominated:
            keep.append(ids[i])
    return sorted(keep)


class TestSkyline:
    def test_matches_bruteforce_int_y(self):
        import ray.data

        from geo_index_ray.pipelines import ranking

        rng = np.random.default_rng(11)
        n = 600
        df = pd.DataFrame(
            {
                "id": np.arange(n, dtype=np.int64),
                "price": np.round(rng.uniform(1, 50, n), 2),
                "size": rng.integers(1, 40, n).astype(np.int32),
            }
        )
        got = ranking.skyline(
            ray.data.from_pandas(df).repartition(8), "id", "price", "size"
        ).to_pandas()
        want = _brute_skyline(
            df["id"].to_numpy(), df["price"].to_numpy(), df["size"].to_numpy()
        )
        assert sorted(got["id"].tolist()) == want

    def test_duplicate_points_all_survive(self):
        import ray.data

        from geo_index_ray.pipelines import ranking

        df = pd.DataFrame(
            {
                "id": np.arange(4, dtype=np.int64),
                "x": [1.0, 1.0, 2.0, 0.5],
                "y": np.array([10, 10, 5, 3], np.int64),
            }
        )
        got = ranking.skyline(
            ray.data.from_pandas(df).repartition(2), "id", "x", "y"
        ).to_pandas()
        # (1,10) twice: neither dominates the other; (2,5) dominated by
        # (1,10); (0.5,3) survives (cheapest)
        assert sorted(got["id"].tolist()) == [0, 1, 3]

    def test_float_y(self):
        import ray.data

        from geo_index_ray.pipelines import ranking

        rng = np.random.default_rng(7)
        n = 200
        df = pd.DataFrame(
            {
                "id": np.arange(n, dtype=np.int64),
                "x": rng.uniform(0, 1, n),
                "y": rng.uniform(0, 1, n),
            }
        )
        got = ranking.skyline(
            ray.data.from_pandas(df).repartition(4), "id", "x", "y"
        ).to_pandas()
        want = _brute_skyline(
            df["id"].to_numpy(), df["x"].to_numpy(), df["y"].to_numpy()
        )
        assert sorted(got["id"].tolist()) == want


class TestModePerKey:
    def test_matches_pandas(self):
        import ray.data

        from geo_index_ray.pipelines import ranking

        df = _events_df(5000, users=50, seed=9)
        got = (
            ranking.mode_per_key(
                ray.data.from_pandas(df).repartition(7),
                "user_id", "event_type", out_val="top_event",
            )
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        c = (
            df.groupby(["user_id", "event_type"])
            .size()
            .reset_index(name="cnt")
            .sort_values(
                ["user_id", "cnt", "event_type"],
                ascending=[True, False, True],
            )
        )
        want = c.groupby("user_id").head(1).reset_index(drop=True)
        assert got["user_id"].tolist() == want["user_id"].tolist()
        assert got["top_event"].tolist() == want["event_type"].tolist()
        assert got["cnt"].tolist() == want["cnt"].tolist()
