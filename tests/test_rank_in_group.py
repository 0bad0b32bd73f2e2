"""rank_in_group — per-row RANK() window function vs DuckDB."""

import duckdb
import numpy as np
import pandas as pd

from geo_index_ray.pipelines.ranking import rank_in_group, sql_rank_in_group


def _run(ray_session, df):
    import ray.data

    out = (
        rank_in_group(
            ray.data.from_pandas(df).repartition(5), "k", "v", "id"
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    ora = (
        con.sql(sql_rank_in_group("t", "k", "v", "id") + " ORDER BY id")
        .df()
        .astype(out.dtypes)
    )
    pd.testing.assert_frame_equal(out, ora)
    return out


class TestRankInGroup:
    def test_matches_sql_twin_with_ties(self, ray_session):
        rng = np.random.default_rng(31)
        n = 700
        df = pd.DataFrame(
            {
                "id": np.arange(n, dtype=np.int64),
                "k": rng.choice(["en", "de", "fr"], n),
                "v": rng.integers(0, 40, n).astype(np.int64),  # heavy ties
            }
        )
        out = _run(ray_session, df)
        # RANK semantics: ties share a rank, next rank skips
        sub = out[out["k"] == "en"].sort_values(["v", "id"])
        r = sub.groupby("v")["rnk"].nunique()
        assert (r == 1).all()  # equal values → equal rank
        assert sub["rnk"].min() == 1

    def test_every_row_ranked(self, ray_session):
        rng = np.random.default_rng(32)
        df = pd.DataFrame(
            {
                "id": np.arange(100, dtype=np.int64),
                "k": rng.choice(["a", "b"], 100),
                "v": rng.normal(size=100),  # float values, no ties
            }
        )
        out = _run(ray_session, df)
        assert len(out) == 100
        for _, sub in out.groupby("k"):
            assert sorted(sub["rnk"]) == list(range(1, len(sub) + 1))

    def test_join_path_identical_to_broadcast(self, ray_session):
        # round-5 scale path: force the key-sheltered shuffle join and
        # require byte-identical rows vs both the broadcast path and SQL
        import ray.data

        rng = np.random.default_rng(33)
        n = 900
        df = pd.DataFrame(
            {
                "id": np.arange(n, dtype=np.int64),
                "k": rng.choice(["en", "de", "fr", "ja"], n),
                "v": rng.integers(0, 50, n).astype(np.int64),
            }
        )
        ds = ray.data.from_pandas(df).repartition(7)
        a = (
            rank_in_group(ds, "k", "v", "id")
            .to_pandas().sort_values("id").reset_index(drop=True)
        )
        b = (
            rank_in_group(ds, "k", "v", "id", force_join_path=True)
            .to_pandas().sort_values("id").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict())[a.columns])

    def test_join_path_float_values(self, ray_session):
        import ray.data

        rng = np.random.default_rng(34)
        df = pd.DataFrame(
            {
                "id": np.arange(300, dtype=np.int64),
                "k": rng.choice(["a", "b"], 300),
                "v": np.round(rng.normal(size=300), 6),
            }
        )
        ds = ray.data.from_pandas(df).repartition(4)
        a = (
            rank_in_group(ds, "k", "v", "id")
            .to_pandas().sort_values("id").reset_index(drop=True)
        )
        b = (
            rank_in_group(ds, "k", "v", "id", force_join_path=True)
            .to_pandas().sort_values("id").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict())[a.columns])

    def test_auto_switch_by_measured_pairs(self, ray_session):
        # tiny ceiling -> the gate must take the join path and still
        # match DuckDB exactly
        import ray.data

        rng = np.random.default_rng(35)
        n = 400
        df = pd.DataFrame(
            {
                "id": np.arange(n, dtype=np.int64),
                "k": rng.choice(["x", "y"], n),
                "v": rng.integers(0, 30, n).astype(np.int64),
            }
        )
        out = (
            rank_in_group(
                ray.data.from_pandas(df).repartition(5), "k", "v", "id",
                max_broadcast_pairs=3,
            )
            .to_pandas().sort_values("id").reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("t", df)
        ora = (
            con.sql(sql_rank_in_group("t", "k", "v", "id") + " ORDER BY id")
            .df().astype(out.dtypes.to_dict())
        )
        pd.testing.assert_frame_equal(out, ora[out.columns])


class TestPercentRankJoinPath:
    def test_both_paths_identical(self, ray_session):
        import ray.data

        from geo_index_ray.pipelines.ranking import percent_rank_in_group

        rng = np.random.default_rng(36)
        n = 600
        df = pd.DataFrame(
            {
                "id": np.arange(n, dtype=np.int64),
                "k": rng.choice(["en", "de", "solo"], n),
                "v": rng.integers(0, 25, n).astype(np.int64),
            }
        )
        # force one single-row group (percent_rank = 0.0 branch)
        df.loc[df.index[-1], "k"] = "lonely"
        ds = ray.data.from_pandas(df).repartition(6)
        a = (
            percent_rank_in_group(ds, "k", "v", "id")
            .to_pandas().sort_values("id").reset_index(drop=True)
        )
        b = (
            percent_rank_in_group(ds, "k", "v", "id", force_join_path=True)
            .to_pandas().sort_values("id").reset_index(drop=True)
        )
        # IEEE-identical, not approx: both paths divide the same ints
        pd.testing.assert_frame_equal(
            a, b.astype(a.dtypes.to_dict())[a.columns], check_exact=True
        )
