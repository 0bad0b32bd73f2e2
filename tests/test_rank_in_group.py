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
