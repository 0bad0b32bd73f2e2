"""interval_union — per-key coverage sweep vs the gaps-and-islands twin."""

import duckdb
import numpy as np
import pandas as pd

from geo_index_ray.pipelines.events import interval_union, sql_interval_union


def _run(ray_session, df):
    import ray.data

    out = (
        interval_union(
            ray.data.from_pandas(df).repartition(4), "k", "s", "e"
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    ora = (
        con.sql(sql_interval_union("SELECT k, s, e FROM t", "k") + " ORDER BY k")
        .df()
        .astype(out.dtypes)
    )
    pd.testing.assert_frame_equal(out, ora)
    return out


class TestIntervalUnion:
    def test_adversarial_shapes(self, ray_session):
        # k=1: disjoint; k=2: touching (merge); k=3: nested; k=4: late
        # long interval bridging an earlier gap; k=5: identical dups
        df = pd.DataFrame(
            {
                "k": np.array([1, 1, 2, 2, 3, 3, 4, 4, 4, 5, 5], np.int64),
                "s": np.array([0, 10, 0, 5, 1, 2, 1, 12, 2, 7, 7], np.int64),
                "e": np.array([5, 15, 5, 9, 10, 3, 10, 13, 20, 9, 9], np.int64),
            }
        )
        out = _run(ray_session, df).set_index("k")
        assert out.loc[1, "covered"] == 10      # 0-5 + 10-15
        assert out.loc[2, "covered"] == 9       # 0-5 touches 5-9
        assert out.loc[3, "covered"] == 9       # nested inside 1-10
        assert out.loc[4, "covered"] == 19      # 2-20 bridges over 10-12
        assert out.loc[5, "covered"] == 2       # identical dups once

    def test_random_matches_sql(self, ray_session):
        rng = np.random.default_rng(13)
        n = 800
        s = rng.integers(0, 10_000, n)
        df = pd.DataFrame(
            {
                "k": rng.integers(0, 20, n).astype(np.int64),
                "s": s.astype(np.int64),
                "e": (s + rng.integers(1, 500, n)).astype(np.int64),
            }
        )
        out = _run(ray_session, df)
        assert out["n_intervals"].sum() == n
        # coverage never exceeds the key's hull span
        hull = df.groupby("k").agg(lo=("s", "min"), hi=("e", "max"))
        m = out.set_index("k").join(hull)
        assert (m["covered"] <= m["hi"] - m["lo"]).all()
