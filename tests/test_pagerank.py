"""pagerank — integer-quantized PageRank vs its unrolled-CTE DuckDB twin."""

import duckdb
import numpy as np
import pandas as pd

from geo_index_ray.pipelines.components import pagerank, sql_pagerank


def _edges_df():
    # a small web: 1 is a hub everyone links to; 5 is dangling; the
    # (2, 3) pair exchanges links; 4->1 appears TWICE (multigraph)
    src = [2, 3, 4, 4, 2, 3, 1]
    dst = [1, 1, 1, 1, 3, 2, 5]
    return pd.DataFrame(
        {"src": np.array(src, np.int64), "dst": np.array(dst, np.int64)}
    )


def _run(ray_session, df, **kw):
    import ray.data

    out = (
        pagerank(ray.data.from_pandas(df).repartition(3), **kw)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("edges_t", df)
    ora = (
        con.sql(
            sql_pagerank("SELECT src, dst FROM edges_t", **kw)
            + " ORDER BY node"
        )
        .df()
        .astype(out.dtypes)
    )
    pd.testing.assert_frame_equal(out, ora)
    return out.set_index("node")["rank_q"]


class TestPagerank:
    def test_matches_sql_twin(self, ray_session):
        r = _run(ray_session, _edges_df())
        # node 1 forwards ALL its round-1 mass to the dangling sink 5,
        # so the sink ends highest; 1 still beats the symmetric (2, 3)
        # exchange pair, which beats the never-linked node 4
        assert r.loc[5] == r.max()
        assert r.loc[1] > r.loc[2] == r.loc[3] > r.loc[4]
        # node 4 has no in-links: exactly teleport after round 1 onward
        assert r.loc[4] == (15 * (1 << 20)) // 100

    def test_three_iterations(self, ray_session):
        _run(ray_session, _edges_df(), iters=3)

    def test_multigraph_counts_each_edge(self, ray_session):
        # an extra duplicate 2->1 edge raises outdeg(2) to 3, thinning
        # what 3 receives (r//3 instead of r//2) — duplicates must count
        df = _edges_df()
        extra = pd.concat(
            [df, pd.DataFrame({"src": [2], "dst": [1]})], ignore_index=True
        ).astype(np.int64)
        r_base = _run(ray_session, df)
        r_extra = _run(ray_session, extra)
        assert r_extra.loc[3] < r_base.loc[3]
