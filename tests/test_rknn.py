"""rknn_counts — reverse-kNN influence counts, tie semantics vs DuckDB."""

import duckdb
import numpy as np
import pandas as pd

from geo_index_ray.pipelines.knn import rknn_counts


def _oracle(pts, fac, k):
    con = duckdb.connect()
    con.register("p", pts)
    con.register("f", fac)
    return con.sql(f"""
        WITH d AS (
          SELECT f.fid,
                 ROW_NUMBER() OVER (
                   PARTITION BY p.pid
                   ORDER BY (f.x - p.x) * (f.x - p.x)
                          + (f.y - p.y) * (f.y - p.y), f.fid
                 ) AS rnk
          FROM p CROSS JOIN f
        )
        SELECT fid, CAST(COUNT(*) AS BIGINT) AS n_rknn
        FROM d WHERE rnk <= {k} GROUP BY fid
    """).df()


def _run(ray_session, pts, fac, k):
    import ray.data

    ds = ray.data.from_pandas(pts).repartition(4)
    out = rknn_counts(
        ds, fac[["x", "y"]].to_numpy(), fac["fid"].to_numpy(), k, "fid"
    ).to_pandas()
    return out.sort_values("fid").reset_index(drop=True)


class TestRknnCounts:
    def test_matches_sql_twin(self, ray_session):
        rng = np.random.default_rng(9)
        pts = pd.DataFrame(
            {
                "pid": np.arange(200, dtype=np.int64),
                "x": rng.uniform(-10, 10, 200),
                "y": rng.uniform(-10, 10, 200),
            }
        )
        fac = pd.DataFrame(
            {
                "fid": rng.permutation(np.arange(100, 112, dtype=np.int64)),
                "x": rng.uniform(-10, 10, 12),
                "y": rng.uniform(-10, 10, 12),
            }
        )
        out = _run(ray_session, pts, fac, 3)
        ora = _oracle(pts, fac, 3).sort_values("fid").reset_index(drop=True)
        pd.testing.assert_frame_equal(out, ora.astype(out.dtypes))
        assert out["n_rknn"].sum() == 3 * len(pts)

    def test_ties_go_to_lower_id(self, ray_session):
        # two facilities equidistant from every point on the y-axis:
        # k=1 must always pick the lower id, as ROW_NUMBER does
        pts = pd.DataFrame(
            {
                "pid": np.arange(8, dtype=np.int64),
                "x": np.zeros(8),
                "y": np.linspace(-3, 3, 8),
            }
        )
        fac = pd.DataFrame(
            {"fid": np.array([42, 7], dtype=np.int64),
             "x": np.array([1.0, -1.0]), "y": np.zeros(2)}
        )
        out = _run(ray_session, pts, fac, 1)
        assert out["fid"].tolist() == [7]
        assert out["n_rknn"].tolist() == [8]
        ora = _oracle(pts, fac, 1).sort_values("fid").reset_index(drop=True)
        pd.testing.assert_frame_equal(out, ora.astype(out.dtypes))

    def test_k_clamped_to_facility_count(self, ray_session):
        pts = pd.DataFrame(
            {"pid": np.arange(5, dtype=np.int64),
             "x": np.arange(5.0), "y": np.arange(5.0)}
        )
        fac = pd.DataFrame(
            {"fid": np.array([1, 2], dtype=np.int64),
             "x": np.array([0.0, 9.0]), "y": np.array([0.0, 9.0])}
        )
        out = _run(ray_session, pts, fac, 10)  # k > m: every facility hit
        assert out["n_rknn"].tolist() == [5, 5]
