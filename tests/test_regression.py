"""grouped_regression — exact per-key OLS vs the SQL-moment twin."""

import duckdb
import numpy as np
import pandas as pd

from geo_index_ray.pipelines.events import grouped_regression

SQL = """
WITH m AS (
  SELECT k, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(x * y) AS sxy
  FROM t GROUP BY 1
)
SELECT k, n,
       CASE WHEN n * sxx - sx * sx <= 0 THEN NULL
            ELSE CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE) END AS slope,
       CASE WHEN n * sxx - sx * sx <= 0 THEN NULL
            ELSE (CAST(sy AS DOUBLE)
                  - (CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
                 / CAST(n AS DOUBLE) END AS intercept
FROM m
"""


def _run(ray_session, df):
    import ray.data

    out = (
        grouped_regression(
            ray.data.from_pandas(df).repartition(4), "k", "x", "y"
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    ora = con.sql(SQL + " ORDER BY k").df().astype(out.dtypes)
    pd.testing.assert_frame_equal(out, ora)
    return out


class TestGroupedRegression:
    def test_matches_sql_twin(self, ray_session):
        rng = np.random.default_rng(2)
        n = 500
        df = pd.DataFrame(
            {
                "k": rng.integers(0, 5, n).astype(np.int64),
                "x": rng.integers(0, 24, n).astype(np.int64),
                "y": rng.integers(0, 50_000, n).astype(np.int64),
            }
        )
        out = _run(ray_session, df)
        assert len(out) == 5
        # cross-check one key against numpy's own lstsq fit
        sub = df[df["k"] == 3]
        slope_np = np.polyfit(sub["x"], sub["y"], 1)[0]
        got = out.set_index("k").loc[3, "slope"]
        assert abs(got - slope_np) < 1e-6 * max(1.0, abs(slope_np))

    def test_zero_variance_is_null(self, ray_session):
        df = pd.DataFrame(
            {
                "k": np.array([1, 1, 1, 2, 2], dtype=np.int64),
                "x": np.array([7, 7, 7, 1, 2], dtype=np.int64),  # k=1: no var
                "y": np.array([1, 2, 3, 10, 20], dtype=np.int64),
            }
        )
        out = _run(ray_session, df)
        assert np.isnan(out.set_index("k").loc[1, "slope"])
        assert out.set_index("k").loc[2, "slope"] == 10.0

    def test_bigint_fallback_exact(self, ray_session):
        # moments whose final products pass 2^62: forces the
        # arbitrary-precision path, which must still match DuckDB HUGEINT
        rng = np.random.default_rng(4)
        n = 64
        df = pd.DataFrame(
            {
                "k": np.zeros(n, dtype=np.int64),
                "x": rng.integers(1, 2**20, n).astype(np.int64),
                "y": rng.integers(2**35, 2**36, n).astype(np.int64),
            }
        )
        _run(ray_session, df)

    def test_sxy_overflow_guard(self, ray_session):
        # |n·Σxy| > 2^63 while n·Σx² and Σx·Σy stay tiny — the one
        # product the other guard terms cannot bound (no syy here, so
        # no Cauchy-Schwarz ceiling).  The int64 fast path would wrap
        # the slope numerator to a garbage value; the guard must route
        # this to the big-int fallback.  True slope = 2e18 exactly.
        df = pd.DataFrame(
            {
                "k": np.zeros(4, dtype=np.int64),
                "x": np.array([1, -1, 1, -1], dtype=np.int64),
                "y": np.array(
                    [2 * 10**18, -2 * 10**18, 2 * 10**18, -2 * 10**18],
                    dtype=np.int64,
                ),
            }
        )
        import ray.data

        out = (
            grouped_regression(
                ray.data.from_pandas(df).repartition(2), "k", "x", "y"
            )
            .to_pandas()
        )
        assert out.loc[0, "slope"] == 2.0e18
        assert out.loc[0, "intercept"] == 0.0
