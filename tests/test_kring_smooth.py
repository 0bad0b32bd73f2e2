"""kring_smooth — focal-sum raster smoothing vs its DuckDB twin."""

import duckdb
import numpy as np
import pandas as pd

from geo_index_ray.pipelines.tiling import kring_smooth, sql_kring_smooth

RES = 3  # 8x8 grid


def _hist_df():
    # counts at a corner (0,0), an interior point (4,4), and two
    # adjacent cells whose rings overlap (5,4) — covers edge clipping
    # and contribution stacking.  flat id = ix * 8 + iy.
    cells = np.array([0 * 8 + 0, 4 * 8 + 4, 5 * 8 + 4], dtype=np.int64)
    n = np.array([10, 3, 5], dtype=np.int64)
    return pd.DataFrame({"cell": cells, "n_rows": n})


def _run(ray_session, df, k=1):
    import ray.data

    out = (
        kring_smooth(ray.data.from_pandas(df).repartition(2), RES, k=k)
        .to_pandas()
        .sort_values("cell")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("h0", df)
    ora = (
        con.sql(
            sql_kring_smooth("SELECT cell, n_rows FROM h0", RES, k=k)
            + " ORDER BY cell"
        )
        .df()
        .astype(out.dtypes)
    )
    pd.testing.assert_frame_equal(out, ora)
    return out.set_index("cell")["n_smooth"]


class TestKringSmooth:
    def test_matches_sql_twin(self, ray_session):
        s = _run(ray_session, _hist_df())
        # the corner cell reaches only its 4 in-bounds neighbors + itself
        assert s.loc[0] == 10
        assert s.loc[1 * 8 + 1] == 10
        assert (0 * 8 + 2) not in s.index  # Chebyshev > 1 from the corner
        # between the two stacked interior cells both counts overlap
        assert s.loc[4 * 8 + 4] == 8
        assert s.loc[5 * 8 + 4] == 8
        assert s.loc[3 * 8 + 4] == 3   # only reached by (4,4)
        assert s.loc[6 * 8 + 4] == 5   # only reached by (5,4)

    def test_k2_ring(self, ray_session):
        s = _run(ray_session, _hist_df(), k=2)
        # k=2 from the corner covers a 3x3 in-bounds quadrant: 9 cells
        ix, iy = s.index.to_numpy() // 8, s.index.to_numpy() % 8
        assert ((ix < 3) & (iy < 3)).sum() == 9
        # (2,2) is Chebyshev-2 from BOTH the corner and (4,4): 10 + 3
        assert s.loc[2 * 8 + 2] == 13
        assert s.loc[1 * 8 + 1] == 10  # corner mass only
