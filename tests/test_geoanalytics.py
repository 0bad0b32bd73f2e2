"""Cell-grid analytics: rollup nesting, hotspot exactness, density
clustering (adjacency, singletons), and spatial-lag aggregation."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from geo_index_ray.pipelines import geoanalytics as ga
from geo_index_ray.pipelines import tiling


def _points(lon, lat, n_blocks=3):
    df = pd.DataFrame({"x": np.asarray(lon, float), "y": np.asarray(lat, float)})
    return ray.data.from_pandas(df).repartition(n_blocks)


def test_cell_rollup_matches_direct_parent_tiling(ray_session):
    rng = np.random.default_rng(7)
    lon = rng.uniform(-180, 179.99, 400)
    lat = rng.uniform(-90, 89.99, 400)
    rolled = (
        ga.cell_rollup(_points(lon, lat), 7, 3)
        .to_pandas().sort_values("cell").reset_index(drop=True)
    )
    direct = (
        tiling.cell_histogram(_points(lon, lat), 3)
        .to_pandas().sort_values("cell").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(rolled, direct)


def test_cell_rollup_rejects_inverted_resolutions(ray_session):
    with pytest.raises(ValueError):
        ga.cell_rollup(_points([0.0], [0.0]), 3, 7)


def test_cell_hotspots_zscore_exact(ray_session):
    # 3 occupied cells with counts 1, 2, 3 at res 1 (cells are quadrants)
    lon = [-170.0, 10.0, 10.0, 100.0, 100.0, 100.0]
    lat = [-80.0, -80.0, -80.5, 80.0, 80.0, 80.5]
    out = (
        ga.cell_hotspots(_points(lon, lat), 1)
        .to_pandas().sort_values("n_rows").reset_index(drop=True)
    )
    n = out["n_rows"].to_numpy()
    assert n.tolist() == [1, 2, 3]
    N, S, Q = 3, 6, 14
    den = float(N * Q - S * S) ** 0.5
    expect = (n * N - S).astype(float) / den
    np.testing.assert_array_equal(out["z"].to_numpy(), expect)


def test_cell_hotspots_zero_variance_emits_null(ray_session):
    lon = [-170.0, 100.0]
    lat = [-80.0, 80.0]
    out = ga.cell_hotspots(_points(lon, lat, 2), 1).to_pandas()
    assert out["z"].isna().all()


def test_grid_cluster_merges_diagonal_and_keeps_singletons(ray_session):
    # res 4 grid (22.5 x 11.25 deg cells).  Three core cells: two touch
    # diagonally (one component), one isolated far away.  A sub-threshold
    # cell must not appear at all.
    def cell_center(ix, iy, res=4):
        n = 1 << res
        return (-180 + (ix + 0.5) * 360 / n, -90 + (iy + 0.5) * 180 / n)

    pts = []
    for ix, iy, cnt in [(3, 3, 2), (4, 4, 3), (12, 10, 2), (8, 8, 1)]:
        x, y = cell_center(ix, iy)
        pts += [(x, y)] * cnt
    lon, lat = zip(*pts)
    out = (
        ga.grid_cluster(_points(lon, lat), 4, 2)
        .to_pandas().sort_values("cluster").reset_index(drop=True)
    )
    n = 1 << 4
    flat = lambda ix, iy: ix * n + iy
    # diagonal pair clusters under its min id; isolated core is a singleton
    assert out["cluster"].tolist() == [flat(3, 3), flat(12, 10)]
    assert out["n_cells"].tolist() == [2, 1]
    assert out["n_points"].tolist() == [5, 2]


def test_grid_cluster_no_cores_is_empty(ray_session):
    out = ga.grid_cluster(_points([0.0, 50.0], [0.0, 20.0]), 4, 5).to_pandas()
    assert len(out) == 0


def test_spatial_lag_exact_integer_mean(ray_session):
    pairs = ray.data.from_pandas(
        pd.DataFrame({"lid": [1, 1, 2], "rid": [10, 11, 10]})
    ).repartition(2)
    vals = ray.data.from_pandas(
        pd.DataFrame({"rid": [10, 11], "cents": [12345, 100]})
    )
    out = (
        ga.spatial_lag(pairs, vals, "lid", "rid")
        .to_pandas().sort_values("lid").reset_index(drop=True)
    )
    assert out["n_close"].tolist() == [2, 1]
    assert out["avg_bal"].to_numpy().tolist() == [
        float(12445) / 200.0,
        float(12345) / 100.0,
    ]


def _idw_ref(lon, lat, res):
    """Brute-force IDW gap-fill reference: dict target_cell -> (n_neigh, est)."""
    from geo_index_ray.kernels import cells as cellmod

    n = 1 << res
    cid = cellmod.flat_cell_id(np.asarray(lon, float), np.asarray(lat, float), res)
    uniq, cnt = np.unique(cid, return_counts=True)
    occ = dict(zip(uniq.tolist(), cnt.tolist()))
    acc = {}
    for c, v in occ.items():
        gx, gy = divmod(c, n)
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    continue
                tx, ty = gx + dx, gy + dy
                if not (0 <= tx < n and 0 <= ty < n):
                    continue
                t = tx * n + ty
                if t in occ:
                    continue
                w = 2 if dx * dx + dy * dy == 1 else 1
                sw, swv, k = acc.get(t, (0, 0, 0))
                acc[t] = (sw + w, swv + w * v, k + 1)
    return {t: (k, float(swv) / float(sw)) for t, (sw, swv, k) in acc.items()}


def test_idw_fill_mixed_weights_exact(ray_session):
    # res 2 (90 x 45 deg cells).  Occupied: (1,1) x4 and (1,2) x8.
    # Target (2,1) is ORTHOGONAL to (1,1) and DIAGONAL to (1,2):
    # est = (2*4 + 1*8) / 3 = 16/3 — exercises both weights in one cell.
    lon = [-45.0] * 12
    lat = [-22.5] * 4 + [22.5] * 8
    out = (
        ga.idw_fill(_points(lon, lat), 2)
        .to_pandas().set_index("cell").sort_index()
    )
    target = 2 * 4 + 1  # (2,1) on the 4-wide grid
    assert out.loc[target, "n_neigh"] == 2
    assert out.loc[target, "est"] == 16.0 / 3.0
    # occupied cells never appear
    assert 1 * 4 + 1 not in out.index and 1 * 4 + 2 not in out.index


def test_idw_fill_matches_bruteforce_and_partitioning(ray_session):
    rng = np.random.default_rng(11)
    lon = rng.uniform(-180, 179.99, 300)
    lat = rng.uniform(-90, 89.99, 300)
    ref = _idw_ref(lon, lat, 5)
    for blocks in (1, 8):
        out = ga.idw_fill(_points(lon, lat, blocks), 5).to_pandas()
        got = {
            int(r.cell): (int(r.n_neigh), float(r.est))
            for r in out.itertuples()
        }
        assert set(got) == set(ref)
        for c in ref:
            assert got[c][0] == ref[c][0]
            assert got[c][1] == ref[c][1]  # integer-exact -> bit-equal


def test_grid_cluster_empty_keeps_schema(ray_session):
    # round-5 regression: zero core cells must still yield the
    # (cluster, n_cells, n_points) schema (driver compares column sets)
    out = ga.grid_cluster(_points([0.0, 50.0], [0.0, 20.0]), 4, 5)
    sch = out.schema()
    assert sch is not None and sch.names == ["cluster", "n_cells", "n_points"]
    cells = ga.grid_cluster(
        _points([0.0, 50.0], [0.0, 20.0]), 4, 5, return_cells=True
    )
    assert cells.schema().names == ["cell", "n_rows", "cluster"]
    env = ga.cluster_envelopes(_points([0.0, 50.0], [0.0, 20.0]), 4, 5)
    assert env.schema().names == [
        "cluster", "n_cells", "n_points",
        "min_ix", "max_ix", "min_iy", "max_iy",
    ]
