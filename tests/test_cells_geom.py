"""Cell grid + geometry kernel tests."""

import numpy as np

from geo_index_ray.kernels import cells, geom


class TestCells:
    def test_roundtrip_pack_unpack(self):
        lon = np.array([-180.0, -0.1, 0.0, 179.9, 13.4])
        lat = np.array([-89.9, -0.1, 0.0, 89.9, 52.5])
        for res in (0, 1, 4, 8, 15):
            cell = cells.lonlat_to_cell(lon, lat, res)
            r, ix, iy = cells.unpack_cell(cell)
            assert (r == res).all()
            mnx, mny, mxx, mxy = cells.cell_bounds(cell)
            assert ((lon >= mnx) & (lon < mxx)).all()
            assert ((lat >= mny) & (lat < mxy)).all()

    def test_flat_id_matches_sql_formula(self):
        rng = np.random.default_rng(5)
        lon = rng.uniform(-180, 180, 1000)
        lat = rng.uniform(-90, 90, 1000)
        res = 6
        n = 1 << res
        flat = cells.flat_cell_id(lon, lat, res)
        expected = (
            np.floor((lon + 180.0) / 360.0 * n).astype(np.int64) * n
            + np.floor((lat + 90.0) / 180.0 * n).astype(np.int64)
        )
        assert np.array_equal(flat, expected)
        # pack/flat conversions agree
        cell = cells.lonlat_to_cell(lon, lat, res)
        assert np.array_equal(cells.cell_to_flat(cell), flat)
        assert np.array_equal(cells.flat_to_cell(flat, res), cell)

    def test_parent_children(self):
        cell = int(cells.lonlat_to_cell(np.array([13.4]), np.array([52.5]), 8)[0])
        kids = cells.cell_children(cell)
        for k in kids.tolist():
            assert int(cells.cell_parent(np.array([k]), 8)[0]) == cell

    def test_ring(self):
        cell = int(cells.lonlat_to_cell(np.array([0.0]), np.array([0.0]), 5)[0])
        ring = cells.cell_ring(cell, 1)
        assert len(ring) == 9
        assert cell in ring.tolist()
        # pole clipping: a cell on the top row has a 6-cell ring
        top = int(cells.pack_cell(5, np.array([3]), np.array([31]))[0])
        assert len(cells.cell_ring(top, 1)) == 6

    def test_polyfill(self):
        res = 4  # 22.5 x 11.25 degree cells
        mnx = np.array([-10.0, 100.0])
        mny = np.array([-10.0, 40.0])
        mxx = np.array([10.0, 101.0])
        mxy = np.array([10.0, 41.0])
        rows, cc = cells.polyfill_boxes(mnx, mny, mxx, mxy, res)
        # every covered cell really overlaps the box
        bmnx, bmny, bmxx, bmxy = cells.cell_bounds(cc)
        ok = geom.boxes_intersect(
            mnx[rows], mny[rows], mxx[rows], mxy[rows], bmnx, bmny, bmxx, bmxy
        )
        assert ok.all()
        # and the point cell of each corner is among the covered cells
        for i in range(2):
            cset = set(cc[rows == i].tolist())
            for lon, lat in [(mnx[i], mny[i]), (mxx[i], mxy[i])]:
                assert int(cells.lonlat_to_cell(np.array([lon]), np.array([lat]), res)[0]) in cset


class TestGeom:
    def test_haversine_ny_london(self):
        # ≈ 5,585 km ± 50 km with R=6378137 (src/rtree/distance.rs:175-181)
        d = float(geom.haversine(-74.0, 40.7, -0.1, 51.5))
        assert abs(d - 5_585_000) < 50_000

    def test_pip_square(self):
        poly = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], dtype=np.float64)
        px = np.array([5.0, 15.0, -1.0, 9.99])
        py = np.array([5.0, 5.0, 5.0, 0.01])
        assert geom.points_in_polygon(px, py, poly).tolist() == [True, False, False, True]

    def test_pip_concave(self):
        # L-shape
        poly = np.array(
            [[0, 0], [10, 0], [10, 4], [4, 4], [4, 10], [0, 10]], dtype=np.float64
        )
        px = np.array([2.0, 8.0, 8.0, 2.0])
        py = np.array([2.0, 2.0, 8.0, 8.0])
        assert geom.points_in_polygon(px, py, poly).tolist() == [True, True, False, True]

    def test_f64_box_to_f32_outward(self):
        rng = np.random.default_rng(11)
        mnx = rng.uniform(-1e6, 1e6, 1000)
        mny = rng.uniform(-1e6, 1e6, 1000)
        mxx = mnx + rng.uniform(0, 10, 1000)
        mxy = mny + rng.uniform(0, 10, 1000)
        a, b, c, d = geom.f64_box_to_f32(mnx, mny, mxx, mxy)
        assert (a.astype(np.float64) <= mnx).all()
        assert (b.astype(np.float64) <= mny).all()
        assert (c.astype(np.float64) >= mxx).all()
        assert (d.astype(np.float64) >= mxy).all()

    def test_axis_dist(self):
        assert geom.axis_dist(5.0, 10.0, 20.0) == 5.0
        assert geom.axis_dist(15.0, 10.0, 20.0) == 0.0
        assert geom.axis_dist(25.0, 10.0, 20.0) == 5.0
