"""Cell grid + geometry kernel tests."""

import numpy as np
import pytest

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


class TestPolygonDistance:
    """Exact geometry refinement (Q5 / neighbors_geometry parity) and the
    rstar-equivalence candidate-set test on a synthetic polygon fixture
    (mirrors the intent of reference src/rtree/traversal.rs:402-484, which
    checks tree-join candidates against an independent implementation on a
    real 85-polygon set)."""

    def _polys(self, n=85, seed=4):
        rng = np.random.default_rng(seed)
        cx = rng.uniform(-170, 170, n)
        cy = rng.uniform(-80, 80, n)
        rx = rng.uniform(0.5, 8.0, n)
        ry = rng.uniform(0.5, 8.0, n)
        return geom.pentagon_vertices(cx, cy, rx, ry)

    def test_tree_join_candidates_equal_bruteforce(self):
        from geo_index_ray.kernels import rtree

        verts = self._polys()
        mnx = verts[:, :, 0].min(axis=1)
        mxx = verts[:, :, 0].max(axis=1)
        mny = verts[:, :, 1].min(axis=1)
        mxy = verts[:, :, 1].max(axis=1)
        tree = rtree.build_rtree(mnx, mny, mxx, mxy)
        li, ri = rtree.tree_join(tree, tree)
        got = {(int(a), int(b)) for a, b in zip(li, ri)}
        want = set()
        n = len(mnx)
        for i in range(n):
            hit = geom.boxes_intersect(
                mnx[i], mny[i], mxx[i], mxy[i], mnx, mny, mxx, mxy
            )
            for j in np.nonzero(hit)[0]:
                want.add((i, int(j)))
        assert got == want

    def test_dist2_zero_iff_inside(self):
        verts = self._polys(n=40)
        rng = np.random.default_rng(9)
        px = rng.uniform(-175, 175, 300)
        py = rng.uniform(-85, 85, 300)
        d2 = geom.point_to_convex_poly_dist2(px, py, verts)
        for i in range(len(verts)):
            inside = geom.points_in_polygon(px, py, verts[i])
            # ray-cast and half-plane tests agree except exactly on edges
            assert np.array_equal(d2[i] == 0.0, inside)

    def test_dist2_matches_scalar_reference(self):
        verts = self._polys(n=25)
        rng = np.random.default_rng(2)
        px = rng.uniform(-175, 175, 60)
        py = rng.uniform(-85, 85, 60)
        d2 = geom.point_to_convex_poly_dist2(px, py, verts)

        def scalar_dist2(x, y, ring):
            best = np.inf
            for j in range(len(ring)):
                ax, ay = ring[j]
                bx, by = ring[(j + 1) % len(ring)]
                abx, aby = bx - ax, by - ay
                t = ((x - ax) * abx + (y - ay) * aby) / (abx * abx + aby * aby)
                t = min(max(t, 0.0), 1.0)
                dx, dy = x - (ax + t * abx), y - (ay + t * aby)
                best = min(best, dx * dx + dy * dy)
            return best

        for i in range(len(verts)):
            for qi in range(len(px)):
                if d2[i, qi] == 0.0:
                    continue
                assert d2[i, qi] == pytest.approx(
                    scalar_dist2(px[qi], py[qi], verts[i]), rel=0, abs=0.0
                )
