"""Property-based kernel sweeps (hypothesis) — the engine's analog of the
reference's degenerate/property tests (src/rtree/builder.rs:261-301,
src/rtree/index.rs:243-268): random inputs, brute-force cross-checks,
every returned id in-range and every non-returned id out-of-range."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from geo_index_ray.kernels import cells as cellmod
from geo_index_ray.kernels import geom, kdtree, rtree

# width=32: squared distances of subnormal-scale doubles (e.g. 2.2e-308)
# underflow to exactly 0.0, making the brute-force oracle disagree with
# coordinate-space pruning — an inherent kdbush edge the reference shares
# (its within() prunes on coordinates and tests squared distances the
# same way).  float32-representable magnitudes keep squares well inside
# the normal f64 range.
coords = st.floats(
    min_value=-180.0, max_value=180.0, allow_nan=False, allow_infinity=False,
    width=32,
)


def _boxes(draw, n):
    xs = draw(
        st.lists(coords, min_size=2 * n, max_size=2 * n).map(np.array)
    )
    ys = draw(
        st.lists(coords, min_size=2 * n, max_size=2 * n).map(np.array)
    )
    mnx = np.minimum(xs[:n], xs[n:])
    mxx = np.maximum(xs[:n], xs[n:])
    mny = np.minimum(ys[:n], ys[n:])
    mxy = np.maximum(ys[:n], ys[n:])
    return mnx, mny, mxx, mxy


@st.composite
def box_sets(draw):
    n = draw(st.integers(min_value=0, max_value=120))
    return _boxes(draw, n)


@st.composite
def point_sets(draw):
    n = draw(st.integers(min_value=0, max_value=150))
    x = draw(st.lists(coords, min_size=n, max_size=n).map(np.array))
    y = draw(st.lists(coords, min_size=n, max_size=n).map(np.array))
    return x, y


class TestRTreeProperties:
    @settings(max_examples=40, deadline=None)
    @given(data=box_sets(), q=st.tuples(coords, coords, coords, coords))
    def test_search_equals_brute_force(self, data, q):
        mnx, mny, mxx, mxy = data
        qx0, qy0, qx1, qy1 = min(q[0], q[2]), min(q[1], q[3]), max(q[0], q[2]), max(q[1], q[3])
        for method in ("hilbert", "str"):
            tree = rtree.build_rtree(mnx, mny, mxx, mxy, method=method)
            got = np.sort(rtree.search(tree, qx0, qy0, qx1, qy1))
            want = np.sort(
                np.nonzero(
                    (mnx <= qx1) & (mxx >= qx0) & (mny <= qy1) & (mxy >= qy0)
                )[0].astype(np.uint32)
            )
            assert np.array_equal(got, want), method

    @settings(max_examples=25, deadline=None)
    @given(data=point_sets(), q=st.tuples(coords, coords), k=st.integers(1, 12))
    def test_knn_matches_brute(self, data, q, k):
        x, y = data
        if len(x) == 0:
            return
        tree = rtree.build_rtree(x, y, x, y)
        got = rtree.neighbors(tree, q[0], q[1], max_results=k)
        d = (x - q[0]) ** 2 + (y - q[1]) ** 2
        kk = min(k, len(x))
        # distances must match the brute-force k smallest (ids may differ
        # on exact ties)
        assert np.allclose(np.sort(d[got]), np.sort(d)[:kk])

    @settings(max_examples=25, deadline=None)
    @given(data=box_sets())
    def test_tree_join_self_contains_diagonal(self, data):
        mnx, mny, mxx, mxy = data
        if len(mnx) == 0:
            return
        tree = rtree.build_rtree(mnx, mny, mxx, mxy)
        li, ri = rtree.tree_join(tree, tree)
        pairs = set(zip(li.tolist(), ri.tolist()))
        for i in range(len(mnx)):
            assert (i, i) in pairs


class TestKDTreeProperties:
    @settings(max_examples=40, deadline=None)
    @given(data=point_sets(), q=st.tuples(coords, coords, coords, coords))
    def test_range_equals_brute_force(self, data, q):
        x, y = data
        qx0, qy0, qx1, qy1 = min(q[0], q[2]), min(q[1], q[3]), max(q[0], q[2]), max(q[1], q[3])
        tree = kdtree.build_kdtree(x, y)
        got = np.sort(kdtree.range_query(tree, qx0, qy0, qx1, qy1))
        want = np.sort(
            np.nonzero((x >= qx0) & (x <= qx1) & (y >= qy0) & (y <= qy1))[0].astype(
                np.uint32
            )
        )
        assert np.array_equal(got, want)

    @settings(max_examples=40, deadline=None)
    @given(data=point_sets(), q=st.tuples(coords, coords),
           r=st.floats(0.0, 100.0, allow_nan=False))
    def test_within_equals_brute_force(self, data, q, r):
        x, y = data
        tree = kdtree.build_kdtree(x, y)
        got = np.sort(kdtree.within(tree, q[0], q[1], r))
        d = (x - q[0]) ** 2 + (y - q[1]) ** 2
        want = np.sort(np.nonzero(d <= r * r)[0].astype(np.uint32))
        assert np.array_equal(got, want)


class TestCellProperties:
    @settings(max_examples=50, deadline=None)
    @given(lon=coords, lat=st.floats(-90.0, 90.0, allow_nan=False),
           res=st.integers(0, 10))
    def test_point_in_own_cell_bounds(self, lon, lat, res):
        cell = cellmod.lonlat_to_cell(np.array([lon]), np.array([lat]), res)
        mnx, mny, mxx, mxy = cellmod.cell_bounds(cell)
        assert mnx[0] - 1e-9 <= lon <= mxx[0] + 1e-9
        assert mny[0] - 1e-9 <= lat <= mxy[0] + 1e-9

    @settings(max_examples=40, deadline=None)
    @given(data=box_sets(), res=st.integers(1, 7))
    def test_polyfill_covers_box_corners(self, data, res):
        mnx, mny, mxx, mxy = data
        if len(mnx) == 0:
            return
        mny_c = np.clip(mny, -90, 90)
        mxy_c = np.clip(mxy, -90, 90)
        rows, cc = cellmod.polyfill_boxes(mnx, mny_c, mxx, mxy_c, res)
        covered = {}
        for r, c in zip(rows.tolist(), cc.tolist()):
            covered.setdefault(r, set()).add(c)
        for i in range(len(mnx)):
            # the min corner's cell must be among the box's cells
            corner = int(cellmod.lonlat_to_cell(mnx[i : i + 1], mny_c[i : i + 1], res)[0])
            assert corner in covered.get(i, set())


class TestGeomProperties:
    @settings(max_examples=50, deadline=None)
    @given(data=box_sets())
    def test_f32_cast_contains_f64_box(self, data):
        mnx, mny, mxx, mxy = data
        if len(mnx) == 0:
            return
        f0, f1, f2, f3 = geom.f64_box_to_f32(mnx, mny, mxx, mxy)
        assert (f0.astype(np.float64) <= mnx).all()
        assert (f1.astype(np.float64) <= mny).all()
        assert (f2.astype(np.float64) >= mxx).all()
        assert (f3.astype(np.float64) >= mxy).all()

    @settings(max_examples=50, deadline=None)
    @given(a=st.tuples(coords, st.floats(-90, 90, allow_nan=False)),
           b=st.tuples(coords, st.floats(-90, 90, allow_nan=False)))
    def test_haversine_symmetry_and_bounds(self, a, b):
        d1 = geom.haversine(a[0], a[1], b[0], b[1])
        d2 = geom.haversine(b[0], b[1], a[0], a[1])
        assert np.isclose(d1, d2)
        assert 0.0 <= d1 <= np.pi * geom.EARTH_RADIUS + 1.0


class TestTextHashProperties:
    """The exact-dedup text hash must be value-stable (it is pinned by the
    SQL oracle twin) and must do O(sum len) work off Arrow buffers — the
    round-3 padded-matrix version made one 10 MB outlier in a 4k-row
    batch allocate rows × 10 MB of temporaries."""

    @staticmethod
    def _fnv_scalar(s: str) -> int:
        h = 0xCBF29CE484222325
        for byte in s.encode():
            h = ((h ^ byte) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        return h

    @settings(max_examples=30, deadline=None)
    @given(
        texts=st.lists(
            st.text(
                alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FFF),
                max_size=64,
            ),
            max_size=40,
        )
    )
    def test_matches_scalar_fnv1a(self, texts):
        import pyarrow as pa

        from geo_index_ray.pipelines.dedup import _text_hash64

        got = _text_hash64(pa.array(texts, pa.string()))
        want = np.array([self._fnv_scalar(t) for t in texts], dtype=np.uint64)
        assert np.array_equal(got, want)
        # the list-of-str path must agree with the Arrow path
        assert np.array_equal(_text_hash64(texts), want)

    def test_skewed_batch_one_huge_doc(self):
        """4k short docs + one 4 MB doc: work (and therefore time/space) is
        O(sum len), not O(rows × max len).  The padded-matrix version
        needed a 4k × 4 MB ≈ 16 GB uint64 temporary and would OOM/stall;
        the ragged path finishes in well under a minute."""
        import time

        import pyarrow as pa

        from geo_index_ray.pipelines.dedup import _text_hash64

        texts = [f"doc {i}" for i in range(4000)] + ["z" * 4_000_000]
        t0 = time.perf_counter()
        got = _text_hash64(pa.array(texts, pa.string()))
        elapsed = time.perf_counter() - t0
        assert elapsed < 60.0
        assert len(got) == 4001
        assert got[0] == self._fnv_scalar("doc 0")
        assert len(np.unique(got[:4000])) == 4000  # shorts all distinct
