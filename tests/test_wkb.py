"""WKB codec + exact point→geometry distance (kernels/wkb.py)."""

import numpy as np
import pyarrow as pa
import pytest

from geo_index_ray.kernels import geom, wkb


def test_point_roundtrip():
    x = np.array([0.0, 3.5, -181.25])
    y = np.array([1.0, -4.5, 89.0])
    col = wkb.encode_points(x, y)
    w = wkb.parse(col)
    assert w.n == 3 and (w.kind == wkb.WKB_POINT).all()
    np.testing.assert_array_equal(w.pt_x, x)
    np.testing.assert_array_equal(w.pt_y, y)


def test_linestring_roundtrip_and_distance():
    ls = [np.array([[0.0, 5.0], [10.0, 5.0]]),
          np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0]])]
    col = wkb.encode_linestrings(ls)
    w = wkb.parse(col)
    assert (w.kind == wkb.WKB_LINESTRING).all()
    d2 = wkb.point_dist2(w, np.array([0.0]), np.array([0.0]))
    # reference's own assertion: distance((0,0), line y=5 x∈[0,10]) == 5
    assert abs(np.sqrt(d2[0, 0]) - 5.0) < 1e-12
    assert d2[1, 0] == 0.0  # on the second linestring's first vertex


def test_reference_wkb_point_distances():
    # the reference's WkbDistanceMetric test vectors
    # (src/rtree/distance.rs:202-280): query (1,1) vs points
    # (0,0), (3,4), (6,8) -> 1.414, 3.605, 8.602
    col = wkb.encode_points(np.array([0.0, 3.0, 6.0]),
                            np.array([0.0, 4.0, 8.0]))
    w = wkb.parse(col)
    d = np.sqrt(wkb.point_dist2(w, np.array([1.0]), np.array([1.0]))[:, 0])
    assert abs(d[0] - 1.414) < 0.01
    assert abs(d[1] - 3.605) < 0.01
    assert abs(d[2] - 8.602) < 0.01


def test_polygon_matches_convex_vertex_path_bitwise():
    rng = np.random.default_rng(3)
    n = 200
    cx = rng.uniform(-100, 100, n)
    cy = rng.uniform(-50, 50, n)
    rx = rng.uniform(0.1, 3.0, n)
    ry = rng.uniform(0.1, 3.0, n)
    verts = geom.pentagon_vertices(cx, cy, rx, ry)
    col = wkb.encode_polygons(verts)
    w = wkb.parse(col)
    qx = rng.uniform(-110, 110, 23)
    qy = rng.uniform(-60, 60, 23)
    got = wkb.point_dist2(w, qx, qy)
    want = geom.point_to_convex_poly_dist2(qx, qy, verts)
    # IEEE-identical: the segment formula mirrors kernels.geom
    np.testing.assert_array_equal(got, want)


def test_polygon_hole_even_odd():
    # outer square (0..10)^2 with hole (4..6)^2: center of hole is OUTSIDE
    outer = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], float)
    hole = np.array([[4, 4], [4, 6], [6, 6], [6, 4], [4, 4]], float)

    def ring_bytes(pts):
        return (np.array([len(pts)], "<u4").tobytes()
                + np.ascontiguousarray(pts, "<f8").tobytes())

    raw = (b"\x01" + np.array([3], "<u4").tobytes()
           + np.array([2], "<u4").tobytes()
           + ring_bytes(outer) + ring_bytes(hole))
    col = pa.array([raw], pa.binary())
    w = wkb.parse(col)
    d2 = wkb.point_dist2(w, np.array([5.0, 2.0, 20.0]),
                         np.array([5.0, 2.0, 5.0]))
    assert d2[0, 0] > 0.0          # inside the hole -> not contained
    assert abs(np.sqrt(d2[0, 0]) - 1.0) < 1e-12  # 1 from hole edge
    assert d2[0, 1] == 0.0         # in the solid annulus
    assert abs(np.sqrt(d2[0, 2]) - 10.0) < 1e-12  # 10 right of outer


def test_big_endian_parse():
    x, y = np.array([7.25]), np.array([-3.5])
    raw = (b"\x00" + np.array([1], ">u4").tobytes()
           + np.array([7.25], ">f8").tobytes()
           + np.array([-3.5], ">f8").tobytes())
    w = wkb.parse(pa.array([raw], pa.binary()))
    assert w.pt_x[0] == 7.25 and w.pt_y[0] == -3.5


def test_mixed_column_and_slice():
    pt = wkb.encode_points(np.array([1.0]), np.array([2.0]))
    ls = wkb.encode_linestrings([np.array([[0.0, 0.0], [4.0, 0.0]])])
    pg = wkb.encode_polygons(
        geom.pentagon_vertices([10.0], [10.0], [1.0], [1.0])
    )
    col = pa.concat_arrays([pt, ls, pg])
    w = wkb.parse(col)
    assert list(w.kind) == [1, 2, 3]
    d2 = wkb.point_dist2(w, np.array([1.0]), np.array([0.0]))
    assert abs(d2[0, 0] - 4.0) < 1e-12   # (1,2) -> (1,0)
    assert d2[1, 0] == 0.0               # on the line
    # sliced column parses with correct offsets
    w2 = wkb.parse(col.slice(1, 2))
    assert list(w2.kind) == [2, 3]


def test_envelopes():
    pg = wkb.encode_polygons(
        np.array([[[0.0, 0.0], [4.0, 0.0], [4.0, 2.0], [0.0, 2.0]]])
    )
    w = wkb.parse(pg)
    mnx, mny, mxx, mxy = wkb.envelopes(w)
    assert (mnx[0], mny[0], mxx[0], mxy[0]) == (0.0, 0.0, 4.0, 2.0)


def test_invalid_inputs():
    with pytest.raises(ValueError):
        wkb.parse(pa.array([b"\x05\x01\x00\x00\x00"], pa.binary()))
    bad_type = b"\x01" + np.array([9], "<u4").tobytes()
    with pytest.raises(ValueError):
        wkb.parse(pa.array([bad_type], pa.binary()))
