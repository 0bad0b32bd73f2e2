"""Vectorized planar/spherical geometry helpers.

Scalar functions mirrored from the reference: ``axis_dist``
(src/rtree/trait.rs:571-579), haversine with WGS84 equatorial radius
(src/rtree/distance.rs:57-125), lossless-outward f64→f32 box cast
(src/rtree/util.rs:26-51).  PIP (ray casting) is the engine's own
"exact refinement" stage — the reference returns bbox candidates only and
leaves exact predicates to the caller (python/.../rtree.pyi:52-61).
"""

from __future__ import annotations

import numpy as np

EARTH_RADIUS = 6378137.0  # WGS84 equatorial radius (src/rtree/distance.rs:72)


def axis_dist(k, mn, mx):
    """Vectorized 1D distance from value(s) to range(s)."""
    return np.where(k < mn, mn - k, np.where(k <= mx, 0.0, k - mx))


def sq_dist(ax, ay, bx, by):
    dx = ax - bx
    dy = ay - by
    return dx * dx + dy * dy


def haversine(lon1, lat1, lon2, lat2, radius: float = EARTH_RADIUS):
    """Great-circle distance in meters; vectorized."""
    lon1, lat1, lon2, lat2 = (np.radians(np.asarray(a, dtype=np.float64)) for a in (lon1, lat1, lon2, lat2))
    dlat = lat2 - lat1
    dlon = lon2 - lon1
    h = np.sin(dlat / 2) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2) ** 2
    return 2.0 * radius * np.arcsin(np.sqrt(np.clip(h, 0.0, 1.0)))


def haversine_to_bbox(lon, lat, min_lon, min_lat, max_lon, max_lat, radius: float = EARTH_RADIUS):
    """Haversine distance to the clamped closest point of a bbox
    (src/rtree/distance.rs:91-115).

    NOTE: the clamped point is IN the box, so this is an upper bound of
    the true min distance on the sphere — matching the reference, and
    safe for the small leaf/node boxes it prunes there.  For LARGE boxes
    (partition envelopes) use ``haversine_env_lower``: pruning with an
    upper bound can discard envelopes that still contain closer points."""
    closest_lon = np.clip(lon, min_lon, max_lon)
    closest_lat = np.clip(lat, min_lat, max_lat)
    return haversine(lon, lat, closest_lon, closest_lat, radius)


def haversine_env_lower(lon, lat, min_lon, min_lat, max_lon, max_lat,
                        radius: float = EARTH_RADIUS):
    """A true LOWER bound on the great-circle distance from a point to any
    point of a lat/lon box — safe for envelope pruning at any box size.

    Two provable bounds, combined by max:

    - latitude: every point of the box differs from the query by at least
      the latitude gap, and a geodesic must traverse it →
      ``d ≥ R · Δφ``;
    - longitude: a geodesic to any point beyond the box's nearer meridian
      must cross that meridian's great circle, whose distance from the
      query is exactly ``R · arcsin(cos φ_q · sin Δλ)`` (cross-track
      formula); Δλ is the CIRCULAR gap (a query at lon −180 is 0.25° from
      a box ending at 179.75, not 359.75°) clamped to π/2, which only
      shrinks the bound.
    """
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    dlat = np.radians(
        np.maximum(0.0, np.maximum(min_lat - lat, lat - max_lat))
    )
    d1 = np.abs(lon - min_lon)
    d1 = np.minimum(d1, 360.0 - d1)
    d2 = np.abs(lon - max_lon)
    d2 = np.minimum(d2, 360.0 - d2)
    inside = (lon >= min_lon) & (lon <= max_lon)
    dlon = np.radians(np.where(inside, 0.0, np.minimum(d1, d2)))
    lat_bound = radius * dlat
    lon_bound = radius * np.arcsin(
        np.clip(np.cos(np.radians(lat)) * np.sin(np.minimum(dlon, np.pi / 2)),
                0.0, 1.0)
    )
    return np.maximum(lat_bound, lon_bound)


def f64_box_to_f32(min_x, min_y, max_x, max_y):
    """Outward f64→f32 cast so the f32 box always contains the f64 box.

    Vectorized equivalent of src/rtree/util.rs:26-51.
    """
    min_x = np.asarray(min_x, dtype=np.float64)
    min_y = np.asarray(min_y, dtype=np.float64)
    max_x = np.asarray(max_x, dtype=np.float64)
    max_y = np.asarray(max_y, dtype=np.float64)
    nmin_x = min_x.astype(np.float32)
    nmin_y = min_y.astype(np.float32)
    nmax_x = max_x.astype(np.float32)
    nmax_y = max_y.astype(np.float32)
    nmin_x = np.where(nmin_x.astype(np.float64) > min_x, np.nextafter(nmin_x, np.float32(-np.inf)), nmin_x)
    nmin_y = np.where(nmin_y.astype(np.float64) > min_y, np.nextafter(nmin_y, np.float32(-np.inf)), nmin_y)
    nmax_x = np.where(nmax_x.astype(np.float64) < max_x, np.nextafter(nmax_x, np.float32(np.inf)), nmax_x)
    nmax_y = np.where(nmax_y.astype(np.float64) < max_y, np.nextafter(nmax_y, np.float32(np.inf)), nmax_y)
    return (
        nmin_x.astype(np.float32),
        nmin_y.astype(np.float32),
        nmax_x.astype(np.float32),
        nmax_y.astype(np.float32),
    )


def boxes_intersect(aminx, aminy, amaxx, amaxy, bminx, bminy, bmaxx, bmaxy):
    """Vectorized bbox overlap test (closed boxes, matching the reference's
    disjoint test in src/rtree/trait.rs:143-148)."""
    return ~((bmaxx < aminx) | (bmaxy < aminy) | (bminx > amaxx) | (bminy > amaxy))


def points_in_polygon(px: np.ndarray, py: np.ndarray, poly: np.ndarray) -> np.ndarray:
    """Ray-casting point-in-polygon for one polygon, vectorized over points.

    ``poly`` is an (n, 2) closed-or-open ring.  Points exactly on an edge
    may land on either side (standard even-odd rule); use bbox pre-filters
    so the refinement only sees candidates.
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    poly = np.asarray(poly, dtype=np.float64)
    n = len(poly)
    inside = np.zeros(len(px), dtype=bool)
    x1, y1 = poly[-1]
    for i in range(n):
        x2, y2 = poly[i]
        crosses = ((y1 > py) != (y2 > py))
        if np.any(crosses):
            xint = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
            inside ^= crosses & (px < xint)
        x1, y1 = x2, y2
    return inside


def points_in_boxes(px, py, bminx, bminy, bmaxx, bmaxy):
    """Vectorized elementwise point-in-bbox (closed box)."""
    return (px >= bminx) & (px <= bmaxx) & (py >= bminy) & (py <= bmaxy)


# unit pentagon, counter-clockwise from the top vertex; fixed 3-decimal
# literals so an external SQL oracle reproduces every float exactly
PENTAGON_OFFSETS = (
    (0.0, 1.0),
    (-0.951, 0.309),
    (-0.588, -0.809),
    (0.588, -0.809),
    (0.951, 0.309),
)


def pentagon_vertices(cx, cy, rx, ry):
    """Deterministic convex pentagon per row: center ± radius × the fixed
    unit offsets.  Returns (n, 5, 2) float64 vertices (CCW)."""
    cx = np.asarray(cx, dtype=np.float64)
    cy = np.asarray(cy, dtype=np.float64)
    rx = np.asarray(rx, dtype=np.float64)
    ry = np.asarray(ry, dtype=np.float64)
    out = np.empty((len(cx), 5, 2), dtype=np.float64)
    for j, (ox, oy) in enumerate(PENTAGON_OFFSETS):
        out[:, j, 0] = cx + rx * ox
        out[:, j, 1] = cy + ry * oy
    return out


def points_in_convex_poly_pairwise(px, py, verts):
    """Elementwise exact point-in-convex-polygon (CCW ring, boundary
    counts inside): row i tests (px[i], py[i]) against verts[i].  The
    half-plane formula order is mirrored verbatim by the SQL oracle."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    k = verts.shape[1]
    inside = np.ones(len(px), dtype=bool)
    for j in range(k):
        ax = verts[:, j, 0]
        ay = verts[:, j, 1]
        bx = verts[:, (j + 1) % k, 0]
        by = verts[:, (j + 1) % k, 1]
        inside &= (bx - ax) * (py - ay) - (by - ay) * (px - ax) >= 0.0
    return inside


def point_to_convex_poly_dist2(px, py, verts):
    """Exact squared point-to-convex-polygon distance, 0 inside.

    The engine's geometry-accessor refinement (reference
    GeometryAccessor leaf distance, src/rtree/distance.rs:145-160):
    candidates from the bbox tree refine against the true geometry.
    ``px/py`` are (q,) query points, ``verts`` is (n, k, 2) CCW convex
    rings; returns (n, q).  Formula order is mirrored verbatim by the SQL
    oracle — keep both in lockstep.
    """
    px = np.asarray(px, dtype=np.float64)[None, :]
    py = np.asarray(py, dtype=np.float64)[None, :]
    n, k, _ = verts.shape
    inside = np.ones((n, px.shape[1]), dtype=bool)
    best = np.full((n, px.shape[1]), np.inf)
    for j in range(k):
        ax = verts[:, j, 0][:, None]
        ay = verts[:, j, 1][:, None]
        bx = verts[:, (j + 1) % k, 0][:, None]
        by = verts[:, (j + 1) % k, 1][:, None]
        abx = bx - ax
        aby = by - ay
        apx = px - ax
        apy = py - ay
        inside &= abx * apy - aby * apx >= 0.0
        denom = abx * abx + aby * aby
        with np.errstate(divide="ignore", invalid="ignore"):
            t = (apx * abx + apy * aby) / denom
        t = np.clip(np.where(np.isfinite(t), t, 0.0), 0.0, 1.0)
        dx = px - (ax + t * abx)
        dy = py - (ay + t * aby)
        best = np.minimum(best, dx * dx + dy * dy)
    return np.where(inside, 0.0, best)
