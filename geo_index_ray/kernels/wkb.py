"""Vectorized WKB (Well-Known Binary) codec + exact point→geometry
distance — the engine's generic geometry accessor.

Reference scope: geo-index demonstrates a decode-on-demand WKB distance
metric over its kNN machinery (src/rtree/distance.rs:202-389,
``WkbDistanceMetric`` — store WKB bytes, decode per candidate, exact
euclidean distance to the decoded geometry).  This module is the
engine's equivalent for an Arrow ``binary`` geometry column: parse once
per BATCH into flat segment arrays (never per candidate, never per
row-in-Python), then refine kNN candidates with exact distances.

Supported geometries: Point (1), LineString (2), Polygon (3) — both
byte orders, polygons with holes (even-odd containment).  Parsing is
vectorized off the Arrow binary buffers: headers are gathered with
fancy-indexed u32 reads, coordinates with one arange-trick byte gather
per batch; Python touches per-RING-LEVEL state only (loop depth = max
ring count, not geometry count).

Distance parity: the per-segment point distance mirrors
``kernels.geom.point_to_convex_poly_dist2`` operation-for-operation
(t = clamp((ap·ab)/(ab·ab)); d² to the projected point), so a convex
single-ring WKB polygon refines to the SAME float64 distance as the
vertex-column path and the SQL oracle.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

WKB_POINT = 1
WKB_LINESTRING = 2
WKB_POLYGON = 3


# ---------------------------------------------------------------------------
# encoding (little-endian) — for sources, fixtures and tests
# ---------------------------------------------------------------------------

def encode_points(x, y) -> pa.Array:
    """WKB Point column from coordinate arrays (LE, 21 B each)."""
    x = np.ascontiguousarray(x, dtype="<f8")
    y = np.ascontiguousarray(y, dtype="<f8")
    n = len(x)
    buf = np.zeros((n, 21), dtype=np.uint8)
    buf[:, 0] = 1  # little-endian
    buf[:, 1] = WKB_POINT
    buf[:, 5:13] = x.view(np.uint8).reshape(n, 8)
    buf[:, 13:21] = y.view(np.uint8).reshape(n, 8)
    raw = buf.tobytes(order="C")
    return pa.array([raw[i * 21:(i + 1) * 21] for i in range(n)], pa.binary())


def encode_linestrings(coords_list) -> pa.Array:
    """WKB LineString column from a list of (k, 2) float arrays."""
    out = []
    for pts in coords_list:
        pts = np.ascontiguousarray(pts, dtype="<f8")
        head = np.zeros(9, dtype=np.uint8)
        head[0] = 1
        head[1] = WKB_LINESTRING
        head[5:9] = np.array([len(pts)], dtype="<u4").view(np.uint8)
        out.append(head.tobytes() + pts.tobytes(order="C"))
    return pa.array(out, pa.binary())


def encode_polygons(verts: np.ndarray, close: bool = True) -> pa.Array:
    """WKB single-ring Polygon column from (n, k, 2) vertices.

    ``close=True`` appends the first vertex as the closing point (the
    WKB spec requires closed rings).  Fully vectorized: one buffer
    assembly per batch, no per-geometry Python beyond the final split.
    """
    verts = np.ascontiguousarray(verts, dtype="<f8")
    n, k, _ = verts.shape
    npts = k + 1 if close else k
    rec = 1 + 4 + 4 + 4 + npts * 16
    buf = np.zeros((n, rec), dtype=np.uint8)
    buf[:, 0] = 1
    buf[:, 1] = WKB_POLYGON
    buf[:, 5] = 1  # one ring
    buf[:, 9:13] = np.broadcast_to(
        np.array([npts], dtype="<u4").view(np.uint8), (n, 4)
    )
    ring = verts
    if close:
        ring = np.concatenate([verts, verts[:, :1, :]], axis=1)
    buf[:, 13:] = ring.reshape(n, npts * 2).view(np.uint8).reshape(n, npts * 16)
    raw = buf.tobytes(order="C")
    return pa.array([raw[i * rec:(i + 1) * rec] for i in range(n)], pa.binary())


# ---------------------------------------------------------------------------
# decoding
# ---------------------------------------------------------------------------

@dataclass
class WkbSet:
    """Flat decoded form of a WKB column.

    ``kind[g]`` ∈ {1, 2, 3}; points: ``pt_geom``/``pt_xy``;
    segments (linestring edges + polygon ring edges): ``seg_geom`` with
    endpoints ``seg_ax/ay/bx/by``; polygon ring edges additionally carry
    ``seg_ring_closed=True`` rows for containment.  ``n`` geometries.
    """

    n: int
    kind: np.ndarray
    pt_geom: np.ndarray
    pt_x: np.ndarray
    pt_y: np.ndarray
    seg_geom: np.ndarray
    seg_ax: np.ndarray
    seg_ay: np.ndarray
    seg_bx: np.ndarray
    seg_by: np.ndarray
    poly_seg: np.ndarray  # bool per segment: participates in containment


def _gather_u32(data: np.ndarray, off: np.ndarray, le: np.ndarray) -> np.ndarray:
    b = data[off[:, None] + np.arange(4)].astype(np.uint32)
    v_le = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16) | (b[:, 3] << 24)
    v_be = b[:, 3] | (b[:, 2] << 8) | (b[:, 1] << 16) | (b[:, 0] << 24)
    return np.where(le, v_le, v_be).astype(np.int64)


def _gather_f64_runs(data: np.ndarray, starts: np.ndarray, counts: np.ndarray,
                     le_per_run: np.ndarray) -> np.ndarray:
    """Gather ``counts[i]`` consecutive f64 values starting at byte
    ``starts[i]`` for every run — one arange-trick fancy gather."""
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.float64)
    run_id = np.repeat(np.arange(len(starts)), counts)
    cum = np.concatenate([[0], np.cumsum(counts)[:-1]])
    within = np.arange(total) - cum[run_id]
    byte0 = starts[run_id] + 8 * within
    raw = data[byte0[:, None] + np.arange(8)]
    le = le_per_run[run_id]
    if not le.all():
        raw = np.where(le[:, None], raw, raw[:, ::-1])
    return np.ascontiguousarray(raw).view("<f8").ravel()


def parse(col) -> WkbSet:
    """Parse an Arrow binary column of WKB geometries into flat arrays."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        e = np.empty(0, dtype=np.int64)
        f = np.empty(0, dtype=np.float64)
        return WkbSet(0, e, e, f, f, e, f, f, f, f, e.astype(bool))
    if col.null_count:
        raise ValueError("wkb.parse: null geometries are not supported")
    buffers = col.buffers()
    odt = np.int64 if pa.types.is_large_binary(col.type) else np.int32
    # a sliced array's offsets buffer is shared: element i lives at
    # offsets[array.offset + i]
    offs = np.frombuffer(
        buffers[1], dtype=odt, count=col.offset + n + 1
    ).astype(np.int64)[col.offset:]
    data = np.frombuffer(buffers[2], dtype=np.uint8)
    g0 = offs[:-1]

    le = data[g0] == 1
    if not np.all((data[g0] == 0) | (data[g0] == 1)):
        raise ValueError("wkb.parse: invalid byte-order marker")
    kind = _gather_u32(data, g0 + 1, le)
    bad = ~np.isin(kind, (WKB_POINT, WKB_LINESTRING, WKB_POLYGON))
    if bad.any():
        raise ValueError(
            f"wkb.parse: unsupported geometry type {int(kind[bad][0])}"
        )

    # points
    is_pt = kind == WKB_POINT
    pt_geom = np.flatnonzero(is_pt)
    pxy = _gather_f64_runs(
        data, g0[is_pt] + 5, np.full(int(is_pt.sum()), 2, np.int64), le[is_pt]
    ).reshape(-1, 2)

    # linestrings: npts at +5, coords at +9
    seg_parts = []
    is_ls = kind == WKB_LINESTRING
    if is_ls.any():
        ls_idx = np.flatnonzero(is_ls)
        npts = _gather_u32(data, g0[is_ls] + 5, le[is_ls])
        xy = _gather_f64_runs(data, g0[is_ls] + 9, npts * 2, le[is_ls])
        seg_parts.append(_runs_to_segments(ls_idx, npts, xy, closed=False))

    # polygons: nrings at +5, then (npts, coords)* — iterate ring levels;
    # per-level state is vectorized over every polygon still open
    is_pg = kind == WKB_POLYGON
    if is_pg.any():
        pg_idx = np.flatnonzero(is_pg)
        nrings = _gather_u32(data, g0[is_pg] + 5, le[is_pg])
        cursor = g0[is_pg] + 9
        remaining = nrings.copy()
        while (remaining > 0).any():
            act = remaining > 0
            npts = _gather_u32(data, cursor[act], le[is_pg][act])
            xy = _gather_f64_runs(data, cursor[act] + 4, npts * 2, le[is_pg][act])
            seg_parts.append(
                _runs_to_segments(pg_idx[act], npts, xy, closed=True)
            )
            cursor[act] += 4 + npts * 16
            remaining[act] -= 1

    if seg_parts:
        seg_geom = np.concatenate([s[0] for s in seg_parts])
        ax = np.concatenate([s[1] for s in seg_parts])
        ay = np.concatenate([s[2] for s in seg_parts])
        bx = np.concatenate([s[3] for s in seg_parts])
        by = np.concatenate([s[4] for s in seg_parts])
        poly = np.concatenate([s[5] for s in seg_parts])
    else:
        seg_geom = np.empty(0, dtype=np.int64)
        ax = ay = bx = by = np.empty(0, dtype=np.float64)
        poly = np.empty(0, dtype=bool)

    return WkbSet(n, kind, pt_geom, pxy[:, 0] if len(pxy) else np.empty(0),
                  pxy[:, 1] if len(pxy) else np.empty(0),
                  seg_geom, ax, ay, bx, by, poly)


def _runs_to_segments(geom_ids, npts, flat_xy, closed: bool):
    """Consecutive-point segments for each run; ``closed`` marks polygon
    ring edges (the WKB spec already repeats the first point, so the
    closing edge is one of the consecutive pairs)."""
    x = flat_xy[0::2]
    y = flat_xy[1::2]
    cum = np.concatenate([[0], np.cumsum(npts)])
    # segment j of run i: points cum[i]+j .. +j+1, j < npts[i]-1
    nseg = np.maximum(npts - 1, 0)
    total = int(nseg.sum())
    run_id = np.repeat(np.arange(len(npts)), nseg)
    seg_cum = np.concatenate([[0], np.cumsum(nseg)[:-1]])
    within = np.arange(total) - seg_cum[run_id]
    p0 = cum[run_id] + within
    return (
        geom_ids[run_id],
        x[p0], y[p0], x[p0 + 1], y[p0 + 1],
        np.full(total, closed, dtype=bool),
    )


# ---------------------------------------------------------------------------
# exact distances
# ---------------------------------------------------------------------------

def envelopes(w: WkbSet):
    """Per-geometry (min_x, min_y, max_x, max_y) — the index/pruning
    bound for a WKB column."""
    mnx = np.full(w.n, np.inf)
    mny = np.full(w.n, np.inf)
    mxx = np.full(w.n, -np.inf)
    mxy = np.full(w.n, -np.inf)
    for gx, gy in ((w.pt_x, w.pt_y),):
        np.minimum.at(mnx, w.pt_geom, gx)
        np.minimum.at(mny, w.pt_geom, gy)
        np.maximum.at(mxx, w.pt_geom, gx)
        np.maximum.at(mxy, w.pt_geom, gy)
    for gx, gy in ((w.seg_ax, w.seg_ay), (w.seg_bx, w.seg_by)):
        np.minimum.at(mnx, w.seg_geom, gx)
        np.minimum.at(mny, w.seg_geom, gy)
        np.maximum.at(mxx, w.seg_geom, gx)
        np.maximum.at(mxy, w.seg_geom, gy)
    return mnx, mny, mxx, mxy


def point_dist2(w: WkbSet, qx: np.ndarray, qy: np.ndarray) -> np.ndarray:
    """Exact squared euclidean distance from every query point to every
    geometry — (n_geoms, n_queries) float64; 0 inside polygons (even-odd
    over all rings, so holes subtract).  Segment arithmetic mirrors
    kernels.geom.point_to_convex_poly_dist2 so convex single-ring
    polygons are bit-identical to the vertex-column path."""
    qx = np.asarray(qx, dtype=np.float64)
    qy = np.asarray(qy, dtype=np.float64)
    nq = len(qx)
    d2 = np.full((w.n, nq), np.inf)

    if len(w.pt_geom):
        dx = w.pt_x[:, None] - qx[None, :]
        dy = w.pt_y[:, None] - qy[None, :]
        d2[w.pt_geom] = dx * dx + dy * dy

    if len(w.seg_geom):
        abx = w.seg_bx - w.seg_ax
        aby = w.seg_by - w.seg_ay
        denom = abx * abx + aby * aby
        ps = w.poly_seg
        gid_ps = w.seg_geom[ps]
        # loop over QUERIES (the broadcast-bounded side), vectorized over
        # every segment of the batch — the hot axis stays numpy
        for qi in range(nq):
            x, y = qx[qi], qy[qi]
            apx = x - w.seg_ax
            apy = y - w.seg_ay
            with np.errstate(invalid="ignore", divide="ignore"):
                t = np.clip((apx * abx + apy * aby) / denom, 0.0, 1.0)
            t = np.where(denom > 0.0, t, 0.0)  # degenerate zero-length edge
            px = w.seg_ax + t * (w.seg_bx - w.seg_ax)
            py = w.seg_ay + t * (w.seg_by - w.seg_ay)
            sd = (x - px) * (x - px) + (y - py) * (y - py)
            np.minimum.at(d2[:, qi], w.seg_geom, sd)
            if len(gid_ps):
                ay, by_ = w.seg_ay[ps], w.seg_by[ps]
                ax, bx_ = w.seg_ax[ps], w.seg_bx[ps]
                cond = (ay > y) != (by_ > y)
                with np.errstate(invalid="ignore", divide="ignore"):
                    xint = ax + (y - ay) * (bx_ - ax) / (by_ - ay)
                cross = cond & (x < xint)
                flips = np.zeros(w.n, dtype=np.int64)
                np.add.at(flips, gid_ps, cross.astype(np.int64))
                d2[(flips % 2) == 1, qi] = 0.0

    return d2
