"""Distributed k-nearest-neighbors over a point Dataset.

Strategy (no target shuffle): the query set is small — broadcast it once
into an actor pool.  Each actor builds a packed R-tree over each incoming
batch (the reference's per-partition build, ~µs/row) and answers all
queries locally with the best-first kNN traversal (exact port in
kernels.rtree.neighbors); the union of per-batch top-k is then reduced to
the global top-k with one tiny groupby over (#queries × k × #blocks) rows.

Global correctness: the true top-k of the whole dataset is a subset of the
union of per-batch top-ks.  Ties at the k-th distance are broken by target
id — deterministically, and identically to the SQL oracle's
``ROW_NUMBER() OVER (ORDER BY dist, id)``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..kernels import rtree


class _LocalKnn:
    """Actor: holds the broadcast query matrix; per batch emits local
    top-k candidates per query.

    ``method="brute"`` (default) computes the full (batch × queries)
    distance matrix in one vectorized shot and ``argpartition``s the
    per-query top-k — for the small broadcast query sets this stage is
    built for, that beats any per-query traversal and is exactly correct
    (the global top-k is a subset of the union of per-batch top-ks).
    ``method="tree"`` uses the packed R-tree best-first traversal
    (kernels.rtree.neighbors, the reference algorithm
    src/rtree/trait.rs:198-302) — the scale path when the query count per
    actor is large enough that sub-linear probes win.
    """

    def __init__(self, queries_ref, k: int, id_col: str, x_col: str, y_col: str,
                 metric: str = "squared", method: str = "brute"):
        self.queries_ref = queries_ref
        self.qids = None
        self.qx = None
        self.qy = None
        self.k = k
        self.id_col = id_col
        self.x_col = x_col
        self.y_col = y_col
        self.metric = metric
        self.method = method

    def _load(self):
        import ray

        q = ray.get(self.queries_ref)
        self.qids = q["ids"]
        self.qx = np.ascontiguousarray(q["xy"][:, 0])
        self.qy = np.ascontiguousarray(q["xy"][:, 1])

    def _empty(self) -> pa.Table:
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "target_id": pa.array([], pa.int64()),
                "dist": pa.array([], pa.float64()),
            }
        )

    def _dist_matrix(self, x: np.ndarray, y: np.ndarray) -> np.ndarray:
        """(n_targets, n_queries) distances under the configured metric."""
        if self.metric == "squared":
            dx = x[:, None] - self.qx[None, :]
            dy = y[:, None] - self.qy[None, :]
            return dx * dx + dy * dy
        if self.metric == "haversine":
            from ..kernels.geom import haversine

            return haversine(
                x[:, None], y[:, None], self.qx[None, :], self.qy[None, :]
            )
        raise ValueError(f"unknown metric {self.metric!r}")

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.qx is None:
            self._load()
        ids = batch[self.id_col].to_numpy().astype(np.int64)
        x = batch[self.x_col].to_numpy()
        y = batch[self.y_col].to_numpy()
        if len(ids) == 0:
            return self._empty()
        if self.method == "tree" and self.metric == "squared":
            tree = rtree.build_rtree(x, y, x, y)
            out_q, out_t, out_d = [], [], []
            for qi in range(len(self.qx)):
                nb = rtree.neighbors(
                    tree, self.qx[qi], self.qy[qi], max_results=self.k
                ).astype(np.int64)
                dx = x[nb] - self.qx[qi]
                dy = y[nb] - self.qy[qi]
                out_q.append(np.full(len(nb), self.qids[qi], dtype=np.int64))
                out_t.append(ids[nb])
                out_d.append(dx * dx + dy * dy)
            return pa.table(
                {
                    "query_id": pa.array(np.concatenate(out_q)),
                    "target_id": pa.array(np.concatenate(out_t)),
                    "dist": pa.array(np.concatenate(out_d)),
                }
            )
        d = self._dist_matrix(x, y)
        kk = min(self.k, len(ids))
        # keep every row tied with the k-th distance: argpartition alone
        # keeps an arbitrary subset of ties, which can drop a smaller-id
        # target before the global merge and diverge from the oracle's
        # ORDER BY dist, target_id tie-break.  The (dist <= kth) mask emits
        # a few extra rows only on exact ties; the merge re-sorts and cuts.
        kth = np.partition(d, kk - 1, axis=0)[kk - 1]  # (n_q,)
        ti, qi = np.nonzero(d <= kth[None, :])
        return pa.table(
            {
                "query_id": pa.array(self.qids[qi]),
                "target_id": pa.array(ids[ti]),
                "dist": pa.array(d[ti, qi]),
            }
        )


def knn(
    targets_ds,
    query_xy: np.ndarray,
    k: int,
    id_col: str,
    query_ids: np.ndarray | None = None,
    x_col: str = "x",
    y_col: str = "y",
    concurrency: int | None = None,
    metric: str = "squared",
    method: str = "brute",
):
    """Global top-k nearest targets for each query point.

    ``query_ids`` labels each query row (defaults to 0..n-1).  Returns a
    Dataset with columns (query_id, target_id, rank, dist); rank is 1-based
    by (dist, target_id).
    """
    import ray

    if concurrency is None:
        from ..stages.util import default_concurrency

        concurrency = default_concurrency()
    xy = np.ascontiguousarray(query_xy, dtype=np.float64)
    if query_ids is None:
        query_ids = np.arange(len(xy), dtype=np.int64)
    queries_ref = ray.put({"xy": xy, "ids": np.asarray(query_ids, dtype=np.int64)})

    # task-based broadcast: only the ObjectRef travels with the task;
    # plasma caches the query matrix per node (zero-copy reads after the
    # first fetch), and idle workers are reused — no actor pool to spin up.
    candidates = targets_ds.map_batches(
        _LocalKnn(queries_ref, k, id_col, x_col, y_col, metric, method),
        batch_format="pyarrow",
    )

    from ..stages.util import topk_per_group

    return topk_per_group(
        candidates, "query_id", k, ["dist", "target_id"], [False, False],
        ["query_id", "target_id", "dist"],
    )


class _LocalBoxKnn:
    """Broadcast-probe kNN where targets are BOXES: per-batch exact
    point-to-box squared distance (0 inside — the reference's
    exact-geometry leaf distance, src/rtree/trait.rs:396-500 /
    axis_dist src/rtree/trait.rs:571-579), vectorized over
    (batch × queries); lazy plasma resolution of the query set."""

    def __init__(self, queries_ref, k: int, id_col: str):
        self.queries_ref = queries_ref
        self.qids = None
        self.qx = None
        self.qy = None
        self.k = k
        self.id_col = id_col

    def _load(self):
        import ray

        q = ray.get(self.queries_ref)
        self.qids = q["ids"]
        self.qx = np.ascontiguousarray(q["xy"][:, 0])
        self.qy = np.ascontiguousarray(q["xy"][:, 1])

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.qx is None:
            self._load()
        ids = batch[self.id_col].to_numpy().astype(np.int64)
        if len(ids) == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "target_id": pa.array([], pa.int64()),
                    "dist": pa.array([], pa.float64()),
                }
            )
        mnx = batch["min_x"].to_numpy()[:, None]
        mny = batch["min_y"].to_numpy()[:, None]
        mxx = batch["max_x"].to_numpy()[:, None]
        mxy = batch["max_y"].to_numpy()[:, None]
        qx = self.qx[None, :]
        qy = self.qy[None, :]
        dx = np.maximum(mnx - qx, 0.0) + np.maximum(qx - mxx, 0.0)
        dy = np.maximum(mny - qy, 0.0) + np.maximum(qy - mxy, 0.0)
        d = dx * dx + dy * dy  # (n_boxes, n_q)
        kk = min(self.k, len(ids))
        # include all k-th-distance ties (see _LocalKnn.__call__)
        kth = np.partition(d, kk - 1, axis=0)[kk - 1]
        ti, qi = np.nonzero(d <= kth[None, :])
        return pa.table(
            {
                "query_id": pa.array(self.qids[qi]),
                "target_id": pa.array(ids[ti]),
                "dist": pa.array(d[ti, qi]),
            }
        )


class _LocalPolyKnn:
    """Broadcast-probe kNN where targets are CONVEX POLYGONS carried as
    vertex columns (vx0..vy{k-1}): per batch, a packed R-tree over the
    polygon bboxes yields a cheap lower bound, then candidates refine with
    the exact point-to-polygon distance (kernels.geom — the reference's
    GeometryAccessor leaf refinement, src/rtree/distance.rs:145-160,
    :202-389).  Here the bbox bound prunes nothing at small batch sizes,
    so the whole batch refines vectorized; ties at the k-th distance are
    all kept for the oracle-exact (dist, id) merge."""

    def __init__(self, queries_ref, k: int, id_col: str, n_verts: int):
        self.queries_ref = queries_ref
        self.qids = None
        self.qx = None
        self.qy = None
        self.k = k
        self.id_col = id_col
        self.n_verts = n_verts

    def _load(self):
        import ray

        q = ray.get(self.queries_ref)
        self.qids = q["ids"]
        self.qx = np.ascontiguousarray(q["xy"][:, 0])
        self.qy = np.ascontiguousarray(q["xy"][:, 1])

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..kernels.geom import point_to_convex_poly_dist2

        if self.qx is None:
            self._load()
        ids = batch[self.id_col].to_numpy().astype(np.int64)
        if len(ids) == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "target_id": pa.array([], pa.int64()),
                    "dist": pa.array([], pa.float64()),
                }
            )
        verts = np.empty((len(ids), self.n_verts, 2), dtype=np.float64)
        for j in range(self.n_verts):
            verts[:, j, 0] = batch[f"vx{j}"].to_numpy()
            verts[:, j, 1] = batch[f"vy{j}"].to_numpy()
        d = point_to_convex_poly_dist2(self.qx, self.qy, verts)  # (n, q)
        kk = min(self.k, len(ids))
        kth = np.partition(d, kk - 1, axis=0)[kk - 1]
        ti, qi = np.nonzero(d <= kth[None, :])
        return pa.table(
            {
                "query_id": pa.array(self.qids[qi]),
                "target_id": pa.array(ids[ti]),
                "dist": pa.array(d[ti, qi]),
            }
        )


def knn_to_polygons(targets_ds, query_xy: np.ndarray, k: int, id_col: str,
                    query_ids: np.ndarray | None = None, n_verts: int = 5):
    """Global top-k nearest CONVEX-POLYGON targets per query point by
    exact point-to-geometry distance (0 inside) — the engine's full Q5
    (neighbors_geometry) parity path.  Targets carry vertex columns
    vx0..vy{n_verts-1}.  Returns (query_id, target_id, rank, dist)."""
    import ray

    xy = np.ascontiguousarray(query_xy, dtype=np.float64)
    if query_ids is None:
        query_ids = np.arange(len(xy), dtype=np.int64)
    queries_ref = ray.put({"xy": xy, "ids": np.asarray(query_ids, dtype=np.int64)})
    candidates = targets_ds.map_batches(
        _LocalPolyKnn(queries_ref, k, id_col, n_verts), batch_format="pyarrow"
    )

    from ..stages.util import topk_per_group

    return topk_per_group(
        candidates, "query_id", k, ["dist", "target_id"], [False, False],
        ["query_id", "target_id", "dist"],
    )


class _LocalWkbKnn:
    """Broadcast-probe kNN over a WKB geometry column — the reference's
    decode-on-demand WkbDistanceMetric (src/rtree/distance.rs:202-389)
    as a Ray stage: each batch parses its WKB bytes ONCE into flat
    segment arrays (kernels.wkb.parse, vectorized off the Arrow binary
    buffers) and refines every query with the exact point→geometry
    distance (0 inside polygons).  Convex single-ring polygons produce
    distances bit-identical to the vertex-column path, so the same SQL
    oracle gates both."""

    def __init__(self, queries_ref, k: int, id_col: str, wkb_col: str):
        self.queries_ref = queries_ref
        self.qids = None
        self.qx = None
        self.qy = None
        self.k = k
        self.id_col = id_col
        self.wkb_col = wkb_col

    def _load(self):
        import ray

        q = ray.get(self.queries_ref)
        self.qids = q["ids"]
        self.qx = np.ascontiguousarray(q["xy"][:, 0])
        self.qy = np.ascontiguousarray(q["xy"][:, 1])

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..kernels import wkb

        if self.qx is None:
            self._load()
        ids = batch[self.id_col].to_numpy().astype(np.int64)
        if len(ids) == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "target_id": pa.array([], pa.int64()),
                    "dist": pa.array([], pa.float64()),
                }
            )
        w = wkb.parse(batch[self.wkb_col])
        d = wkb.point_dist2(w, self.qx, self.qy)  # (n, q)
        kk = min(self.k, len(ids))
        kth = np.partition(d, kk - 1, axis=0)[kk - 1]
        ti, qi = np.nonzero(d <= kth[None, :])
        return pa.table(
            {
                "query_id": pa.array(self.qids[qi]),
                "target_id": pa.array(ids[ti]),
                "dist": pa.array(d[ti, qi]),
            }
        )


def knn_to_wkb(targets_ds, query_xy: np.ndarray, k: int, id_col: str,
               wkb_col: str = "wkb", query_ids: np.ndarray | None = None):
    """Global top-k nearest targets per query point where targets carry
    an opaque WKB ``binary`` geometry column (Point / LineString /
    Polygon, holes supported) — full Q5 generic-GeometryAccessor parity.
    Returns (query_id, target_id, rank, dist)."""
    import ray

    xy = np.ascontiguousarray(query_xy, dtype=np.float64)
    if query_ids is None:
        query_ids = np.arange(len(xy), dtype=np.int64)
    queries_ref = ray.put({"xy": xy, "ids": np.asarray(query_ids, dtype=np.int64)})
    candidates = targets_ds.map_batches(
        _LocalWkbKnn(queries_ref, k, id_col, wkb_col), batch_format="pyarrow"
    )

    from ..stages.util import topk_per_group

    return topk_per_group(
        candidates, "query_id", k, ["dist", "target_id"], [False, False],
        ["query_id", "target_id", "dist"],
    )


def knn_to_boxes(targets_ds, query_xy: np.ndarray, k: int, id_col: str,
                 query_ids: np.ndarray | None = None):
    """Global top-k nearest BOX targets per query point, by exact
    point-to-box distance (zero inside the box).  Same union-merge
    correctness argument as ``knn``.  Returns (query_id, target_id, rank)."""
    import ray

    xy = np.ascontiguousarray(query_xy, dtype=np.float64)
    if query_ids is None:
        query_ids = np.arange(len(xy), dtype=np.int64)
    queries_ref = ray.put({"xy": xy, "ids": np.asarray(query_ids, dtype=np.int64)})
    candidates = targets_ds.map_batches(
        _LocalBoxKnn(queries_ref, k, id_col), batch_format="pyarrow"
    )

    from ..stages.util import topk_per_group

    return topk_per_group(
        candidates, "query_id", k, ["dist", "target_id"], [False, False],
        ["query_id", "target_id", "dist"],
    )


def rknn_counts(points_ds, facility_xy: np.ndarray, facility_ids: np.ndarray,
                k: int, out_id_col: str, x_col: str = "x", y_col: str = "y"):
    """Reverse-kNN influence counts: for each facility, how many of the
    streamed points rank it among their k nearest facilities — the
    catchment / influence-set size (reference distance machinery:
    src/rtree/distance.rs; this inverts Q3's direction).

    The FACILITY side is the broadcast side (facility sets — stores,
    cells, depots — are bounded; the point side is the 100 TB side and
    only streams).  Facilities ship once via ``ray.put``; each batch
    computes a (batch × m) squared-distance matrix and takes each row's
    k smallest by (dist, facility_id) via a stable argsort over
    id-ordered columns, so boundary ties resolve EXACTLY like the SQL
    ``ROW_NUMBER() OVER (ORDER BY dist, id)`` twin.  Per-batch bincount
    partials mean the exchange carries at most m rows per block; the
    final reduce is a facility-keyed groupby sum.

    Memory: the distance matrix is 8·batch·m bytes — at m = 10⁵
    facilities use batch_size ≲ 1024 (800 MB); beyond that, swap the
    brute stage for the partitioned-index path.
    """
    import ray

    order = np.argsort(np.asarray(facility_ids, dtype=np.int64), kind="stable")
    fxy = np.ascontiguousarray(np.asarray(facility_xy, np.float64)[order])
    fids = np.asarray(facility_ids, dtype=np.int64)[order]
    fac_ref = ray.put((fxy, fids))
    m = len(fids)
    kk = min(k, m)

    def stage(batch: pa.Table) -> pa.Table:
        fxy_b, fids_b = ray.get(fac_ref)
        x = batch[x_col].to_numpy(zero_copy_only=False)
        y = batch[y_col].to_numpy(zero_copy_only=False)
        dx = x[:, None] - fxy_b[None, :, 0]
        dy = y[:, None] - fxy_b[None, :, 1]
        d = dx * dx + dy * dy
        # columns are pre-sorted by facility id, so a STABLE argsort on
        # dist alone realizes the (dist, id) tie order
        top = np.argsort(d, axis=1, kind="stable")[:, :kk]
        cnt = np.bincount(top.ravel(), minlength=m).astype(np.int64)
        nz = np.nonzero(cnt)[0]
        return pa.table(
            {out_id_col: pa.array(fids_b[nz]), "n": pa.array(cnt[nz])}
        )

    return (
        points_ds.map_batches(stage, batch_format="pyarrow")
        .groupby(out_id_col)
        .sum("n")
        .map_batches(
            lambda t: t.rename_columns([out_id_col, "n_rknn"]),
            batch_format="pyarrow",
        )
    )
