"""Global Hilbert spatial partitioning — the engine's analog of the
reference's ``partitions()`` / ``partition_boxes()`` export
(python/src/rtree/partitions.rs:17-132): Hilbert-sort the rows, cut into
fixed-size chunks, and report each chunk's envelope.

The reference does this inside one in-memory tree (leaf membership of a
large-node-size Hilbert build).  Distributed, the same result needs a
*global* Hilbert rank.  Computing it does NOT need a global sort:

1. one ``map_batches`` pass assigns each row its 32-bit Hilbert key over
   fixed world bounds (deterministic — no data-dependent bbox pass);
2. a tiny ``groupby`` histogram over the top 16 bits (≤65k buckets) gives
   exclusive bucket offsets, broadcast to the workers;
3. one ``groupby(bucket).map_groups`` sorts each small bucket locally by
   (hkey, id) and adds its offset — an exact global rank with one narrow
   key shuffle instead of a full ``ds.sort``.

``partition_id = rank // partition_size`` then matches the reference's
``floor(hilbert_rank / node_size)`` rule (python/src/rtree/partitions.rs:71-104).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..kernels import hilbert

WORLD = (-180.0, -90.0, 180.0, 90.0)


def _hilbert_keys(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    mnx, mny, mxx, mxy = WORLD
    hx = np.clip((x - mnx) / (mxx - mnx) * 65535.0, 0, 65535).astype(np.uint32)
    hy = np.clip((y - mny) / (mxy - mny) * 65535.0, 0, 65535).astype(np.uint32)
    return hilbert.hilbert_d(hx, hy)


def spatial_partition(ds, id_col: str, partition_size: int,
                      x_col: str = "x", y_col: str = "y"):
    """Assign each row a Hilbert-order partition id.

    Returns a Dataset ``(id, partition_id, x, y)`` — every input row exactly
    once, partitions of ``partition_size`` rows (last one ragged), ids
    contiguous from 0 in Hilbert order.
    """

    def keyed(batch: pa.Table) -> pa.Table:
        x = batch[x_col].to_numpy()
        y = batch[y_col].to_numpy()
        hk = _hilbert_keys(x, y)
        return pa.table(
            {
                id_col: batch[id_col],
                "hkey": pa.array(hk.astype(np.int64)),
                "bucket": pa.array((hk >> np.uint32(16)).astype(np.int64)),
                x_col: batch[x_col],
                y_col: batch[y_col],
            }
        )

    keyed_ds = ds.map_batches(keyed, batch_format="pyarrow")

    # pass 1: per-bucket counts (combiner inside map_batches, tiny groupby)
    def partial_counts(batch: pa.Table) -> pa.Table:
        uniq, counts = np.unique(batch["bucket"].to_numpy(), return_counts=True)
        return pa.table({"bucket": pa.array(uniq), "n": pa.array(counts.astype(np.int64))})

    hist = (
        keyed_ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("bucket")
        .sum("n")
    )
    offsets = np.zeros(65536 + 1, dtype=np.int64)
    for b in hist.iter_batches(batch_format="pyarrow"):
        offsets[b["bucket"].to_numpy() + 1] = b["sum(n)"].to_numpy()
    offsets = np.cumsum(offsets)

    # pass 2: exact rank within bucket + broadcast offset.  Shuffle on a
    # coarse reducer key over CONTIGUOUS bucket ranges (bucket >> shift) so
    # each reducer ranks ALL its buckets in one vectorized pass — no
    # per-bucket Python.  The offsets array (≤65k int64 = 512 KB) rides in
    # the serialized closure — exported once per worker by Ray's function
    # cache, not per group.
    psize = partition_size
    from ..stages.util import reducer_count

    R = reducer_count()
    shift = max(0, 16 - int(np.ceil(np.log2(max(2, R)))))

    def add_rkey(batch: pa.Table) -> pa.Table:
        b = batch["bucket"].to_numpy()
        return batch.append_column("rkey", pa.array(b >> np.int64(shift)))

    def rank_reducer(g: pa.Table) -> pa.Table:
        bucket = g["bucket"].to_numpy()
        hkey = g["hkey"].to_numpy()
        ids = g[id_col].to_numpy()
        order = np.lexsort((ids, hkey, bucket))
        b_s = bucket[order]
        new_b = np.r_[True, b_s[1:] != b_s[:-1]]
        starts = np.nonzero(new_b)[0]
        # position within bucket, vectorized run-length
        within = np.arange(len(order)) - np.repeat(starts, np.diff(np.r_[starts, len(order)]))
        rank = offsets[b_s] + within
        idx = pa.array(order)
        return pa.table(
            {
                id_col: pa.array(ids[order]),
                "partition_id": pa.array(rank // psize),
                x_col: g[x_col].take(idx),
                y_col: g[y_col].take(idx),
            }
        )

    return (
        keyed_ds.map_batches(add_rkey, batch_format="pyarrow")
        .groupby("rkey")
        .map_groups(rank_reducer, batch_format="pyarrow")
    )


def partition_envelopes(part_ds, x_col: str = "x", y_col: str = "y"):
    """Per-partition envelope + count — the ``partition_boxes`` analog
    (python/src/rtree/partitions.rs:108-132).  Partial min/max inside
    ``map_batches``, then one tiny groupby."""

    from ..stages.util import reducer_count

    R = reducer_count()

    def _envelope_stats(pid, x, y, n_in=None):
        """Vectorized per-partition (n, min/max x/y) — one np.minimum.at
        pass over ALL of a block's partitions (rule 3, no pandas)."""
        up, inv = np.unique(pid, return_inverse=True)
        nk = len(up)
        n = np.zeros(nk, dtype=np.int64)
        np.add.at(n, inv, np.ones(len(pid), np.int64) if n_in is None else n_in)
        mnx = np.full(nk, np.inf)
        mxx = np.full(nk, -np.inf)
        mny = np.full(nk, np.inf)
        mxy = np.full(nk, -np.inf)
        np.minimum.at(mnx, inv, x[0])
        np.maximum.at(mxx, inv, x[1])
        np.minimum.at(mny, inv, y[0])
        np.maximum.at(mxy, inv, y[1])
        return up, n, mnx, mxx, mny, mxy

    def partial(batch: pa.Table) -> pa.Table:
        x = batch[x_col].to_numpy()
        y = batch[y_col].to_numpy()
        up, n, mnx, mxx, mny, mxy = _envelope_stats(
            batch["partition_id"].to_numpy(), (x, x), (y, y)
        )
        return pa.table(
            {
                "rkey": pa.array(up % np.int64(R)),
                "partition_id": pa.array(up),
                "n_rows": pa.array(n),
                "min_x": pa.array(mnx), "max_x": pa.array(mxx),
                "min_y": pa.array(mny), "max_y": pa.array(mxy),
            }
        )

    partials = part_ds.map_batches(partial, batch_format="pyarrow")

    def merge_many(g: pa.Table) -> pa.Table:
        up, n, mnx, mxx, mny, mxy = _envelope_stats(
            g["partition_id"].to_numpy(),
            (g["min_x"].to_numpy(), g["max_x"].to_numpy()),
            (g["min_y"].to_numpy(), g["max_y"].to_numpy()),
            n_in=g["n_rows"].to_numpy(),
        )
        return pa.table(
            {
                "partition_id": pa.array(up),
                "n_rows": pa.array(n),
                "min_x": pa.array(mnx), "max_x": pa.array(mxx),
                "min_y": pa.array(mny), "max_y": pa.array(mxy),
            }
        )

    return partials.groupby("rkey").map_groups(merge_many, batch_format="pyarrow")


def build_partitioned_index(ds, id_col: str, partition_size: int,
                            x_col: str = "x", y_col: str = "y"):
    """Two-level global index: Hilbert-partition the rows, then build one
    packed R-tree per partition (the reference's partitions() + per-leaf
    build, python/src/rtree/partitions.rs:17-132, as a real pipeline).

    Returns a Dataset with one row per partition:
    (partition_id, num_items, index:binary, ids:binary,
     min_x, min_y, max_x, max_y) — the envelope columns ARE the top level
    of the index: probes broadcast-filter on them before touching a tree.
    """
    import hashlib  # noqa: F401  (parity with stages.index_build imports)

    parts = spatial_partition(ds, id_col, partition_size, x_col, y_col)

    def build_group(g: pa.Table) -> pa.Table:
        from ..kernels import rtree

        ids = g[id_col].to_numpy().astype(np.int64)
        x = g[x_col].to_numpy()
        y = g[y_col].to_numpy()
        order = np.argsort(ids, kind="stable")  # canonical insertion order
        ids, x, y = ids[order], x[order], y[order]
        buf = rtree.build_rtree(x, y, x, y)
        return pa.table(
            {
                "partition_id": pa.array(
                    [int(g["partition_id"][0].as_py())], pa.int64()
                ),
                "num_items": pa.array([len(ids)], pa.int64()),
                "index": pa.array([buf.tobytes()], pa.binary()),
                "ids": pa.array([ids.tobytes()], pa.binary()),
                "min_x": pa.array([x.min() if len(x) else 0.0], pa.float64()),
                "min_y": pa.array([y.min() if len(y) else 0.0], pa.float64()),
                "max_x": pa.array([x.max() if len(x) else 0.0], pa.float64()),
                "max_y": pa.array([y.max() if len(y) else 0.0], pa.float64()),
            }
        )

    return parts.groupby("partition_id").map_groups(build_group, batch_format="pyarrow")


def _env_dist(qx, qy, mnx, mny, mxx, mxy):
    """Squared point-to-envelope distance, vectorized (queries × parts)."""
    dx = np.maximum(mnx[None, :] - qx[:, None], 0.0) + np.maximum(
        qx[:, None] - mxx[None, :], 0.0
    )
    dy = np.maximum(mny[None, :] - qy[:, None], 0.0) + np.maximum(
        qy[:, None] - mxy[None, :], 0.0
    )
    return dx * dx + dy * dy


def _env_dist_metric(xy, env, metric: str):
    """(queries × partitions) point-to-envelope distance in the metric's
    own units — the same lower bound the reference's pluggable
    ``distance_to_bbox`` gives its traversal (src/rtree/distance.rs:57-125,
    haversine = great-circle meters to the clamped closest point)."""
    if metric == "squared":
        return _env_dist(
            xy[:, 0], xy[:, 1],
            env["min_x"], env["min_y"], env["max_x"], env["max_y"],
        )
    if metric == "euclidean":
        return np.sqrt(
            _env_dist(
                xy[:, 0], xy[:, 1],
                env["min_x"], env["min_y"], env["max_x"], env["max_y"],
            )
        )
    if metric == "haversine":
        from ..kernels import geom

        # haversine_env_lower, not haversine_to_bbox: the clamped-point
        # distance the reference uses inside trees is an UPPER bound of
        # the spherical min distance, and partition envelopes are large
        # enough for the gap to mis-prune true neighbors (measured: rank
        # flips at nation-query scale).  The cross-track/latitude lower
        # bound is provably ≤ every in-envelope distance.
        return geom.haversine_env_lower(
            xy[:, 0][:, None], xy[:, 1][:, None],
            env["min_x"][None, :], env["min_y"][None, :],
            env["max_x"][None, :], env["max_y"][None, :],
        )
    raise ValueError(f"unknown metric {metric!r}")


class _PartitionKnnProbe:
    """Probe stage: each partition row runs the best-first kNN traversal
    (kernels.rtree.neighbors) for just the queries its envelope can still
    serve, per the broadcast plan.  Lazy plasma resolution."""

    def __init__(self, state_ref, k: int, metric: str = "squared"):
        self.state_ref = state_ref
        self.state = None
        self.k = k
        self.metric = metric

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        from ..kernels import rtree

        if self.state is None:
            self.state = ray.get(self.state_ref)
        plan = self.state["plan"]
        qx, qy = self.state["qx"], self.state["qy"]
        qids = self.state["qids"]
        bounds = self.state["bounds"]
        out_q, out_t, out_d = [], [], []
        pids = batch["partition_id"].to_numpy().astype(np.int64)
        for i in np.nonzero(np.isin(pids, self.state["pids"]))[0]:
            qlist = plan[int(pids[i])]
            buf = np.frombuffer(batch["index"][i].as_py(), dtype=np.uint8)
            ids = np.frombuffer(batch["ids"][i].as_py(), dtype=np.int64)
            for qi in qlist:
                # tie_inclusive: a partition probe must surface EVERY item
                # tied at its k-th distance — the global (dist, target_id)
                # merge breaks ties by id, and a smaller-id tie truncated
                # here (heap order = hilbert position) would be lost
                nb, dd = rtree.neighbors(
                    buf,
                    float(qx[qi]),
                    float(qy[qi]),
                    max_results=self.k,
                    max_distance=float(bounds[qi]),
                    metric=self.metric,
                    return_distances=True,
                    tie_inclusive=True,
                )
                if len(nb):
                    out_q.append(np.full(len(nb), qids[qi], dtype=np.int64))
                    out_t.append(ids[nb.astype(np.int64)])
                    out_d.append(dd)
        if not out_q:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "target_id": pa.array([], pa.int64()),
                    "dist": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "target_id": pa.array(np.concatenate(out_t)),
                "dist": pa.array(np.concatenate(out_d)),
            }
        )


def knn_partitioned(index_ds, query_xy: np.ndarray, k: int,
                    query_ids: np.ndarray | None = None,
                    return_stats: bool = False,
                    metric: str = "squared"):
    """Sub-linear global kNN through the two-level index (ring expansion).

    The partition-envelope table IS the top level of the global index
    (reference sub-linear traversal src/rtree/trait.rs:198-302, lifted one
    level up): the driver plans on envelopes only —

    1. phase A probes, per query, the single nearest-envelope partition's
       packed tree for a k-th-distance upper bound;
    2. phase B probes only partitions whose envelope distance can still
       beat that bound (ties inclusive, so the (dist, id) tie-break stays
       oracle-exact); everything farther is never deserialized.

    Partitions touched ≈ the few envelopes intersecting each query's kNN
    ring — independent of total data size.  Returns
    (query_id, target_id, rank, dist); with ``return_stats`` also a dict
    with partitions_total / probes_a / probes_b.
    """
    import ray

    import pandas as pd

    xy = np.ascontiguousarray(query_xy, dtype=np.float64)
    nq = len(xy)
    if query_ids is None:
        query_ids = np.arange(nq, dtype=np.int64)
    query_ids = np.asarray(query_ids, dtype=np.int64)

    index_ds = index_ds.materialize()
    env_cols = {
        c: []
        for c in ("partition_id", "num_items", "min_x", "min_y", "max_x", "max_y")
    }
    for b in index_ds.select_columns(list(env_cols)).iter_batches(
        batch_format="pyarrow"
    ):
        for c in env_cols:
            env_cols[c].append(b[c].to_numpy(zero_copy_only=False))
    env = {c: np.concatenate(v) for c, v in env_cols.items()}
    pid = env["partition_id"].astype(np.int64)
    nonempty = env["num_items"].astype(np.int64) > 0
    d_env = _env_dist_metric(xy, env, metric)  # (nq, nparts), metric units
    d_env[:, ~nonempty] = np.inf

    def group_plan(part_col: np.ndarray, q_idx: np.ndarray):
        """(probe part-column-index, probe query-index) arrays → plan dict
        {partition_id: query-index array} via ONE argsort — O(P) Python,
        never O(probes)."""
        order = np.argsort(part_col, kind="stable")
        p_s, q_s = part_col[order], q_idx[order]
        starts = np.r_[0, 1 + np.nonzero(p_s[1:] != p_s[:-1])[0]]
        ends = np.r_[starts[1:], len(q_s)]
        return {
            int(pid[p_s[s]]): q_s[s:e] for s, e in zip(starts, ends)
        }

    def launch(plan: dict[int, np.ndarray], bounds: np.ndarray):
        """Run one probe phase; stream results back as flat numpy arrays
        (bounded: ≤ (k + ties) rows per probe)."""
        state_ref = ray.put(
            {
                "plan": plan,
                "pids": np.array(sorted(plan), dtype=np.int64),
                "qx": xy[:, 0],
                "qy": xy[:, 1],
                "qids": query_ids,
                "bounds": bounds,
            }
        )
        qs, ts, dd = [], [], []
        for b in index_ds.map_batches(
            _PartitionKnnProbe(state_ref, k, metric), batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow"):
            if b.num_rows:
                qs.append(b["query_id"].to_numpy())
                ts.append(b["target_id"].to_numpy())
                dd.append(b["dist"].to_numpy())
        if not qs:
            e = np.empty(0, np.int64)
            return e, e, np.empty(0, np.float64)
        return np.concatenate(qs), np.concatenate(ts), np.concatenate(dd)

    # map arbitrary query ids back to dense query indices
    qid_order = np.argsort(query_ids, kind="stable")
    qid_sorted = query_ids[qid_order]

    def to_qi(qv: np.ndarray) -> np.ndarray:
        return qid_order[np.searchsorted(qid_sorted, qv)]

    # phase A: nearest envelope per query → upper bound on the k-th dist
    near = np.argmin(d_env, axis=1)
    plan_a = group_plan(near, np.arange(nq, dtype=np.int64))
    qa, ta, da = launch(plan_a, np.full(nq, np.inf))

    bounds = np.full(nq, np.inf)
    if len(qa):
        qa_i = to_qi(qa)
        order = np.lexsort((da, qa_i))
        qs_s, da_s = qa_i[order], da[order]
        starts = np.r_[0, 1 + np.nonzero(qs_s[1:] != qs_s[:-1])[0]]
        counts = np.diff(np.r_[starts, len(qs_s)])
        has_k = counts >= k
        bounds[qs_s[starts[has_k]]] = da_s[starts[has_k] + k - 1]

    # phase B: every other partition whose envelope can still matter
    cand = d_env <= bounds[:, None]
    cand[np.arange(nq), near] = False  # already probed in phase A
    cand_q, cand_p = np.nonzero(cand)
    n_probes_b = len(cand_q)
    if n_probes_b:
        qb, tb, db = launch(group_plan(cand_p, cand_q), bounds)
        qv = np.concatenate([qa, qb])
        tv = np.concatenate([ta, tb])
        dv = np.concatenate([da, db])
    else:
        qv, tv, dv = qa, ta, da

    # global (dist, target_id) top-k merge — one lexsort, no per-group code
    order = np.lexsort((tv, dv, qv))
    qv, tv, dv = qv[order], tv[order], dv[order]
    starts = np.r_[0, 1 + np.nonzero(qv[1:] != qv[:-1])[0]]
    counts = np.diff(np.r_[starts, len(qv)])
    rank = np.arange(len(qv)) - np.repeat(starts, counts) + 1
    keep = rank <= k
    out = pd.DataFrame(
        {
            "query_id": qv[keep],
            "target_id": tv[keep],
            "rank": rank[keep].astype(np.int64),
            "dist": dv[keep],
        }
    )
    if return_stats:
        return out, {
            "partitions_total": int(len(pid)),
            "probes_a": int(nq),
            "probes_b": int(n_probes_b),
        }
    return out


class _PartitionRadiusProbe:
    """Probe stage for ``radius_partitioned``: each surviving partition
    answers ALL of its planned queries with one batched frontier search
    (kernels.rtree.search_batch), then refines candidates by exact metric
    distance.  Target coordinates are recovered from the tree's own leaf
    boxes (zero extra storage — a point's leaf box IS its coordinates)."""

    def __init__(self, state_ref, radius: float, metric: str):
        self.state_ref = state_ref
        self.state = None
        self.radius = radius
        self.metric = metric

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        from ..kernels import geom, rtree

        if self.state is None:
            self.state = ray.get(self.state_ref)
        plan = self.state["plan"]
        qx, qy, qids = self.state["qx"], self.state["qy"], self.state["qids"]
        r = self.radius
        out_q, out_t = [], []
        pids = batch["partition_id"].to_numpy().astype(np.int64)
        for i in np.nonzero(np.isin(pids, self.state["pids"]))[0]:
            qlist = plan[int(pids[i])]
            buf = np.frombuffer(batch["index"][i].as_py(), dtype=np.uint8)
            ids = np.frombuffer(batch["ids"][i].as_py(), dtype=np.int64)
            meta, boxes, indices = rtree._attach(buf)
            n_items = meta.num_items
            if n_items == 0 or len(qlist) == 0:
                continue
            # leaf box (x, y, x, y) at slot s belongs to insertion index
            # indices[s] — invert to coordinates-by-insertion-index
            ins = indices[:n_items].astype(np.int64)
            tx = np.empty(n_items, dtype=np.float64)
            ty = np.empty(n_items, dtype=np.float64)
            tx[ins] = boxes[0 : 4 * n_items : 4]
            ty[ins] = boxes[1 : 4 * n_items : 4]
            sx, sy = qx[qlist], qy[qlist]
            if self.metric == "haversine":
                # exact spherical-cap bounding box: Δφ = δ; Δλ =
                # arcsin(sin δ / cos φ) (the cap's widest longitude is NOT
                # at the query's latitude); a cap reaching a pole spans
                # every longitude; windows crossing ±180 split into two
                # disjoint boxes.  The exact haversine refine below keeps
                # the window conservative-only.
                delta = r / geom.EARTH_RADIUS
                dlat = np.degrees(delta)
                by0 = np.maximum(sy - dlat, -90.0)
                by1 = np.minimum(sy + dlat, 90.0)
                full = np.radians(np.abs(sy)) + delta >= np.pi / 2 - 1e-12
                with np.errstate(invalid="ignore", divide="ignore"):
                    dl = np.degrees(
                        np.arcsin(
                            np.clip(
                                np.sin(delta) / np.cos(np.radians(sy)), -1.0, 1.0
                            )
                        )
                    )
                bx0 = np.where(full, -180.0, sx - dl)
                bx1 = np.where(full, 180.0, sx + dl)
                src = [np.arange(len(sx))]
                B0 = [np.maximum(bx0, -180.0)]
                B1 = [np.minimum(bx1, 180.0)]
                Y0, Y1 = [by0], [by1]
                lo_wrap = (bx0 < -180.0) & ~full
                if lo_wrap.any():
                    w = np.nonzero(lo_wrap)[0]
                    src.append(w)
                    B0.append(bx0[w] + 360.0)
                    B1.append(np.full(len(w), 180.0))
                    Y0.append(by0[w])
                    Y1.append(by1[w])
                hi_wrap = (bx1 > 180.0) & ~full
                if hi_wrap.any():
                    w = np.nonzero(hi_wrap)[0]
                    src.append(w)
                    B0.append(np.full(len(w), -180.0))
                    B1.append(bx1[w] - 360.0)
                    Y0.append(by0[w])
                    Y1.append(by1[w])
                src = np.concatenate(src)
                bx0, bx1 = np.concatenate(B0), np.concatenate(B1)
                by0, by1 = np.concatenate(Y0), np.concatenate(Y1)
            else:  # euclidean
                bx0, bx1 = sx - r, sx + r
                by0, by1 = sy - r, sy + r
                src = np.arange(len(sx))
            rq, hits = rtree.search_batch(buf, bx0, by0, bx1, by1)
            if not len(hits):
                continue
            rq = src[rq]  # window → original query index within qlist
            hi = hits.astype(np.int64)
            hqx, hqy = sx[rq], sy[rq]
            if self.metric == "haversine":
                d = geom.haversine(hqx, hqy, tx[hi], ty[hi])
            else:
                d = np.sqrt(geom.sq_dist(hqx, hqy, tx[hi], ty[hi]))
            keep = d <= r
            kq = np.asarray(qlist)[rq[keep]]
            kt = ids[hi[keep]]
            # split wrap windows are disjoint, but dedup (query, target)
            # defensively — a duplicated pair would break exact-set oracles
            if len(kq):
                u = np.unique(np.stack([kq, kt], axis=1), axis=0)
                out_q.append(qids[u[:, 0]])
                out_t.append(u[:, 1])
        if not out_q:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "target_id": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "target_id": pa.array(np.concatenate(out_t)),
            }
        )


def radius_partitioned(index_ds, query_xy: np.ndarray, radius: float,
                       query_ids: np.ndarray | None = None,
                       metric: str = "euclidean",
                       return_stats: bool = False):
    """Within-radius search through the two-level index: partitions whose
    ENVELOPE distance exceeds the radius are never deserialized (the
    partition-envelope table is the global index's top level — the
    ``within``-style radius analog of ``pruned_box_search``, with the
    reference's metric pluggability, src/rtree/distance.rs:57-125, lifted
    to the partition level).  ``metric`` is "euclidean" (degrees) or
    "haversine" (great-circle meters).  Returns a Dataset
    (query_id, target_id); with ``return_stats``, also
    {partitions_total, probes}.
    """
    import ray

    if metric not in ("euclidean", "haversine"):
        raise ValueError(
            f"radius_partitioned: metric must be euclidean/haversine, got {metric!r}"
        )
    xy = np.ascontiguousarray(query_xy, dtype=np.float64)
    nq = len(xy)
    if query_ids is None:
        query_ids = np.arange(nq, dtype=np.int64)
    query_ids = np.asarray(query_ids, dtype=np.int64)

    index_ds = index_ds.materialize()
    env_cols = {
        c: []
        for c in ("partition_id", "num_items", "min_x", "min_y", "max_x", "max_y")
    }
    for b in index_ds.select_columns(list(env_cols)).iter_batches(
        batch_format="pyarrow"
    ):
        for c in env_cols:
            env_cols[c].append(b[c].to_numpy(zero_copy_only=False))
    env = {c: np.concatenate(v) for c, v in env_cols.items()}
    pid = env["partition_id"].astype(np.int64)
    nonempty = env["num_items"].astype(np.int64) > 0
    d_env = _env_dist_metric(xy, env, metric)
    d_env[:, ~nonempty] = np.inf

    cand_q, cand_p = np.nonzero(d_env <= radius)
    n_probes = len(cand_q)
    order = np.argsort(cand_p, kind="stable")
    p_s, q_s = cand_p[order], cand_q[order]
    starts = np.r_[0, 1 + np.nonzero(p_s[1:] != p_s[:-1])[0]] if len(p_s) else np.empty(0, np.int64)
    ends = np.r_[starts[1:], len(q_s)] if len(p_s) else np.empty(0, np.int64)
    plan = {int(pid[p_s[s]]): q_s[s:e] for s, e in zip(starts, ends)}

    state_ref = ray.put(
        {
            "plan": plan,
            "pids": np.array(sorted(plan), dtype=np.int64),
            "qx": xy[:, 0],
            "qy": xy[:, 1],
            "qids": query_ids,
        }
    )
    out = index_ds.map_batches(
        _PartitionRadiusProbe(state_ref, float(radius), metric),
        batch_format="pyarrow",
    )
    if return_stats:
        return out, {"partitions_total": int(len(pid)), "probes": n_probes}
    return out


def pruned_box_search(index_ds, min_x: float, min_y: float,
                      max_x: float, max_y: float, id_col: str = "id"):
    """Probe a partitioned index: partitions whose ENVELOPE misses the
    query box are skipped without deserializing their tree (the
    partition-envelope table is the global index's top level).  Returns a
    Dataset of matching item ids."""

    def probe(batch: pa.Table) -> pa.Table:
        from ..kernels import rtree

        out = []
        env_hit = (
            (batch["min_x"].to_numpy() <= max_x)
            & (batch["max_x"].to_numpy() >= min_x)
            & (batch["min_y"].to_numpy() <= max_y)
            & (batch["max_y"].to_numpy() >= min_y)
        )
        for i in np.nonzero(env_hit)[0]:
            buf = np.frombuffer(batch["index"][i].as_py(), dtype=np.uint8)
            ids = np.frombuffer(batch["ids"][i].as_py(), dtype=np.int64)
            hits = rtree.search(buf, min_x, min_y, max_x, max_y).astype(np.int64)
            if len(hits):
                out.append(ids[hits])
        if not out:
            return pa.table({id_col: pa.array([], pa.int64())})
        return pa.table({id_col: pa.array(np.concatenate(out))})

    return index_ds.map_batches(probe, batch_format="pyarrow")


def nn_self_join(points_ds, id_col: str, partition_size: int = 256,
                 chunk_rows: int = 65536, metric: str = "squared"):
    """kNN SELF-join: each point's nearest OTHER point — the
    spatial-analytics workhorse behind Clark–Evans nearest-neighbour
    statistics and spatial outlier screens.  Returns a pandas frame
    (query_id, nn_id), ties broken by (distance, id) exactly as the SQL
    ``ROW_NUMBER() OVER (ORDER BY dist, id)`` oracle.

    Shape: ONE two-level partitioned index build; the query side then
    streams through the driver in bounded chunks of ``chunk_rows``
    (id + 2×float64 per row — the driver holds one chunk's plan, never
    the corpus) and each chunk runs the distributed envelope
    ring-expansion planner (``knn_partitioned``, k=2 with inclusive
    ties: rank 1 is the point itself, so the nearest-other choice is
    exact even through duplicate coordinates).  Probes touch only the
    few partitions inside each query's kNN ring.  At 10⁹-point scale
    callers should persist each chunk's result instead of concatenating
    (the per-chunk loop is the resume point); the concatenated frame
    here serves the oracle-gated query surface.
    """
    import pandas as pd

    # Materialize: the per-chunk loop below would otherwise re-execute the
    # lazy build plan (spatial_partition + per-partition tree builds) once
    # per chunk — knn_partitioned only materializes a local rebinding.
    idx = build_partitioned_index(points_ds, id_col, partition_size).materialize()
    outs = []
    for b in points_ds.select_columns([id_col, "x", "y"]).iter_batches(
        batch_size=chunk_rows, batch_format="pyarrow"
    ):
        ids = b[id_col].to_numpy().astype(np.int64)
        if not len(ids):
            continue
        xy = np.stack(
            [
                b["x"].to_numpy(zero_copy_only=False),
                b["y"].to_numpy(zero_copy_only=False),
            ],
            axis=1,
        )
        res = knn_partitioned(idx, xy, 2, query_ids=ids, metric=metric)
        r = res[res["target_id"] != res["query_id"]]
        r = r.sort_values(["query_id", "dist", "target_id"], kind="stable")
        r = r.drop_duplicates("query_id", keep="first")
        outs.append(
            r[["query_id", "target_id"]].rename(columns={"target_id": "nn_id"})
        )
    if not outs:
        return pd.DataFrame({"query_id": pd.Series([], dtype=np.int64),
                             "nn_id": pd.Series([], dtype=np.int64)})
    return pd.concat(outs, ignore_index=True)
