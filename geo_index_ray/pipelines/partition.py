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

    def rank_reducer(g: pd.DataFrame) -> pd.DataFrame:
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
        return pd.DataFrame(
            {
                id_col: ids[order],
                "partition_id": rank // psize,
                x_col: g[x_col].to_numpy()[order],
                y_col: g[y_col].to_numpy()[order],
            }
        )

    return (
        keyed_ds.map_batches(add_rkey, batch_format="pyarrow")
        .groupby("rkey")
        .map_groups(rank_reducer, batch_format="pandas")
    )


def partition_envelopes(part_ds, x_col: str = "x", y_col: str = "y"):
    """Per-partition envelope + count — the ``partition_boxes`` analog
    (python/src/rtree/partitions.rs:108-132).  Partial min/max inside
    ``map_batches``, then one tiny groupby."""

    from ..stages.util import reducer_count

    R = reducer_count()

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "partition_id": batch["partition_id"].to_numpy(),
                "x": batch[x_col].to_numpy(),
                "y": batch[y_col].to_numpy(),
            }
        )
        g = df.groupby("partition_id").agg(
            n_rows=("x", "size"),
            min_x=("x", "min"), max_x=("x", "max"),
            min_y=("y", "min"), max_y=("y", "max"),
        ).reset_index()
        g.insert(0, "rkey", g["partition_id"].to_numpy() % R)
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = part_ds.map_batches(partial, batch_format="pyarrow")

    def merge_many(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("partition_id", sort=False).agg(
            n_rows=("n_rows", "sum"),
            min_x=("min_x", "min"), max_x=("max_x", "max"),
            min_y=("min_y", "min"), max_y=("max_y", "max"),
        ).reset_index()
        out["n_rows"] = out["n_rows"].astype(np.int64)
        return out

    return partials.groupby("rkey").map_groups(merge_many, batch_format="pandas")


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

    def build_group(g: pd.DataFrame) -> pd.DataFrame:
        from ..kernels import rtree

        ids = g[id_col].to_numpy().astype(np.int64)
        x = g[x_col].to_numpy()
        y = g[y_col].to_numpy()
        order = np.argsort(ids, kind="stable")  # canonical insertion order
        ids, x, y = ids[order], x[order], y[order]
        buf = rtree.build_rtree(x, y, x, y)
        return pd.DataFrame(
            {
                "partition_id": [np.int64(g["partition_id"].iloc[0])],
                "num_items": [np.int64(len(ids))],
                "index": [buf.tobytes()],
                "ids": [ids.tobytes()],
                "min_x": [x.min() if len(x) else 0.0],
                "min_y": [y.min() if len(y) else 0.0],
                "max_x": [x.max() if len(x) else 0.0],
                "max_y": [y.max() if len(y) else 0.0],
            }
        )

    return parts.groupby("partition_id").map_groups(build_group, batch_format="pandas")


def _env_dist(qx, qy, mnx, mny, mxx, mxy):
    """Squared point-to-envelope distance, vectorized (queries × parts)."""
    dx = np.maximum(mnx[None, :] - qx[:, None], 0.0) + np.maximum(
        qx[:, None] - mxx[None, :], 0.0
    )
    dy = np.maximum(mny[None, :] - qy[:, None], 0.0) + np.maximum(
        qy[:, None] - mxy[None, :], 0.0
    )
    return dx * dx + dy * dy


class _PartitionKnnProbe:
    """Probe stage: each partition row runs the best-first kNN traversal
    (kernels.rtree.neighbors) for just the queries its envelope can still
    serve, per the broadcast plan.  Lazy plasma resolution."""

    def __init__(self, state_ref, k: int):
        self.state_ref = state_ref
        self.state = None
        self.k = k

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
                    return_stats: bool = False):
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
    env = index_ds.select_columns(
        ["partition_id", "num_items", "min_x", "min_y", "max_x", "max_y"]
    ).to_pandas()
    pid = env["partition_id"].to_numpy().astype(np.int64)
    nitems = env["num_items"].to_numpy().astype(np.int64)
    nonempty = nitems > 0
    d_env = _env_dist(
        xy[:, 0], xy[:, 1],
        env["min_x"].to_numpy(), env["min_y"].to_numpy(),
        env["max_x"].to_numpy(), env["max_y"].to_numpy(),
    )  # (nq, nparts)
    d_env[:, ~nonempty] = np.inf

    def launch(plan: dict[int, list[int]], bounds: np.ndarray):
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
        return index_ds.map_batches(
            _PartitionKnnProbe(state_ref, k), batch_format="pyarrow"
        ).to_pandas()

    # phase A: nearest envelope per query → upper bound on the k-th dist
    near = np.argmin(d_env, axis=1)
    plan_a: dict[int, list[int]] = {}
    for qi in range(nq):
        plan_a.setdefault(int(pid[near[qi]]), []).append(qi)
    res_a = launch(plan_a, np.full(nq, np.inf))

    bounds = np.full(nq, np.inf)
    qid_to_qi = {int(q): i for i, q in enumerate(query_ids)}
    for q, grp in res_a.groupby("query_id"):
        if len(grp) >= k:
            bounds[qid_to_qi[int(q)]] = np.sort(grp["dist"].to_numpy())[k - 1]

    # phase B: every other partition whose envelope can still matter
    plan_b: dict[int, list[int]] = {}
    probed_a = {(int(pid[near[qi]]), qi) for qi in range(nq)}
    cand_q, cand_p = np.nonzero(d_env <= bounds[:, None])
    for qi, pj in zip(cand_q, cand_p):
        if (int(pid[pj]), qi) in probed_a:
            continue
        plan_b.setdefault(int(pid[pj]), []).append(int(qi))
    parts = [res_a]
    n_probes_b = sum(len(v) for v in plan_b.values())
    if plan_b:
        parts.append(launch(plan_b, bounds))
    cands = pd.concat(parts, ignore_index=True)

    def merge_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["dist", "target_id"], kind="mergesort").head(k)
        g = g.assign(rank=np.arange(1, len(g) + 1, dtype=np.int64))
        return g[["query_id", "target_id", "rank", "dist"]]

    out = (
        cands.groupby("query_id", group_keys=False)[cands.columns]
        .apply(merge_topk)
        .reset_index(drop=True)
    )
    if return_stats:
        return out, {
            "partitions_total": int(len(pid)),
            "probes_a": int(nq),
            "probes_b": int(n_probes_b),
        }
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
