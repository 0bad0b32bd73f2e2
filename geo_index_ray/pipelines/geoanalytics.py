"""Cell-grid spatial analytics: hierarchical rollup, hotspot scoring,
density clustering, and neighborhood smoothing.

These compose the engine's tiling layer (kernels/cells.py — the H3/S2
analog of the reference's Hilbert leaf partitioning,
python/src/rtree/partitions.rs) with its aggregate and join stages into
the standard raster-analytics verbs.  Everything here operates on the
CELL HISTOGRAM — a table bounded by occupied-cell count, not row count —
so the corpus is read once through a per-batch combiner and every later
stage is cell-sized.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import tiling


def _rename(ds, names):
    return ds.map_batches(
        lambda b, _n=list(names): b.rename_columns(_n), batch_format="pyarrow"
    )


def cell_rollup(ds, res: int, parent_res: int, x_col: str = "x", y_col: str = "y"):
    """Hierarchical cell rollup: per-cell counts at ``parent_res`` computed
    from the fine-``res`` histogram — the H3 "compact/uncompact" parent
    aggregation.

    Scale shape: the corpus is combined to per-block fine-cell partials
    inside ``map_batches`` (tiling.cell_histogram's combiner); the parent
    id is pure bit arithmetic on the CHILD id, so the rollup re-aggregates
    the cell-bounded histogram without ever re-reading the points.  The
    equirectangular grids nest exactly (floor((u·2^r)/2^(r-p)) ==
    floor(u·2^p) for u ∈ [0,1)), so rolling up fine counts is
    byte-identical to tiling directly at ``parent_res``.
    """
    if parent_res > res:
        raise ValueError(f"parent_res {parent_res} must be <= res {res}")
    n_child = np.int64(1 << res)
    n_parent = np.int64(1 << parent_res)
    dr = np.int64(res - parent_res)

    hist = tiling.cell_histogram(ds, res, x_col=x_col, y_col=y_col)

    def to_parent(batch: pa.Table) -> pa.Table:
        f = batch["cell"].to_numpy()
        pix = (f // n_child) >> dr
        piy = (f % n_child) >> dr
        return pa.table(
            {"cell": pa.array(pix * n_parent + piy), "n": batch["n_rows"]}
        )

    rolled = hist.map_batches(to_parent, batch_format="pyarrow")
    return _rename(rolled.groupby("cell").sum("n"), ["cell", "n_rows"])


def cell_hotspots(ds, res: int, x_col: str = "x", y_col: str = "y"):
    """Per-cell hotspot z-score: how many standard deviations a cell's
    count sits above the mean count over all OCCUPIED cells (the simple
    Getis-style screen for crawl-density anomalies).

    Returns (cell, n_rows, z) with
    ``z = (n·N − S) / sqrt(N·Q − S²)`` where N = occupied-cell count,
    S = Σn, Q = Σn² — algebraically (n − mean)/std(population) with every
    inner term integer-exact, so the single float divide is deterministic
    and hash-reproducible against the SQL twin.  NULL z when the counts
    are constant (zero variance).

    Scale shape: one corpus pass (combiner histogram); the histogram is
    materialized (cell-bounded) because it has two consumers — the
    3-scalar moment reduce and the z map.  The driver holds exactly three
    python ints; N·Q and S² are computed in arbitrary-precision python
    (S can pass 2^31.5 at 10^12 rows, overflowing an int64 square), and
    per-cell ``n·N`` stays in int64 — exact while n·N < 2^63, i.e. any
    realistic row count × occupied-cell product split across resolutions.
    """
    hist = tiling.cell_histogram(ds, res, x_col=x_col, y_col=y_col).materialize()

    def moments(batch: pa.Table) -> pa.Table:
        n = batch["n_rows"].to_numpy()
        # q rides as a decimal string: a single 10^12-point cell squares
        # past int64, and the partial is one row per block either way
        return pa.table(
            {
                "cnt": pa.array([len(n)], pa.int64()),
                "s": pa.array([int(n.sum())], pa.int64()),
                "q": pa.array([str(sum(int(v) ** 2 for v in n))], pa.string()),
            }
        )

    parts = hist.map_batches(moments, batch_format="pyarrow").take_all()
    N = sum(int(r["cnt"]) for r in parts)
    S = sum(int(r["s"]) for r in parts)
    Q = sum(int(r["q"]) for r in parts)
    var_num = N * Q - S * S  # python ints: exact at any scale
    den = float(var_num) ** 0.5 if var_num > 0 else None

    def zmap(batch: pa.Table) -> pa.Table:
        n = batch["n_rows"].to_numpy()
        if den is None:
            z = pa.nulls(len(n), pa.float64())
        else:
            z = pa.array((n * np.int64(N) - np.int64(S)).astype(np.float64) / den)
        return pa.table({"cell": batch["cell"], "n_rows": batch["n_rows"], "z": z})

    return hist.map_batches(zmap, batch_format="pyarrow")


def grid_cluster(ds, res: int, min_pts: int, x_col: str = "x", y_col: str = "y",
                 return_cells: bool = False):
    """DBSCAN-style density clustering on the cell grid: cells holding at
    least ``min_pts`` points are "core"; clusters are 8-connected
    components of core cells, labelled by their minimum flat cell id.

    Returns one row per cluster: (cluster, n_cells, n_points) — or, with
    ``return_cells``, the per-cell labelling (cell, n_rows, cluster)
    before aggregation (feeds :func:`cluster_envelopes`).

    Scale shape: one corpus pass builds the (cell-bounded, materialized —
    it feeds both the adjacency exchange and the final join) core-cell
    histogram.  Adjacency costs ONE exchange of 24 B rows: every core
    cell posts an "exists" row under its own id and probe rows under its
    four HIGHER-id neighbors (+1, +n−1, +n, +n+1 — each undirected edge
    is generated exactly once), hashed under coarse reducer keys; a
    vectorized searchsorted per reducer emits the edges (rule 3 — no
    per-cell interpreter work).  Components run in O(log n) groupby
    rounds (pipelines/components.py); isolated core cells become
    singleton clusters through the left join's null-fill.
    """
    from ..pipelines import components as comp_pipe
    from ..pipelines import relational
    from ..stages.util import coalesce_for_shuffle, reducer_count

    R = reducer_count()
    n = np.int64(1 << res)

    hist = tiling.cell_histogram(ds, res, x_col=x_col, y_col=y_col)
    core = hist.map_batches(
        lambda b: b.filter(pa.compute.greater_equal(b["n_rows"], min_pts)),
        batch_format="pyarrow",
    ).materialize()

    def half_edges(batch: pa.Table) -> pa.Table:
        f = batch["cell"].to_numpy()
        ix, iy = f // n, f % n
        keys = [f]
        srcs = [f]
        tags = [np.zeros(len(f), np.int8)]
        # the four neighbors with strictly larger flat id; iy wraps are
        # excluded by the bounds check (the grid does not wrap)
        for dx, dy in ((0, 1), (1, -1), (1, 0), (1, 1)):
            nx, ny = ix + dx, iy + dy
            ok = (nx < n) & (ny >= 0) & (ny < n)
            keys.append(nx[ok] * n + ny[ok])
            srcs.append(f[ok])
            tags.append(np.ones(int(ok.sum()), np.int8))
        key = np.concatenate(keys)
        with np.errstate(over="ignore"):
            h = key.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        return pa.table(
            {
                "rkey": pa.array(((h >> np.uint64(17)) % np.uint64(R)).view(np.int64)),
                "key": pa.array(key),
                "src": pa.array(np.concatenate(srcs)),
                "tag": pa.array(np.concatenate(tags)),
            }
        )

    halves = coalesce_for_shuffle(
        core.map_batches(half_edges, batch_format="pyarrow"), 0.25
    )

    _empty_edges = pa.table(
        {"a_id": pa.array([], pa.int64()), "b_id": pa.array([], pa.int64())}
    )

    def edges_in_reducer(g: pa.Table) -> pa.Table:
        key = g["key"].to_numpy()
        tag = g["tag"].to_numpy()
        exists = np.sort(key[tag == 0])
        pk, ps = key[tag == 1], g["src"].to_numpy()[tag == 1]
        if not len(exists) or not len(pk):
            return _empty_edges
        pos = np.searchsorted(exists, pk)
        hit = (pos < len(exists)) & (exists[np.minimum(pos, len(exists) - 1)] == pk)
        return pa.table({"a_id": pa.array(ps[hit]), "b_id": pa.array(pk[hit])})

    edges = halves.groupby("rkey").map_groups(edges_in_reducer, batch_format="pyarrow")
    comp = comp_pipe.connected_components(edges)

    joined = relational.hash_join(
        core, comp, "cell", "node", ["cell", "n_rows"], ["component"], how="left"
    )

    def to_partials(batch: pa.Table) -> pa.Table:
        cluster = pa.compute.coalesce(
            pa.compute.cast(batch["component"], pa.int64()), batch["cell"]
        )
        return pa.table(
            {
                "cluster": cluster,
                "n_cells": pa.array(np.ones(batch.num_rows, np.int64)),
                "n_points": batch["n_rows"],
            }
        )

    from ..pipelines.components import _with_schema

    if return_cells:
        def label_cells(batch: pa.Table) -> pa.Table:
            cluster = pa.compute.coalesce(
                pa.compute.cast(batch["component"], pa.int64()),
                batch["cell"],
            )
            return pa.table(
                {
                    "cell": batch["cell"],
                    "n_rows": batch["n_rows"],
                    "cluster": cluster,
                }
            )

        return _with_schema(
            joined.map_batches(label_cells, batch_format="pyarrow"),
            {"cell": pa.int64(), "n_rows": pa.int64(), "cluster": pa.int64()},
        )

    agg = (
        joined.map_batches(to_partials, batch_format="pyarrow")
        .groupby("cluster")
        .sum(["n_cells", "n_points"])
    )
    # zero core cells -> empty groupby loses its schema; union a typed
    # zero-row block so (cluster, n_cells, n_points) survives
    return _with_schema(
        _rename(agg, ["cluster", "n_cells", "n_points"]),
        {"cluster": pa.int64(), "n_cells": pa.int64(), "n_points": pa.int64()},
    )


def cluster_envelopes(ds, res: int, min_pts: int,
                      x_col: str = "x", y_col: str = "y"):
    """Dissolve the grid clusters into per-cluster envelopes: for every
    DBSCAN-style cluster (see :func:`grid_cluster`), the bounding cell
    rectangle [min_ix, max_ix] × [min_iy, max_iy] in exact integer cell
    coordinates plus cell/point counts — the cluster → region polygon
    step of a density-map product.

    Scale shape: the per-cell labelled output of ``grid_cluster`` (cell-
    bounded) feeds per-batch integer min/max/sum combiners and ONE
    cluster-keyed native groupby — the corpus is read once by the
    histogram and never reshuffled here.
    """
    from ray.data.aggregate import Max, Min, Sum

    cells = grid_cluster(
        ds, res, min_pts, x_col=x_col, y_col=y_col, return_cells=True
    )
    n = np.int64(1 << res)

    def coords(batch: pa.Table) -> pa.Table:
        f = batch["cell"].to_numpy()
        return pa.table(
            {
                "cluster": batch["cluster"],
                "ix": pa.array(f // n),
                "iy": pa.array(f % n),
                "n_cells": pa.array(np.ones(len(f), np.int64)),
                "n_points": batch["n_rows"],
            }
        )

    agg = (
        cells.map_batches(coords, batch_format="pyarrow")
        .groupby("cluster")
        .aggregate(
            Sum("n_cells"), Sum("n_points"),
            Min("ix"), Max("ix"), Min("iy"), Max("iy"),
        )
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cluster": b["cluster"],
                "n_cells": b["sum(n_cells)"],
                "n_points": b["sum(n_points)"],
                "min_ix": b["min(ix)"],
                "max_ix": b["max(ix)"],
                "min_iy": b["min(iy)"],
                "max_iy": b["max(iy)"],
            }
        )

    from ..pipelines.components import _with_schema

    return _with_schema(
        agg.map_batches(finish, batch_format="pyarrow"),
        {
            "cluster": pa.int64(), "n_cells": pa.int64(),
            "n_points": pa.int64(), "min_ix": pa.int64(),
            "max_ix": pa.int64(), "min_iy": pa.int64(), "max_iy": pa.int64(),
        },
    )


def idw_fill(ds, res: int, x_col: str = "x", y_col: str = "y"):
    """IDW raster gap-fill: estimate the point density at every EMPTY cell
    that touches at least one occupied cell, as the inverse-distance-
    squared weighted mean of the 8-neighborhood's counts (the classic
    raster void-fill / nodata interpolation step before map algebra).

    On the cell-center grid the squared distance is h² for orthogonal
    neighbors and 2h² for diagonals, so 1/d² weights scale to the exact
    integers w ∈ {2, 1} (the common 1/(2h²) factor cancels in the ratio).
    ``est = Σ(w·n) / Σw`` therefore has integer-exact numerator and
    denominator and ONE IEEE float divide — hash-reproducible against the
    SQL twin (the cell_hotspots / spatial_lag convention).

    Returns (cell, n_neigh, est) for empty cells only; ``n_neigh`` is the
    number of occupied neighbors contributing.

    Scale shape: one corpus pass builds the cell-bounded histogram
    (per-batch combiner, tiling.cell_histogram); the interpolation costs
    ONE exchange of ≤ 9 rows × 26 B per occupied cell (8 neighbor
    contributions + 1 occupancy marker), hashed under coarse reducer keys
    so each reducer resolves all of its target cells in one vectorized
    searchsorted + reduceat pass — no per-cell interpreter work (rule 3),
    nothing corpus-sized moves.
    """
    from ..stages.util import coalesce_for_shuffle, reducer_count

    R = reducer_count()
    n = np.int64(1 << res)

    hist = tiling.cell_histogram(ds, res, x_col=x_col, y_col=y_col)

    def contributions(batch: pa.Table) -> pa.Table:
        f = batch["cell"].to_numpy()
        v = batch["n_rows"].to_numpy()
        ix, iy = f // n, f % n
        keys = [f]
        ws = [np.zeros(len(f), np.int64)]  # w=0 marks "this cell is occupied"
        wvs = [np.zeros(len(f), np.int64)]
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    continue
                w = 2 if dx * dx + dy * dy == 1 else 1
                nx, ny = ix + dx, iy + dy
                ok = (nx >= 0) & (nx < n) & (ny >= 0) & (ny < n)
                keys.append(nx[ok] * n + ny[ok])
                ws.append(np.full(int(ok.sum()), w, np.int64))
                wvs.append(w * v[ok])
        key = np.concatenate(keys)
        with np.errstate(over="ignore"):
            h = key.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        return pa.table(
            {
                "rkey": pa.array(((h >> np.uint64(17)) % np.uint64(R)).view(np.int64)),
                "key": pa.array(key),
                "w": pa.array(np.concatenate(ws)),
                "wv": pa.array(np.concatenate(wvs)),
            }
        )

    parts = coalesce_for_shuffle(
        hist.map_batches(contributions, batch_format="pyarrow"), 0.25
    )

    _empty = pa.table(
        {
            "cell": pa.array([], pa.int64()),
            "n_neigh": pa.array([], pa.int64()),
            "est": pa.array([], pa.float64()),
        }
    )

    def fill_in_reducer(g: pa.Table) -> pa.Table:
        key = g["key"].to_numpy()
        w = g["w"].to_numpy()
        occupied = np.sort(key[w == 0])
        ck, cw, cwv = key[w > 0], w[w > 0], g["wv"].to_numpy()[w > 0]
        if len(occupied):
            pos = np.searchsorted(occupied, ck)
            hit = (pos < len(occupied)) & (
                occupied[np.minimum(pos, len(occupied) - 1)] == ck
            )
            ck, cw, cwv = ck[~hit], cw[~hit], cwv[~hit]
        if not len(ck):
            return _empty
        order = np.argsort(ck, kind="stable")
        ck, cw, cwv = ck[order], cw[order], cwv[order]
        starts = np.flatnonzero(np.r_[True, ck[1:] != ck[:-1]])
        sw = np.add.reduceat(cw, starts)
        swv = np.add.reduceat(cwv, starts)
        n_neigh = np.diff(np.r_[starts, len(ck)])
        return pa.table(
            {
                "cell": pa.array(ck[starts]),
                "n_neigh": pa.array(n_neigh.astype(np.int64)),
                "est": pa.array(swv.astype(np.float64) / sw.astype(np.float64)),
            }
        )

    return parts.groupby("rkey").map_groups(fill_in_reducer, batch_format="pyarrow")


def spatial_lag(pairs_ds, value_ds, left_id: str, right_id: str,
                cents_col: str = "cents"):
    """Neighborhood smoothing (spatial lag): for every left entity with at
    least one right neighbor (``pairs_ds`` — the output of a radius join),
    the neighbor count and the mean of an exact-integer value column.

    ``value_ds`` carries (right_id, cents_col) with the value pre-scaled
    to int64 (e.g. currency cents), so the distributed SUM is exact and
    the returned ``avg = float(sum) / (100 · count)`` is a single
    deterministic float op — hash-reproducible against SQL.

    Scale shape: pairs × values is one hash equi-join (lean slot-column
    exchange, pipelines/relational.py); the per-left aggregation shuffles
    (left_id, cents) partials only.
    """
    from ..pipelines import relational

    joined = relational.hash_join(
        pairs_ds, value_ds, right_id, right_id, [left_id], [cents_col], how="inner"
    )

    def partials(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                left_id: batch[left_id],
                "n_close": pa.array(np.ones(batch.num_rows, np.int64)),
                "cents": batch[cents_col],
            }
        )

    agg = _rename(
        joined.map_batches(partials, batch_format="pyarrow")
        .groupby(left_id)
        .sum(["n_close", "cents"]),
        [left_id, "n_close", "cents"],
    )

    def finish(batch: pa.Table) -> pa.Table:
        cents = batch["cents"].to_numpy()
        cnt = batch["n_close"].to_numpy()
        avg = cents.astype(np.float64) / (100.0 * cnt)
        return pa.table(
            {
                left_id: batch[left_id],
                "n_close": batch["n_close"],
                "avg_bal": pa.array(avg),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


# -- per-group farthest pair (diameter) via distributed hull pruning ----------


def _monotone_chain(x: np.ndarray, y: np.ndarray):
    """Convex hull (Andrew's monotone chain) over integer coords, indices
    into the input; input must be lexsorted by (x, y).  Collinear points
    are dropped (<= 0 cross test).  Cross products are exact int64 for
    |coord| < ~2^30 (milli-degree grid: < 2^19)."""
    n = len(x)
    if n <= 2:
        return np.arange(n)

    def half(idx_iter):
        st = []
        for i in idx_iter:
            while len(st) >= 2:
                a, b = st[-2], st[-1]
                if (x[b] - x[a]) * (y[i] - y[a]) - (y[b] - y[a]) * (
                    x[i] - x[a]
                ) <= 0:
                    st.pop()
                else:
                    break
            st.append(i)
        return st

    lower = half(range(n))
    upper = half(range(n - 1, -1, -1))
    return np.array(lower[:-1] + upper[:-1], dtype=np.int64)


def group_diameter(ds, key_col: str, x_col: str = "mx", y_col: str = "my"):
    """Per-key farthest-pair SQUARED distance over integer coords — the
    set diameter (spread of a nation's customers, a cluster's extent).
    Exact int64, oracle = brute MAX over the per-key self-join.

    Distributed shape (the hull-union identity: hull(A ∪ B) =
    hull(hull(A) ∪ hull(B)), and the diameter is attained at hull
    vertices):

      1. per-batch VECTORIZED pruning — only per-(key, x) min-y and
         max-y points can be hull vertices, so one Arrow group_by per
         block cuts candidates to ≤ 2·distinct-x per key;
      2. one native groupby-(key, x) min/max merge of the partials
         (candidate rows are x-DOMAIN-bounded, never corpus-bounded);
      3. per-key monotone chain + vectorized all-pairs max over the
         hull's vertices (hulls of scattered points are tiny; the
         sequential chain runs over pruned candidates only — the single
         per-key loop this operator is allowed, documented).

    Output (key, diam_sq) for every key with ≥ 1 point (singletons → 0,
    matching the a=b self-join floor).
    """
    from ..stages.util import coalesce_for_shuffle, reducer_count, rkey_of

    R = reducer_count()

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                key_col: batch[key_col],
                "x": batch[x_col],
                "ylo": batch[y_col],
                "yhi": batch[y_col],
            }
        )
        agg = t.group_by([key_col, "x"]).aggregate(
            [("ylo", "min"), ("yhi", "max")]
        )
        return agg.rename_columns([key_col, "x", "ylo", "yhi"])

    parts = coalesce_for_shuffle(
        ds.map_batches(partial, batch_format="pyarrow"), 0.25
    )
    merged = (
        parts.groupby([key_col, "x"])
        .aggregate(*_minmax_aggs())
        .map_batches(
            lambda t: t.rename_columns([key_col, "x", "ylo", "yhi"]),
            batch_format="pyarrow",
        )
    )

    def add_rkey(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "rkey", pa.array(rkey_of(batch[key_col], R))
        )

    keyed = merged.map_batches(add_rkey, batch_format="pyarrow")

    def finish(g: pa.Table) -> pa.Table:
        k = g[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        x = g["x"].to_numpy(zero_copy_only=False).astype(np.int64)
        ylo = g["ylo"].to_numpy(zero_copy_only=False).astype(np.int64)
        yhi = g["yhi"].to_numpy(zero_copy_only=False).astype(np.int64)
        # expand to candidate points (min-y and max-y per (key, x));
        # duplicates where ylo == yhi are harmless to the chain
        kk = np.concatenate([k, k])
        xx = np.concatenate([x, x])
        yy = np.concatenate([ylo, yhi])
        order = np.lexsort((yy, xx, kk))
        kk, xx, yy = kk[order], xx[order], yy[order]
        starts = np.nonzero(np.r_[True, kk[1:] != kk[:-1]])[0]
        ends = np.r_[starts[1:], len(kk)]
        out_k = kk[starts]
        out_d = np.zeros(len(starts), dtype=np.int64)
        for i, (s, e) in enumerate(zip(starts, ends)):
            hx, hy = xx[s:e], yy[s:e]
            h = _monotone_chain(hx, hy)
            dx = hx[h][:, None] - hx[h][None, :]
            dy = hy[h][:, None] - hy[h][None, :]
            out_d[i] = (dx * dx + dy * dy).max()
        return pa.table(
            {key_col: pa.array(out_k), "diam_sq": pa.array(out_d)}
        )

    return keyed.groupby("rkey").map_groups(finish, batch_format="pyarrow")


def _minmax_aggs():
    from ray.data.aggregate import Max, Min

    return (Min("ylo"), Max("yhi"))
