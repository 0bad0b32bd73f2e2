"""Distributed spatial joins — the engine's core wide operation.

Two physical strategies over the same logical join (box-intersection /
point-in-box candidates from packed R-trees, then exact refinement —
mirroring the reference's candidates-then-refine contract,
python/.../rtree.pyi:52-61 and tree_join python/src/rtree/intersection.rs):

- ``shuffle_spatial_join``: two-sided groupby-on-cell shuffle.  Boxes are
  replicated to every cell they overlap (halo replication via
  ``cells.polyfill_boxes``); per-cell an R-tree is built over the build side
  and probed with the probe side; duplicate pairs from replication are
  eliminated *locally* with the PBSM reference-point rule (emit a pair only
  in the cell that contains the min corner of the two boxes' intersection)
  — no global dedup shuffle.  Scales: the only all-to-all is the one
  cell-keyed exchange; skew is handled by splitting hot cells to finer
  resolution before the shuffle (``skew_split_threshold``).

- ``broadcast_spatial_join``: when one side fits in memory, build its
  R-tree once on the driver, ``ray.put`` the buffer, and probe it from an
  actor pool (tree deserialized zero-copy once per actor in ``__init__``,
  never per batch).  No shuffle at all.

Both sides must carry: an int64 id column and ``min_x/min_y/max_x/max_y``
(points: min == max).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..kernels import cells as cellmod
from ..kernels import rtree

_EMPTY_PAIRS = pa.table(
    {"left_id": pa.array([], pa.int64()), "right_id": pa.array([], pa.int64())}
)


_M_PER_DEG = np.pi * 6378137.0 / 180.0  # meters per degree (WGS84 equatorial)


def _tag_cells(ds, side: int, id_col: str, res: int, replicate: bool,
               pad: float = 0.0, pad_unit: str = "deg"):
    """Project to the lean join schema and assign shuffle cells.

    Only (cell, side, rid, 4 box coords) ever enters the shuffle — payload
    columns are re-attached downstream by id if needed.  ``pad_unit="m"``
    interprets ``pad`` as great-circle meters: the latitude pad is
    constant, the longitude pad widens per row by 1/cos(|lat|+lat_pad)
    (a safe overestimate of the worst case within the halo).
    """

    def fn(batch: pa.Table) -> pa.Table:
        rid = batch[id_col].to_numpy().astype(np.int64)
        mnx = batch["min_x"].to_numpy()
        mny = batch["min_y"].to_numpy()
        mxx = batch["max_x"].to_numpy()
        mxy = batch["max_y"].to_numpy()
        if replicate:
            if pad_unit == "m" and pad > 0.0:
                pad_y = pad / _M_PER_DEG
                wl_raw = np.maximum(np.abs(mny), np.abs(mxy)) + pad_y
                wl = np.clip(wl_raw, 0.0, 89.0)
                pad_x = pad_y / np.cos(np.radians(wl))
                # a circle whose halo reaches the pole (|lat|+pad ≥ 90-ε)
                # spans ALL longitudes of its latitude band — no finite
                # longitude pad is safe there, so replicate those rows to
                # the full band instead of clamping at 89°
                pad_x = np.where(wl_raw >= 89.0, 360.0, pad_x)
            else:
                pad_x = pad
                pad_y = pad
            rows, cc = cellmod.polyfill_boxes(
                mnx - pad_x, mny - pad_y, mxx + pad_x, mxy + pad_y, res
            )
            if pad_unit == "m" and pad > 0.0:
                # great-circle distance wraps the antimeridian; replicate
                # halo-crossing boxes onto the far side (original coords
                # are carried — haversine refinement is lon-periodic)
                extra_rows, extra_cc = [rows], [cc]
                for sel, shift in (
                    (mnx - pad_x < -180.0, 360.0),
                    (mxx + pad_x > 180.0, -360.0),
                ):
                    if sel.any():
                        w = np.nonzero(sel)[0]
                        r2, c2 = cellmod.polyfill_boxes(
                            mnx[w] - pad_x[w] + shift,
                            mny[w] - pad_y,
                            mxx[w] + pad_x[w] + shift,
                            mxy[w] + pad_y,
                            res,
                        )
                        extra_rows.append(w[r2])
                        extra_cc.append(c2)
                rows = np.concatenate(extra_rows)
                cc = np.concatenate(extra_cc)
                # very wide pads (high latitudes) can polyfill the same
                # cell from both the base box and a wrapped replica —
                # dedup (row, cell) so no right row enters a cell twice
                both = np.unique(np.stack([rows, cc.astype(np.int64)]), axis=1)
                rows, cc = both[0], both[1].astype(cc.dtype)
        else:
            cc = cellmod.lonlat_to_cell(mnx, mny, res)
            rows = np.arange(len(rid), dtype=np.int64)
        return pa.table(
            {
                "cell": pa.array(cc),
                "side": pa.array(np.full(len(rows), side, dtype=np.int8)),
                "rid": pa.array(rid[rows]),
                "min_x": pa.array(mnx[rows]),
                "min_y": pa.array(mny[rows]),
                "max_x": pa.array(mxx[rows]),
                "max_y": pa.array(mxy[rows]),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def _refine_pairs(how, li, ri, lx0, ly0, lx1, ly1, rx0, ry0, rx1, ry1, radius):
    """Exact-predicate refinement on candidate pairs (vectorized)."""
    if how in ("intersects", "pip"):
        return li, ri  # closed-bbox overlap is already the exact predicate
    if how == "dwithin":
        # both sides are points (left: min==max; right boxes were buffered)
        dx = lx0[li] - (rx0[ri] + rx1[ri]) / 2.0
        dy = ly0[li] - (ry0[ri] + ry1[ri]) / 2.0
        keep = dx * dx + dy * dy <= radius * radius
        return li[keep], ri[keep]
    if how == "dwithin_haversine":
        from ..kernels.geom import haversine

        d = haversine(
            lx0[li], ly0[li], (rx0[ri] + rx1[ri]) / 2.0, (ry0[ri] + ry1[ri]) / 2.0
        )
        keep = d <= radius
        return li[keep], ri[keep]
    raise ValueError(f"unknown predicate {how!r}")


def shuffle_spatial_join(
    left_ds,
    right_ds,
    res: int = 6,
    how: str = "intersects",
    left_id: str = "left_id",
    right_id: str = "right_id",
    radius: float = 0.0,
    left_are_points: bool | None = None,
    skew_split_threshold: int | None = None,
    refine_fn=None,
):
    """Two-sided cell-shuffle spatial join.

    left = probe side; right = build side (always replicated to every
    overlapped cell, padded by ``radius`` for dwithin).  When the left side
    is points (``pip`` / ``dwithin``, or ``left_are_points=True``) it lands
    in exactly one cell — the PBSM reference point of any pair it forms IS
    the point, so no left replication is needed.  Box-box joins replicate
    both sides (the intersection min corner can fall outside the left box's
    min-corner cell).  Returns a Dataset of ``(left_id, right_id)`` pairs.

    ``skew_split_threshold``: if set, a cheap pre-count of left rows per
    cell raises the shuffle resolution until the hottest cell is bounded,
    before the shuffle.

    ``refine_fn(left_ids, right_ids, lx, ly) -> bool mask``: optional
    exact-geometry refinement applied to the bbox candidate pairs inside
    each join reducer — the engine's GeometryAccessor analog (reference
    src/rtree/distance.rs:145-160: candidates from the box tree, exact
    predicate against the true geometry).  Geometry is recomputed or
    fetched from the ids, so nothing extra rides the shuffle.
    """
    if left_are_points is None:
        left_are_points = how in ("pip", "dwithin", "dwithin_haversine")
    eff_res = res
    if skew_split_threshold is not None:
        eff_res = _pick_split_res(left_ds, res, skew_split_threshold)

    from ..stages.util import coalesce_for_shuffle

    # narrow (56 B/row) shuffle payload: coalesce each side so the cell
    # groupby sees few, chunky blocks (sort shuffle cost ~ blocks^2)
    tagged_left = coalesce_for_shuffle(
        _tag_cells(left_ds, 0, left_id, eff_res, replicate=not left_are_points), 0.5
    )
    tagged_right = coalesce_for_shuffle(
        _tag_cells(
            right_ds, 1, right_id, eff_res, replicate=True, pad=radius,
            pad_unit="m" if how == "dwithin_haversine" else "deg",
        ),
        0.5,
    )
    unioned = tagged_left.union(tagged_right)

    how_ = how
    radius_ = radius
    res_ = eff_res

    def join_group(group: pa.Table) -> pa.Table:
        side = group["side"].to_numpy()
        lmask = side == 0
        rmask = ~lmask
        if not lmask.any() or not rmask.any():
            return _EMPTY_PAIRS
        rid_all = group["rid"].to_numpy()
        mnx = group["min_x"].to_numpy()
        mny = group["min_y"].to_numpy()
        mxx = group["max_x"].to_numpy()
        mxy = group["max_y"].to_numpy()

        lx0, ly0, lx1, ly1 = mnx[lmask], mny[lmask], mxx[lmask], mxy[lmask]
        rx0, ry0, rx1, ry1 = mnx[rmask], mny[rmask], mxx[rmask], mxy[rmask]
        lrid = rid_all[lmask]
        rrid = rid_all[rmask]

        if how_ == "dwithin":
            pad_x = np.full(len(rx0), radius_)
            pad_y = pad_x
        elif how_ == "dwithin_haversine":
            py = radius_ / _M_PER_DEG
            wl = np.clip(np.maximum(np.abs(ry0), np.abs(ry1)) + py, 0.0, 89.0)
            pad_x = py / np.cos(np.radians(wl))
            pad_y = np.full(len(rx0), py)
        else:
            pad_x = np.zeros(len(rx0))
            pad_y = pad_x
        tree = rtree.build_rtree(rx0 - pad_x, ry0 - pad_y, rx1 + pad_x, ry1 + pad_y)
        li, ri = rtree.search_batch(tree, lx0, ly0, lx1, ly1)
        li = li.astype(np.int64)
        ri = ri.astype(np.int64)
        if how_ == "dwithin_haversine":
            # lon-periodic probe: a left point near one antimeridian side
            # must also hit right boxes padded around the other side
            cand = [np.stack([li, ri])]
            for shift in (360.0, -360.0):
                l2, r2 = rtree.search_batch(tree, lx0 + shift, ly0, lx1 + shift, ly1)
                if len(l2):
                    cand.append(np.stack([l2.astype(np.int64), r2.astype(np.int64)]))
            both = np.concatenate(cand, axis=1)
            both = np.unique(both, axis=1)
            li, ri = both[0], both[1]

        # PBSM reference-point dedup: the intersection's min corner decides
        # the owning cell, so replicated pairs are emitted exactly once.
        if how_ in ("dwithin", "dwithin_haversine"):
            # left point is always inside the padded right box → the point
            # itself is the reference point
            ref_x, ref_y = lx0[li], ly0[li]
        else:
            ref_x = np.maximum(lx0[li], rx0[ri])
            ref_y = np.maximum(ly0[li], ry0[ri])
        owner = cellmod.lonlat_to_cell(ref_x, ref_y, res_)
        keep = owner == int(group["cell"][0].as_py())
        li, ri = li[keep], ri[keep]

        li, ri = _refine_pairs(
            how_, li, ri, lx0, ly0, lx1, ly1, rx0, ry0, rx1, ry1, radius_
        )
        if refine_fn is not None and len(li):
            keep = refine_fn(lrid[li], rrid[ri], lx0[li], ly0[li])
            li, ri = li[keep], ri[keep]
        return pa.table({"left_id": pa.array(lrid[li]), "right_id": pa.array(rrid[ri])})

    pairs = unioned.groupby("cell").map_groups(join_group, batch_format="pyarrow")
    if left_id != "left_id" or right_id != "right_id":
        pairs = pairs.map_batches(
            lambda b: b.rename_columns([left_id, right_id]), batch_format="pyarrow"
        )
    return pairs


def _pick_split_res(left_ds, res: int, threshold: int) -> int:
    """Pre-aggregate left per-cell counts (combiner inside map_batches, tiny
    groupby after) and raise the resolution until the hottest cell is under
    ``threshold``.  One cheap pass; returns the chosen uniform resolution.

    (A per-cell adaptive split would shave more; a uniform raise keeps the
    oracle/dedup rule trivially consistent and is already enough to bound
    the max group size, since splitting res by +1 quarters a uniform cell.)
    """

    def partial_counts(batch: pa.Table) -> pa.Table:
        cc = cellmod.lonlat_to_cell(
            batch["min_x"].to_numpy(), batch["min_y"].to_numpy(), res
        )
        uniq, counts = np.unique(cc, return_counts=True)
        return pa.table({"cell": pa.array(uniq), "n": pa.array(counts)})

    hist = (
        left_ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("cell")
        .sum("n")
    )
    max_n = 0
    for b in hist.iter_batches(batch_format="pyarrow"):
        col = b["sum(n)"].to_numpy()
        if len(col):
            max_n = max(max_n, int(col.max()))
    eff = res
    while max_n > threshold and eff < cellmod.MAX_RES:
        eff += 1
        max_n //= 4  # uniform split bound
    return eff


class _BroadcastProbe:
    """Broadcast probe stage: R-tree buffer resolved from the object store
    lazily inside the task (plasma-local zero-copy view), probed per batch."""

    def __init__(self, tree_ref, right_ids_ref, id_col: str):
        self.tree_ref = tree_ref
        self.right_ids_ref = right_ids_ref
        self.tree = None
        self.right_ids = None
        self.id_col = id_col

    def _load(self):
        import ray

        self.tree = ray.get(self.tree_ref)
        self.right_ids = ray.get(self.right_ids_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.tree is None:
            self._load()
        lid = batch[self.id_col].to_numpy().astype(np.int64)
        li, ri = rtree.search_batch(
            self.tree,
            batch["min_x"].to_numpy(),
            batch["min_y"].to_numpy(),
            batch["max_x"].to_numpy(),
            batch["max_y"].to_numpy(),
        )
        return pa.table(
            {
                "left_id": pa.array(lid[li.astype(np.int64)]),
                "right_id": pa.array(self.right_ids[ri.astype(np.int64)]),
            }
        )


def broadcast_spatial_join(
    left_ds,
    right_table: pa.Table,
    left_id: str = "left_id",
    right_id: str = "right_id",
    concurrency: int | None = None,
):
    """Broadcast join (bbox-intersects): small right side → one R-tree in
    the object store, probed by an actor pool.  ``right_table`` must carry
    ``right_id`` + box columns."""
    import ray

    rid = right_table[right_id].to_numpy().astype(np.int64)
    tree = rtree.build_rtree(
        right_table["min_x"].to_numpy(),
        right_table["min_y"].to_numpy(),
        right_table["max_x"].to_numpy(),
        right_table["max_y"].to_numpy(),
    )
    tree_ref = ray.put(tree)
    ids_ref = ray.put(rid)
    pairs = left_ds.map_batches(
        _BroadcastProbe(tree_ref, ids_ref, left_id), batch_format="pyarrow"
    )
    if left_id != "left_id" or right_id != "right_id":
        pairs = pairs.map_batches(
            lambda b: b.rename_columns([left_id, right_id]), batch_format="pyarrow"
        )
    return pairs


class _BroadcastTreeJoin:
    """Broadcast dual-tree join: the broadcast side's packed R-tree is
    resolved lazily from plasma inside the task; each batch builds its own
    tree and runs the tree×tree synchronized descent (kernels.rtree.tree_join
    — the reference's intersection_candidates_with_other_tree,
    src/rtree/traversal.rs:262-370)."""

    def __init__(self, tree_ref, right_ids_ref, id_col: str):
        self.tree_ref = tree_ref
        self.right_ids_ref = right_ids_ref
        self.rtree_buf = None
        self.right_ids = None
        self.id_col = id_col

    def _load(self):
        import ray

        self.rtree_buf = ray.get(self.tree_ref)
        self.right_ids = ray.get(self.right_ids_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.rtree_buf is None:
            self._load()
        lid = batch[self.id_col].to_numpy().astype(np.int64)
        if len(lid) == 0:
            return _EMPTY_PAIRS
        ltree = rtree.build_rtree(
            batch["min_x"].to_numpy(),
            batch["min_y"].to_numpy(),
            batch["max_x"].to_numpy(),
            batch["max_y"].to_numpy(),
        )
        li, ri = rtree.tree_join(ltree, self.rtree_buf)
        return pa.table(
            {
                "left_id": pa.array(lid[li.astype(np.int64)]),
                "right_id": pa.array(self.right_ids[ri.astype(np.int64)]),
            }
        )


def broadcast_tree_join(
    left_ds,
    right_table: pa.Table,
    left_id: str = "left_id",
    right_id: str = "right_id",
    concurrency: int | None = None,
):
    """Tree×tree candidate join with a broadcast right side: per-batch left
    trees against one shared right tree, via the dual-tree descent."""
    import ray

    rid = right_table[right_id].to_numpy().astype(np.int64)
    tree = rtree.build_rtree(
        right_table["min_x"].to_numpy(),
        right_table["min_y"].to_numpy(),
        right_table["max_x"].to_numpy(),
        right_table["max_y"].to_numpy(),
    )
    tree_ref = ray.put(tree)
    ids_ref = ray.put(rid)
    pairs = left_ds.map_batches(
        _BroadcastTreeJoin(tree_ref, ids_ref, left_id), batch_format="pyarrow"
    )
    if left_id != "left_id" or right_id != "right_id":
        pairs = pairs.map_batches(
            lambda b: b.rename_columns([left_id, right_id]), batch_format="pyarrow"
        )
    return pairs
