"""Packed static R-tree ("flatbush" ABI) — pure numpy, zero-copy.

From-scratch reimplementation of the index semantics of geo-index's RTree
(reference layout: src/rtree/index.rs:26-146, builder src/rtree/builder.rs:
36-238, search src/rtree/trait.rs:113-165, kNN src/rtree/trait.rs:198-302,
tree×tree join src/rtree/traversal.rs:262-370, partition export
python/src/rtree/partitions.rs:17-132).  The buffer produced here is
ABI-compatible with flatbush-JS / geo-index:

- header: ``[0xfb, (3<<4) | type_index, node_size:u16, num_items:u32]``
- boxes: ``num_nodes * 4`` coords, all levels bottom-up (leaves first)
- indices: ``num_nodes`` ints, u16 if num_nodes < 16384 else u32; leaf slots
  hold insertion indexes, internal slots hold the coord-pos of the node's
  first child.

Everything is vectorized (argsort / reshape / reduceat); queries accept
*batches* and return (query_id, item_id) pair arrays so a whole Arrow batch
of queries is answered per call.  ``method="hilbert_parity"`` /
``"str_parity"`` use the exact partial-quicksort port for byte-for-byte
parity with the reference (validated against its flatbush-JS fixture).
"""

from __future__ import annotations

import heapq

import numpy as np

from .hilbert import (
    hilbert_sort_permutation,
    hilbert_values_for_boxes,
    partial_quicksort,
)

MAGIC = 0xFB
VERSION = 3
DEFAULT_NODE_SIZE = 16

# flatbush-JS array-type order (reference src/type.rs:15-85): the full
# integer set the reference core supports plus f32/f64 (the reference's
# Python bindings expose only f32/f64, python/src/coord_type.rs:6-9 —
# the integer nibbles here give core parity).
_TYPE_INDEX = {
    "int8": 0,
    "uint8": 1,
    "int16": 3,
    "uint16": 4,
    "int32": 5,
    "uint32": 6,
    "float32": 7,
    "float64": 8,
}
_DTYPE_FOR_TYPE_INDEX = {v: np.dtype(k) for k, v in _TYPE_INDEX.items()}


class RTreeMetadata:
    """Layout math for a flatbush buffer. Parity: src/rtree/index.rs:26-146."""

    __slots__ = (
        "num_items",
        "node_size",
        "dtype",
        "num_nodes",
        "level_bounds",
        "nodes_byte_length",
        "indices_byte_length",
        "indices_dtype",
    )

    def __init__(self, num_items: int, node_size: int = DEFAULT_NODE_SIZE, dtype=np.float64):
        if not (2 <= node_size <= 65535):
            raise ValueError("node_size must be in [2, 65535]")
        dtype = np.dtype(dtype)
        if dtype.name not in _TYPE_INDEX:
            raise ValueError(f"unsupported coord dtype {dtype}")
        self.num_items = int(num_items)
        self.node_size = int(node_size)
        self.dtype = dtype

        # compute_num_nodes: repeated ceil(n / node_size)
        # (reference src/rtree/util.rs:7-21)
        n = self.num_items
        num_nodes = n
        level_bounds = [n * 4]
        while n > 1:
            n = int(np.ceil(n / self.node_size))
            num_nodes += n
            level_bounds.append(num_nodes * 4)
        self.num_nodes = num_nodes
        self.level_bounds = level_bounds

        self.indices_dtype = np.dtype(np.uint16) if num_nodes < 16384 else np.dtype(np.uint32)
        self.nodes_byte_length = num_nodes * 4 * dtype.itemsize
        self.indices_byte_length = num_nodes * self.indices_dtype.itemsize

    @property
    def data_buffer_length(self) -> int:
        return 8 + self.nodes_byte_length + self.indices_byte_length

    @property
    def num_levels(self) -> int:
        return len(self.level_bounds)

    @classmethod
    def from_buffer(cls, data) -> "RTreeMetadata":
        """Parse + validate a flatbush header (src/rtree/index.rs:50-98)."""
        buf = np.frombuffer(data, dtype=np.uint8)
        if len(buf) < 8:
            raise ValueError(f"Expected at least 8 bytes but received {len(buf)}")
        if buf[0] != MAGIC:
            raise ValueError("Data not in Flatbush format.")
        version = buf[1] >> 4
        if version != VERSION:
            raise ValueError(f"Got v{version} data when expected v{VERSION}.")
        type_index = buf[1] & 0x0F
        if type_index not in _DTYPE_FOR_TYPE_INDEX:
            raise ValueError(f"Unsupported coordinate type index {type_index}")
        node_size = int(buf[2:4].view(np.uint16)[0])
        num_items = int(buf[4:8].view(np.uint32)[0])
        meta = cls(num_items, node_size, _DTYPE_FOR_TYPE_INDEX[type_index])
        if meta.data_buffer_length != len(buf):
            raise ValueError(
                f"Expected {meta.data_buffer_length} bytes but received "
                f"byte slice with {len(buf)} bytes"
            )
        return meta

    def boxes_view(self, data) -> np.ndarray:
        buf = np.frombuffer(data, dtype=np.uint8)
        return buf[8 : 8 + self.nodes_byte_length].view(self.dtype)

    def indices_view(self, data) -> np.ndarray:
        buf = np.frombuffer(data, dtype=np.uint8)
        return buf[8 + self.nodes_byte_length : self.data_buffer_length].view(self.indices_dtype)


_ATTACH_CACHE: dict = {}  # id(data) → (data, (meta, boxes, indices))
_ATTACH_CACHE_CAP = 8


def _attach(data):
    """Parse (or fetch cached) header + typed views for an index buffer.

    Per-query callers (single-query ``search``/``neighbors``) re-attach
    the same buffer every call; header parsing is ~100 µs of a ~220 µs
    query, so repeat attaches hit a tiny identity-keyed cache.  The
    cache holds a STRONG reference to the buffer object, which is what
    makes ``id()`` keys safe: a cached id can never be reused while its
    entry is alive, and the ``is`` check confirms the hit.  Views alias
    the buffer, so in-place mutation stays visible (same semantics as an
    uncached attach)."""
    k = id(data)
    hit = _ATTACH_CACHE.get(k)
    if hit is not None and hit[0] is data:
        return hit[1]
    meta = RTreeMetadata.from_buffer(data)
    parsed = (meta, meta.boxes_view(data), meta.indices_view(data))
    if len(_ATTACH_CACHE) >= _ATTACH_CACHE_CAP:
        _ATTACH_CACHE.pop(next(iter(_ATTACH_CACHE)))
    _ATTACH_CACHE[k] = (data, parsed)
    return parsed


def build_rtree(
    min_x,
    min_y,
    max_x,
    max_y,
    node_size: int = DEFAULT_NODE_SIZE,
    method: str = "hilbert",
    dtype=np.float64,
) -> np.ndarray:
    """Build a flatbush buffer from four coordinate arrays.

    Returns a uint8 numpy array (the ABI-stable buffer).  ``method`` is one
    of ``hilbert`` (default; vectorized stable argsort on Hilbert values),
    ``str`` (sort-tile-recursive, vectorized), ``hilbert_parity`` /
    ``str_parity`` (exact partial-quicksort ports, byte-identical to the
    reference — use for parity testing, not the hot path), ``none`` (keep
    insertion order; for pre-sorted inputs).

    Parity: builder protocol src/rtree/builder.rs:38-238.
    """
    dtype = np.dtype(dtype)
    min_x = np.ascontiguousarray(min_x, dtype=dtype)
    min_y = np.ascontiguousarray(min_y, dtype=dtype)
    max_x = np.ascontiguousarray(max_x, dtype=dtype)
    max_y = np.ascontiguousarray(max_y, dtype=dtype)
    n = len(min_x)
    meta = RTreeMetadata(n, node_size, dtype)

    data = np.zeros(meta.data_buffer_length, dtype=np.uint8)
    data[0] = MAGIC
    data[1] = (VERSION << 4) + _TYPE_INDEX[dtype.name]
    data[2:4].view(np.uint16)[0] = node_size
    data[4:8].view(np.uint32)[0] = n

    boxes = data[8 : 8 + meta.nodes_byte_length].view(dtype)
    indices = data[8 + meta.nodes_byte_length :].view(meta.indices_dtype)

    if n == 0:
        return data

    gminx = float(min_x.min())
    gminy = float(min_y.min())
    gmaxx = float(max_x.max())
    gmaxy = float(max_y.max())
    # NaN contract pinned to the reference: building with NaN coordinates
    # is a programmer error and must fail loudly (src/rtree/mod.rs:24-25
    # panics "Coordinates must not be NaN"), never silently misplace
    # boxes.  min()/max() propagate NaN, so checking the four global
    # bounds is exactly the any-NaN check without four full-array passes.
    if np.issubdtype(dtype, np.floating) and (
        np.isnan(gminx) or np.isnan(gminy) or np.isnan(gmaxx) or np.isnan(gmaxy)
    ):
        raise ValueError("Coordinates must not be NaN")

    if n == 1:
        boxes[0:4] = (min_x[0], min_y[0], max_x[0], max_y[0])
        indices[0] = 0
        return data

    if n <= node_size:
        # single leaf node: root box is the global bbox, no sort
        # (src/rtree/builder.rs:153-168)
        boxes[0 : 4 * n : 4] = min_x
        boxes[1 : 4 * n : 4] = min_y
        boxes[2 : 4 * n : 4] = max_x
        boxes[3 : 4 * n : 4] = max_y
        indices[:n] = np.arange(n, dtype=meta.indices_dtype)
        boxes[4 * n : 4 * n + 4] = np.array([gminx, gminy, gmaxx, gmaxy], dtype=dtype)
        return data

    if method in ("hilbert", "str"):
        # fused sort path: the permutation comes from the CONTIGUOUS input
        # arrays (the hilbert/center kernels then read sequentially, not
        # through 32-byte-strided leaf views), the row gather lands
        # directly in the buffer (no copy-back memcpy), and the index
        # column IS the permutation (it would have been arange before the
        # permute, so permuted-arange == perm — no second gather)
        bounds = (gminx, gminy, gmaxx, gmaxy)
        if method == "hilbert":
            hv = hilbert_values_for_boxes(min_x, min_y, max_x, max_y, bounds)
            perm = hilbert_sort_permutation(hv)
        else:
            perm = _str_permutation(min_x, min_y, max_x, max_y, n, node_size)
        src = np.empty((n, 4), dtype=dtype)
        src[:, 0] = min_x
        src[:, 1] = min_y
        src[:, 2] = max_x
        src[:, 3] = max_y
        np.take(src, perm, axis=0, out=boxes[: 4 * n].reshape(n, 4), mode="clip")
        indices[:n] = perm.astype(meta.indices_dtype, copy=False)
    else:
        # leaf section, interleaved (parity / pre-sorted paths mutate the
        # buffer in place)
        boxes[0 : 4 * n : 4] = min_x
        boxes[1 : 4 * n : 4] = min_y
        boxes[2 : 4 * n : 4] = max_x
        boxes[3 : 4 * n : 4] = max_y
        indices[:n] = np.arange(n, dtype=meta.indices_dtype)
        leaf = boxes[: 4 * n]
        _sort_leaves(
            leaf, indices, n, node_size, method,
            (gminx, gminy, gmaxx, gmaxy), dtype,
        )

    # pack parent levels bottom-up (src/rtree/builder.rs:180-232).
    # Full node-size groups reduce in TWO reduceat passes over the
    # interleaved child array (min and max each cover all four columns in
    # one contiguous sweep); the single ragged tail node reduces alone —
    # no padded copy of the whole level, no per-column strided passes.
    for level in range(meta.num_levels - 1):
        start = 0 if level == 0 else meta.level_bounds[level - 1]
        end = meta.level_bounds[level]
        child_boxes = boxes[start:end].reshape(-1, 4)
        num_children = len(child_boxes)
        num_parents = int(np.ceil(num_children / node_size))
        full = num_children // node_size
        parent = np.empty((num_parents, 4), dtype=dtype)
        if full:
            seg = np.arange(full, dtype=np.int64) * node_size
            cb = child_boxes[: full * node_size]
            mins = np.minimum.reduceat(cb, seg, axis=0)
            maxs = np.maximum.reduceat(cb, seg, axis=0)
            parent[:full, 0] = mins[:, 0]
            parent[:full, 1] = mins[:, 1]
            parent[:full, 2] = maxs[:, 2]
            parent[:full, 3] = maxs[:, 3]
        if num_parents > full:
            tail = child_boxes[full * node_size :]
            parent[full, 0] = tail[:, 0].min()
            parent[full, 1] = tail[:, 1].min()
            parent[full, 2] = tail[:, 2].max()
            parent[full, 3] = tail[:, 3].max()
        boxes[end : end + num_parents * 4] = parent.ravel()
        # internal-node index = coord-pos of first child
        indices[end // 4 : end // 4 + num_parents] = (
            start + np.arange(num_parents, dtype=np.int64) * node_size * 4
        ).astype(meta.indices_dtype)

    return data


def _permute_rows(leaf, indices, n, perm):
    """Reorder the interleaved leaf boxes + index column by ``perm``.

    ``np.take(..., out=, mode='clip')`` hits numpy's fast contiguous
    gather (~5× faster than fancy row indexing); the contiguous copy back
    into the buffer view is a plain memcpy."""
    rows = np.empty((n, 4), dtype=leaf.dtype)
    np.take(leaf.reshape(-1, 4), perm, axis=0, out=rows, mode="clip")
    leaf[:] = rows.ravel()
    idx = np.empty(n, dtype=indices.dtype)
    np.take(indices[:n], perm, out=idx, mode="clip")
    indices[:n] = idx


def _quantize_u32(v: np.ndarray) -> np.ndarray:
    """Monotone map of a float array onto uint32 ranks (range-linear).
    Ties introduced by quantization fall back to insertion order under
    the stable radix sorts below — still a valid STR tiling."""
    lo = v.min()
    span = v.max() - lo
    if not span > 0:
        return np.zeros(len(v), dtype=np.uint32)
    q = (v - lo) * (4294967295.0 / span)
    return q.astype(np.uint32)


def _str_permutation(mnx, mny, mxx, mxy, n, node_size):
    """Sort-tile-recursive permutation (src/rtree/sort/str.rs:16-99):
    sort by center-x, slice into ceil(sqrt(ceil(n/node_size))) vertical
    strips, sort each strip by center-y.

    Fast path: both phases run as LSD radix over quantized center ranks
    (numpy's stable argsort on uint16 is O(n) radix — same trick as
    hilbert_sort_permutation).  Phase 2 sorts the composite
    ``slice_id << 16 | cy_q16`` key in two chained passes, so the
    per-strip sorts cost two O(n) sweeps total instead of a Python loop
    of float argsorts.  Quantization only moves boxes between adjacent
    strips/positions — the tree stays valid and deterministic; the
    byte-parity ordering lives in method="str_parity"."""
    cx = (mnx + mxx) * 0.5
    cy = (mny + mxy) * 0.5
    num_leaf_nodes = int(np.ceil(n / node_size))
    num_slices = int(np.ceil(np.sqrt(num_leaf_nodes)))
    per_slice = int(np.ceil(n / num_slices))
    if num_slices > 0xFFFF:  # composite key would overflow — exact path
        perm = np.argsort(cx, kind="stable")
        cy_sorted = cy[perm]
        for s in range(num_slices):
            lo = s * per_slice
            hi = min((s + 1) * per_slice, n)
            if hi <= lo:
                break
            sub = np.argsort(cy_sorted[lo:hi], kind="stable")
            perm[lo:hi] = perm[lo:hi][sub]
        return perm
    qx = _quantize_u32(cx)
    o1 = np.argsort(qx.astype(np.uint16), kind="stable")
    perm = o1[np.argsort((qx >> np.uint32(16)).astype(np.uint16)[o1], kind="stable")]
    slice_id = (np.arange(n, dtype=np.uint32) // np.uint32(per_slice))
    cyq = (_quantize_u32(cy[perm]) >> np.uint32(16)).astype(np.uint16)
    o2 = np.argsort(cyq, kind="stable")
    o3 = o2[np.argsort(slice_id[o2].astype(np.uint16), kind="stable")]
    return perm[o3]


def _sort_leaves(leaf, indices, n, node_size, method, bounds, dtype):
    mnx, mny, mxx, mxy = leaf[0::4], leaf[1::4], leaf[2::4], leaf[3::4]
    if method == "none":
        return
    if method == "hilbert":
        hv = hilbert_values_for_boxes(mnx, mny, mxx, mxy, bounds)
        perm = hilbert_sort_permutation(hv)
        _permute_rows(leaf, indices, n, perm)
    elif method == "hilbert_parity":
        hv = hilbert_values_for_boxes(mnx, mny, mxx, mxy, bounds).copy()
        partial_quicksort(hv, leaf, indices[:n], node_size)
    elif method == "str":
        perm = _str_permutation(mnx, mny, mxx, mxy, n, node_size)
        _permute_rows(leaf, indices, n, perm)
    elif method == "str_parity":
        cx = ((mnx + mxx) / 2).astype(dtype)
        partial_quicksort(cx, leaf, indices[:n], node_size)
        mny2, mxy2 = leaf[1::4], leaf[3::4]
        cy = ((mny2 + mxy2) / 2).astype(dtype)
        num_leaf_nodes = int(np.ceil(n / node_size))
        num_slices = int(np.ceil(np.sqrt(num_leaf_nodes)))
        per_slice = int(np.ceil(n / num_slices))
        for s in range(num_slices):
            lo = s * per_slice
            hi = min((s + 1) * per_slice, n)
            if hi <= lo:
                break
            partial_quicksort(cy, leaf, indices[:n], node_size, lo, hi - 1)
    else:
        raise ValueError(f"unknown sort method {method!r}")


# ---------------------------------------------------------------------------
# Queries
# ---------------------------------------------------------------------------


def search_batch(data, qmin_x, qmin_y, qmax_x, qmax_y):
    """Box-intersection probe for a *batch* of query boxes.

    Returns ``(query_ids, item_ids)`` uint32 arrays: item ``item_ids[k]``'s
    box intersects query ``query_ids[k]``'s box.  Same candidate sets as the
    reference's per-query BFS (src/rtree/trait.rs:113-165) but expanded as a
    level-synchronous frontier in numpy, so one call answers thousands of
    queries.  Pair order is not the reference's insertion order — candidate
    sets are order-insensitive (the reference's own tests sort before
    comparing, src/rtree/trait.rs:602-609).
    """
    meta, boxes, indices = _attach(data)
    qmin_x = np.asarray(qmin_x, dtype=meta.dtype)
    qmin_y = np.asarray(qmin_y, dtype=meta.dtype)
    qmax_x = np.asarray(qmax_x, dtype=meta.dtype)
    qmax_y = np.asarray(qmax_y, dtype=meta.dtype)
    nq = len(qmin_x)

    empty = (np.empty(0, dtype=np.uint32), np.empty(0, dtype=np.uint32))
    if meta.num_items == 0 or nq == 0:
        return empty

    level_bounds = np.asarray(meta.level_bounds, dtype=np.int64)
    num_leaf_coords = meta.num_items * 4
    node_span = meta.node_size * 4
    root = len(boxes) - 4

    qid = np.arange(nq, dtype=np.int64)
    gstart = np.full(nq, root, dtype=np.int64)

    out_q = []
    out_i = []
    while len(gstart):
        ub = level_bounds[np.searchsorted(level_bounds, gstart, side="right")]
        end = np.minimum(gstart + node_span, ub)
        counts = (end - gstart) >> 2
        total = int(counts.sum())
        rq = np.repeat(qid, counts)
        base = np.repeat(gstart, counts)
        cum = np.cumsum(counts) - counts
        local = np.arange(total, dtype=np.int64) - np.repeat(cum, counts)
        pos = base + 4 * local

        keep = ~(
            (qmax_x[rq] < boxes[pos])
            | (qmax_y[rq] < boxes[pos + 1])
            | (qmin_x[rq] > boxes[pos + 2])
            | (qmin_y[rq] > boxes[pos + 3])
        )
        pos = pos[keep]
        rq = rq[keep]
        idxv = indices[pos >> 2].astype(np.int64)
        is_leaf = pos < num_leaf_coords
        out_q.append(rq[is_leaf].astype(np.uint32))
        out_i.append(idxv[is_leaf].astype(np.uint32))
        qid = rq[~is_leaf]
        gstart = idxv[~is_leaf]

    if not out_q:
        return empty
    return np.concatenate(out_q), np.concatenate(out_i)


def search(data, min_x, min_y, max_x, max_y) -> np.ndarray:
    """Single box-intersection query; returns item ids (sorted).

    Same candidate set as the reference's per-query BFS
    (src/rtree/trait.rs:113-165), but expanded one LEVEL at a time:
    the whole frontier's children are fetched with one slab gather
    (``boxes[frontier[:,None] + arange(node_span)]`` — children of a
    node are contiguous in the flatbush layout) and tested with four
    column compares.  This path skips the per-query bookkeeping
    (repeat/cumsum) that ``search_batch`` needs, which halves the
    fixed numpy overhead at nq=1; ``search_batch`` remains the
    throughput path for thousands of queries.
    """
    meta, boxes, indices = _attach(data)
    if meta.num_items == 0:
        return np.empty(0, dtype=np.uint32)
    dt = np.dtype(meta.dtype).type
    qmin_x = dt(min_x)
    qmin_y = dt(min_y)
    qmax_x = dt(max_x)
    qmax_y = dt(max_y)

    level_bounds = np.asarray(meta.level_bounds, dtype=np.int64)
    node_span = meta.node_size * 4
    num_leaf_coords = meta.num_items * 4
    span_offs = np.arange(node_span, dtype=np.int64)
    child_offs = span_offs[::4]
    # the last node of a level is partial: clamp the slab gather
    # in-bounds and mask those slots out with the level-bound test
    max_start = len(boxes) - 1

    frontier = np.array([len(boxes) - 4], dtype=np.int64)
    out: list[np.ndarray] = []
    while frontier.size:
        ub = level_bounds[np.searchsorted(level_bounds, frontier, side="right")]
        blk = boxes[
            np.minimum(frontier[:, None] + span_offs, max_start)
        ].reshape(-1, 4)
        pos = frontier[:, None] + child_offs
        keep = (pos < ub[:, None]).ravel() & ~(
            (qmax_x < blk[:, 0])
            | (qmax_y < blk[:, 1])
            | (qmin_x > blk[:, 2])
            | (qmin_y > blk[:, 3])
        )
        p = pos.ravel()[keep]
        leaf = p < num_leaf_coords
        out.append(indices[p[leaf] >> 2])
        frontier = indices[p[~leaf] >> 2].astype(np.int64)
    if not out:
        return np.empty(0, dtype=np.uint32)
    return np.sort(np.concatenate(out).astype(np.uint32))


def neighbors(
    data,
    x: float,
    y: float,
    max_results: int | None = None,
    max_distance: float | None = None,
    metric: str = "squared",
    return_distances: bool = False,
    tie_inclusive: bool = False,
) -> np.ndarray:
    """kNN by best-first traversal; exact port of the reference algorithm.

    The default metric is *squared* euclidean (so ``max_distance`` compares
    against squared distance), matching the reference default
    (src/rtree/trait.rs:198-302).  ``metric="euclidean"`` is the sqrt'd
    variant (reference ``EuclideanDistance``, src/rtree/distance.rs:33-49);
    ``metric="haversine"`` uses great-circle meters with WGS84 equatorial
    radius (src/rtree/distance.rs:57-125).  Results are item ids ordered by
    ascending distance.

    ``tie_inclusive`` keeps EVERY item tied at the ``max_results``-th
    distance instead of truncating in heap order: distributed kNN merges
    that tie-break globally on (dist, id) need every tied candidate from
    every partition probe, or a smaller-id neighbor can be dropped before
    the merge ever sees it.
    """
    meta, boxes, indices = _attach(data)
    if meta.num_items == 0:
        if return_distances:
            return np.empty(0, dtype=np.uint32), np.empty(0, dtype=np.float64)
        return np.empty(0, dtype=np.uint32)

    if max_distance is None:
        max_distance = np.inf

    level_bounds = meta.level_bounds
    node_span = meta.node_size * 4
    num_leaf_coords = meta.num_items * 4

    outer = len(boxes) - 4
    heap: list[tuple[float, int]] = []
    results: list[int] = []
    dists: list[float] = []

    # per-node expansion is vectorized: one numpy block computes all
    # node_size child distances (the per-child arithmetic matches the
    # reference's scalar definitions op for op, so the heap receives
    # bit-identical keys in the same push order as a scalar traversal)
    if metric == "squared":
        # reference default metric, src/rtree/trait.rs:198-302 + the
        # axis-distance helper src/rtree/trait.rs:571-579
        def vec_internal(blk):
            dx = np.maximum(np.maximum(blk[:, 0] - x, x - blk[:, 2]), 0.0)
            dy = np.maximum(np.maximum(blk[:, 1] - y, y - blk[:, 3]), 0.0)
            return dx * dx + dy * dy

        vec_leaf = vec_internal

    elif metric == "euclidean":
        # reference EuclideanDistance, src/rtree/distance.rs:33-49
        def vec_internal(blk):
            dx = np.maximum(np.maximum(blk[:, 0] - x, x - blk[:, 2]), 0.0)
            dy = np.maximum(np.maximum(blk[:, 1] - y, y - blk[:, 3]), 0.0)
            return np.sqrt(dx * dx + dy * dy)

        vec_leaf = vec_internal

    elif metric == "haversine":
        from .geom import haversine, haversine_env_lower

        # internal nodes need a true LOWER bound of any descendant's
        # great-circle distance or best-first order (and max_distance
        # pruning) breaks: the reference's clamped-closest-point bound
        # (src/rtree/distance.rs:91-115) overestimates across large or
        # antimeridian-spanning node boxes — measured pruning a whole
        # partition tree whose nearest leaf was 23 km away.
        def vec_internal(blk):
            return haversine_env_lower(
                x, y, blk[:, 0], blk[:, 1], blk[:, 2], blk[:, 3]
            )

        # leaves get the reference's clamped-closest-point distance
        # (src/rtree/distance.rs:91-115): for the point leaves of the
        # usual geo case the clamped point IS the point, so this is
        # their exact great-circle distance; exact too for the small
        # boxes an R-tree leaf holds (NOT the lower-left corner, which
        # is arbitrarily wrong for wide boxes)
        def vec_leaf(blk):
            cx = np.clip(x, blk[:, 0], blk[:, 2])
            cy = np.clip(y, blk[:, 1], blk[:, 3])
            return haversine(x, y, cx, cy)

    else:
        raise ValueError(f"unknown metric {metric!r}")

    while outer is not None:
        end = min(outer + node_span, _upper_bound(outer, level_bounds))
        is_leaf_level = outer < num_leaf_coords
        cnt = (end - outer) >> 2
        blk = boxes[outer:end].reshape(cnt, 4)
        d_all = (vec_leaf if is_leaf_level else vec_internal)(blk)
        base = outer >> 2
        leafbit = 1 if is_leaf_level else 0
        # one C-level tolist() each → the push loop handles native
        # Python floats/ints (per-element numpy scalar extraction is
        # what made the first vectorized cut SLOWER than the scalar
        # loop; measured interleaved A/B)
        idx_l = indices[base : base + cnt].tolist()
        for d, index in zip(d_all.tolist(), idx_l):
            if d <= max_distance:
                heapq.heappush(heap, (d, (index << 1) | leafbit))

        stop = False
        while heap and (heap[0][1] & 1):
            if heap[0][0] > max_distance:
                stop = True
                break
            d, iid = heapq.heappop(heap)
            results.append(iid >> 1)
            dists.append(d)
            if max_results is not None and len(results) >= max_results:
                if tie_inclusive:
                    # keep collecting at exactly the k-th distance: bound
                    # the traversal by distance instead of count (pops are
                    # non-decreasing in d, so only ties can still land)
                    max_distance = min(max_distance, d)
                    max_results = None
                else:
                    stop = True
                    break
        if stop:
            break
        if not heap or heap[0][0] > max_distance:
            break
        outer = heapq.heappop(heap)[1] >> 1

    if return_distances:
        return np.asarray(results, dtype=np.uint32), np.asarray(dists)
    return np.asarray(results, dtype=np.uint32)


def _upper_bound(value, arr):
    """First element of arr greater than value (src/rtree/util.rs:55-69)."""
    i, j = 0, len(arr) - 1
    while i < j:
        m = (i + j) >> 1
        if arr[m] > value:
            j = m
        else:
            i = m + 1
    return arr[i]


def tree_join(left_data, right_data):
    """Tree×tree box-intersection candidate join.

    Returns ``(left_ids, right_ids)`` uint32 arrays: the same candidate
    *set* as the reference's dual-tree synchronized descent
    (src/rtree/traversal.rs:262-370) — here computed by batch-probing the
    right tree with the left tree's leaf boxes, which yields an identical
    pair set (both enumerate exactly the intersecting leaf pairs).  Pair
    order differs; compare as sets (as the reference's rstar-parity test
    does, src/rtree/traversal.rs:402-484).
    """
    lmeta, lboxes, lindices = _attach(left_data)
    if lmeta.num_items == 0:
        return np.empty(0, dtype=np.uint32), np.empty(0, dtype=np.uint32)
    nl = lmeta.num_items
    leaf = lboxes[: 4 * nl]
    qids, rids = search_batch(right_data, leaf[0::4], leaf[1::4], leaf[2::4], leaf[3::4])
    left_ids = lindices[:nl].astype(np.uint32)[qids]
    return left_ids, rids


# ---------------------------------------------------------------------------
# Partition / export views (python/src/rtree/partitions.rs)
# ---------------------------------------------------------------------------


def boxes_at_level(data, level: int) -> np.ndarray:
    """(n, 4) view of node boxes at a level; level 0 = leaves.

    Parity: src/rtree/trait.rs:95-108.
    """
    meta, boxes, _ = _attach(data)
    lb = meta.level_bounds
    if level >= len(lb):
        raise ValueError("Level out of bounds")
    start = 0 if level == 0 else lb[level - 1]
    return boxes[start : lb[level]].reshape(-1, 4)


def partitions(data):
    """Leaf-node membership as spatial partitioning of the original rows.

    Returns ``(insertion_indices, partition_ids)``; partition = leaf node
    (python/src/rtree/partitions.rs:17-104).
    """
    meta, _, indices = _attach(data)
    n = meta.num_items
    idx = indices[:n].astype(np.uint32)
    pids = (np.arange(n, dtype=np.uint32) // meta.node_size).astype(np.uint32)
    return idx, pids


def partition_boxes(data) -> np.ndarray:
    """Partition envelopes: boxes at level 1 (python/src/rtree/partitions.rs:108-132)."""
    meta, _, _ = _attach(data)
    if meta.num_levels < 2:
        return boxes_at_level(data, 0)
    return boxes_at_level(data, 1)
