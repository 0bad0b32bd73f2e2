"""Packed static 2D KD-tree ("kdbush" ABI) — pure numpy, zero-copy.

From-scratch reimplementation of geo-index's KDTree semantics (reference
layout: src/kdtree/index.rs:24-142, builder src/kdtree/builder.rs:26-244,
range/within src/kdtree/trait.rs:37-174).  Buffer ABI:

- header: ``[0xdb, (1<<4) | type_index, node_size:u16, num_items:u32]``
- ids: ``num_items`` ints, u16 if num_items < 65536 else u32
- padding to 8-byte alignment of the coords section
- coords: ``num_items * 2`` interleaved x,y — kd-sorted in place.

Two build paths:

- fast (default): recursive ``np.argpartition`` around each subtree's
  middle index, alternating axes — a valid kdbush tree (identical range /
  within result sets) with only O(n / node_size) Python-level calls.
- ``parity=True``: exact port of the reference's Floyd–Rivest ``select``
  (src/kdtree/builder.rs:177-237) so ids/coords permutations are
  byte-identical to kdbush-JS / geo-index (pinned by the golden arrays in
  src/kdtree/test.rs:115-138).
"""

from __future__ import annotations

import numpy as np

MAGIC = 0xDB
VERSION = 1
HEADER_SIZE = 8
DEFAULT_NODE_SIZE = 64

_TYPE_INDEX = {"float32": 7, "float64": 8}
_DTYPE_FOR_TYPE_INDEX = {7: np.dtype("float32"), 8: np.dtype("float64")}


class KDTreeMetadata:
    """Layout math for a kdbush buffer. Parity: src/kdtree/index.rs:24-142."""

    __slots__ = (
        "num_items",
        "node_size",
        "dtype",
        "indices_byte_size",
        "pad_coords_byte_size",
        "coords_byte_size",
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
        self.coords_byte_size = self.num_items * 2 * dtype.itemsize
        self.indices_dtype = (
            np.dtype(np.uint16) if self.num_items < 65536 else np.dtype(np.uint32)
        )
        self.indices_byte_size = self.num_items * self.indices_dtype.itemsize
        self.pad_coords_byte_size = (8 - (self.indices_byte_size % 8)) % 8

    @property
    def data_buffer_length(self) -> int:
        return (
            HEADER_SIZE
            + self.coords_byte_size
            + self.indices_byte_size
            + self.pad_coords_byte_size
        )

    @classmethod
    def from_buffer(cls, data) -> "KDTreeMetadata":
        """Parse + validate a kdbush header (src/kdtree/index.rs:46-94)."""
        buf = np.frombuffer(data, dtype=np.uint8)
        if len(buf) < HEADER_SIZE:
            raise ValueError(f"Expected at least {HEADER_SIZE} bytes but received {len(buf)}")
        if buf[0] != MAGIC:
            raise ValueError("Data not in Kdbush format.")
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

    def ids_view(self, data) -> np.ndarray:
        buf = np.frombuffer(data, dtype=np.uint8)
        return buf[HEADER_SIZE : HEADER_SIZE + self.indices_byte_size].view(self.indices_dtype)

    def coords_view(self, data) -> np.ndarray:
        buf = np.frombuffer(data, dtype=np.uint8)
        start = HEADER_SIZE + self.indices_byte_size + self.pad_coords_byte_size
        return buf[start : start + self.coords_byte_size].view(self.dtype)


def _attach(data):
    meta = KDTreeMetadata.from_buffer(data)
    return meta, meta.coords_view(data), meta.ids_view(data)


def build_kdtree(
    x,
    y,
    node_size: int = DEFAULT_NODE_SIZE,
    dtype=np.float64,
    parity: bool = False,
) -> np.ndarray:
    """Build a kdbush buffer from x/y coordinate arrays."""
    dtype = np.dtype(dtype)
    x = np.ascontiguousarray(x, dtype=dtype)
    y = np.ascontiguousarray(y, dtype=dtype)
    # same NaN contract as the R-tree builder (reference panics on NaN,
    # src/rtree/mod.rs:24-25) — fail loudly instead of mis-sorting
    if np.isnan(x).any() or np.isnan(y).any():
        raise ValueError("Coordinates must not be NaN")
    n = len(x)
    meta = KDTreeMetadata(n, node_size, dtype)

    data = np.zeros(meta.data_buffer_length, dtype=np.uint8)
    data[0] = MAGIC
    data[1] = (VERSION << 4) + _TYPE_INDEX[dtype.name]
    data[2:4].view(np.uint16)[0] = node_size
    data[4:8].view(np.uint32)[0] = n

    if n == 0:
        return data

    ids = meta.ids_view(data)
    coords = meta.coords_view(data)
    ids[:] = np.arange(n, dtype=meta.indices_dtype)
    coords[0::2] = x
    coords[1::2] = y

    if parity:
        _kd_sort_parity(ids, coords, node_size, 0, n - 1, 0)
    else:
        pts = coords.reshape(n, 2)  # in-place view
        perm = np.arange(n, dtype=np.int64)
        _kd_sort_fast(pts, perm, node_size, 0, n - 1, 0)
        ids[:] = perm.astype(meta.indices_dtype)
    return data


def _kd_sort_fast(pts: np.ndarray, perm: np.ndarray, node_size, left, right, axis):
    """Vectorized kd-sort: argpartition around the middle index per subtree.

    Maintains the kd invariant of the reference sort (src/kdtree/builder.rs:
    150-172): in [left, right], items left of the middle are <= the middle
    on `axis`, items right are >=.  Iterative worklist; each partition is a
    single numpy argpartition over the span (in-place on pts and perm).
    """
    stack = [(left, right, axis)]
    while stack:
        lo, hi, ax = stack.pop()
        if hi - lo <= node_size:
            continue
        m = (lo + hi) >> 1
        span = slice(lo, hi + 1)
        order = np.argpartition(pts[span, ax], m - lo, kind="introselect")
        pts[span] = pts[span][order]
        perm[span] = perm[span][order]
        stack.append((lo, m - 1, 1 - ax))
        stack.append((m + 1, hi, 1 - ax))


def _kd_sort_parity(ids, coords, node_size, left, right, axis):
    """Exact port of the reference kd-sort + Floyd–Rivest select
    (src/kdtree/builder.rs:150-237)."""
    stack = [(left, right, axis)]
    while stack:
        lo, hi, ax = stack.pop()
        if hi - lo <= node_size:
            continue
        m = (lo + hi) >> 1
        _select(ids, coords, m, lo, hi, ax)
        stack.append((lo, m - 1, 1 - ax))
        stack.append((m + 1, hi, 1 - ax))


def _select(ids, coords, k, left, right, axis):
    while right > left:
        if right - left > 600:
            n = float(right - left + 1)
            m = float(k - left + 1)
            z = np.log(n)
            s = 0.5 * np.exp((2.0 * z) / 3.0)
            sd = 0.5 * np.sqrt((z * s * (n - s)) / n) * (-1.0 if m - n / 2.0 < 0.0 else 1.0)
            new_left = max(left, int(np.floor(k - (m * s) / n + sd)))
            new_right = min(right, int(np.floor(k + ((n - m) * s) / n + sd)))
            _select(ids, coords, k, new_left, new_right, axis)

        t = coords[2 * k + axis]
        i = left
        j = right

        _swap_item(ids, coords, left, k)
        if coords[2 * right + axis] > t:
            _swap_item(ids, coords, left, right)

        while i < j:
            _swap_item(ids, coords, i, j)
            i += 1
            j -= 1
            while coords[2 * i + axis] < t:
                i += 1
            while coords[2 * j + axis] > t:
                j -= 1

        if coords[2 * left + axis] == t:
            _swap_item(ids, coords, left, j)
        else:
            j += 1
            _swap_item(ids, coords, j, right)

        if j <= k:
            left = j + 1
        if k <= j:
            right = j - 1


def _swap_item(ids, coords, i, j):
    ids[i], ids[j] = ids[j], ids[i]
    ci, cj = 2 * i, 2 * j
    coords[ci], coords[cj] = coords[cj], coords[ci]
    coords[ci + 1], coords[cj + 1] = coords[cj + 1], coords[ci + 1]


# ---------------------------------------------------------------------------
# Queries
# ---------------------------------------------------------------------------


def range_query(data, min_x, min_y, max_x, max_y) -> np.ndarray:
    """Items within a bbox; exact port of src/kdtree/trait.rs:37-97
    (result order matches the reference traversal)."""
    meta, coords, ids = _attach(data)
    if meta.num_items == 0:
        return np.empty(0, dtype=np.uint32)
    node_size = meta.node_size
    stack = [(0, meta.num_items - 1, 0)]
    result = []
    while stack:
        # LIFO pop; push order below mirrors src/kdtree/trait.rs:79-93
        left, right, axis = stack.pop()
        if right - left <= node_size:
            for i in range(left, right + 1):
                xx = coords[2 * i]
                yy = coords[2 * i + 1]
                if min_x <= xx <= max_x and min_y <= yy <= max_y:
                    result.append(int(ids[i]))
            continue
        m = (left + right) >> 1
        xx = coords[2 * m]
        yy = coords[2 * m + 1]
        if min_x <= xx <= max_x and min_y <= yy <= max_y:
            result.append(int(ids[m]))
        if (min_x <= xx) if axis == 0 else (min_y <= yy):
            stack.append((left, m - 1, 1 - axis))
        if (max_x >= xx) if axis == 0 else (max_y >= yy):
            stack.append((m + 1, right, 1 - axis))
    return np.asarray(result, dtype=np.uint32)


def within(data, qx, qy, r) -> np.ndarray:
    """Items within radius r of (qx, qy); exact port of
    src/kdtree/trait.rs:118-174."""
    meta, coords, ids = _attach(data)
    if meta.num_items == 0:
        return np.empty(0, dtype=np.uint32)
    node_size = meta.node_size
    r2 = r * r
    stack = [(0, meta.num_items - 1, 0)]
    result = []
    while stack:
        left, right, axis = stack.pop()
        if right - left <= node_size:
            for i in range(left, right + 1):
                dx = coords[2 * i] - qx
                dy = coords[2 * i + 1] - qy
                if dx * dx + dy * dy <= r2:
                    result.append(int(ids[i]))
            continue
        m = (left + right) >> 1
        xx = coords[2 * m]
        yy = coords[2 * m + 1]
        dx = xx - qx
        dy = yy - qy
        if dx * dx + dy * dy <= r2:
            result.append(int(ids[m]))
        if (qx - r <= xx) if axis == 0 else (qy - r <= yy):
            stack.append((left, m - 1, 1 - axis))
        if (qx + r >= xx) if axis == 0 else (qy + r >= yy):
            stack.append((m + 1, right, 1 - axis))
    return np.asarray(result, dtype=np.uint32)


def range_batch(data, qmin_x, qmin_y, qmax_x, qmax_y):
    """Batched bbox query: returns (query_ids, item_ids) pair arrays.

    Level-synchronous frontier over (query, segment) tuples — all numpy.
    Same result sets as per-query ``range_query``.
    """
    meta, coords, ids = _attach(data)
    nq = len(qmin_x)
    empty = (np.empty(0, dtype=np.uint32), np.empty(0, dtype=np.uint32))
    if meta.num_items == 0 or nq == 0:
        return empty
    qmin_x = np.asarray(qmin_x, dtype=meta.dtype)
    qmin_y = np.asarray(qmin_y, dtype=meta.dtype)
    qmax_x = np.asarray(qmax_x, dtype=meta.dtype)
    qmax_y = np.asarray(qmax_y, dtype=meta.dtype)
    node_size = meta.node_size
    xs = coords[0::2]
    ys = coords[1::2]

    q = np.arange(nq, dtype=np.int64)
    lo = np.zeros(nq, dtype=np.int64)
    hi = np.full(nq, meta.num_items - 1, dtype=np.int64)
    ax = np.zeros(nq, dtype=np.int64)

    out_q, out_i = [], []
    while len(q):
        leafy = (hi - lo) <= node_size
        # linear-scan segments
        if leafy.any():
            lq, llo, lhi = q[leafy], lo[leafy], hi[leafy]
            counts = lhi - llo + 1
            rq = np.repeat(lq, counts)
            base = np.repeat(llo, counts)
            cum = np.cumsum(counts) - counts
            pos = base + (np.arange(int(counts.sum()), dtype=np.int64) - np.repeat(cum, counts))
            inb = (
                (xs[pos] >= qmin_x[rq])
                & (xs[pos] <= qmax_x[rq])
                & (ys[pos] >= qmin_y[rq])
                & (ys[pos] <= qmax_y[rq])
            )
            out_q.append(rq[inb].astype(np.uint32))
            out_i.append(ids[pos[inb]].astype(np.uint32))
        q, lo, hi, ax = q[~leafy], lo[~leafy], hi[~leafy], ax[~leafy]
        if not len(q):
            break
        m = (lo + hi) >> 1
        mx = xs[m]
        my = ys[m]
        inb = (mx >= qmin_x[q]) & (mx <= qmax_x[q]) & (my >= qmin_y[q]) & (my <= qmax_y[q])
        out_q.append(q[inb].astype(np.uint32))
        out_i.append(ids[m[inb]].astype(np.uint32))
        axis0 = ax == 0
        go_left = np.where(axis0, qmin_x[q] <= mx, qmin_y[q] <= my)
        go_right = np.where(axis0, qmax_x[q] >= mx, qmax_y[q] >= my)
        nq_, nlo, nhi, nax = [], [], [], []
        nq_.append(q[go_left])
        nlo.append(lo[go_left])
        nhi.append(m[go_left] - 1)
        nax.append(1 - ax[go_left])
        nq_.append(q[go_right])
        nlo.append(m[go_right] + 1)
        nhi.append(hi[go_right])
        nax.append(1 - ax[go_right])
        q = np.concatenate(nq_)
        lo = np.concatenate(nlo)
        hi = np.concatenate(nhi)
        ax = np.concatenate(nax)

    if not out_q:
        return empty
    return np.concatenate(out_q), np.concatenate(out_i)


def within_batch(data, qx, qy, r):
    """Batched radius query: (query_ids, item_ids) for points within r."""
    meta, coords, ids = _attach(data)
    nq = len(qx)
    empty = (np.empty(0, dtype=np.uint32), np.empty(0, dtype=np.uint32))
    if meta.num_items == 0 or nq == 0:
        return empty
    qx = np.asarray(qx, dtype=meta.dtype)
    qy = np.asarray(qy, dtype=meta.dtype)
    r = np.broadcast_to(np.asarray(r, dtype=meta.dtype), (nq,))
    r2 = r * r
    node_size = meta.node_size
    xs = coords[0::2]
    ys = coords[1::2]

    q = np.arange(nq, dtype=np.int64)
    lo = np.zeros(nq, dtype=np.int64)
    hi = np.full(nq, meta.num_items - 1, dtype=np.int64)
    ax = np.zeros(nq, dtype=np.int64)

    out_q, out_i = [], []
    while len(q):
        leafy = (hi - lo) <= node_size
        if leafy.any():
            lq, llo, lhi = q[leafy], lo[leafy], hi[leafy]
            counts = lhi - llo + 1
            rq = np.repeat(lq, counts)
            base = np.repeat(llo, counts)
            cum = np.cumsum(counts) - counts
            pos = base + (np.arange(int(counts.sum()), dtype=np.int64) - np.repeat(cum, counts))
            dx = xs[pos] - qx[rq]
            dy = ys[pos] - qy[rq]
            inb = dx * dx + dy * dy <= r2[rq]
            out_q.append(rq[inb].astype(np.uint32))
            out_i.append(ids[pos[inb]].astype(np.uint32))
        q, lo, hi, ax = q[~leafy], lo[~leafy], hi[~leafy], ax[~leafy]
        if not len(q):
            break
        m = (lo + hi) >> 1
        mx = xs[m]
        my = ys[m]
        dx = mx - qx[q]
        dy = my - qy[q]
        inb = dx * dx + dy * dy <= r2[q]
        out_q.append(q[inb].astype(np.uint32))
        out_i.append(ids[m[inb]].astype(np.uint32))
        axis0 = ax == 0
        go_left = np.where(axis0, qx[q] - r[q] <= mx, qy[q] - r[q] <= my)
        go_right = np.where(axis0, qx[q] + r[q] >= mx, qy[q] + r[q] >= my)
        q, lo, hi, ax = (
            np.concatenate([q[go_left], q[go_right]]),
            np.concatenate([lo[go_left], m[go_right] + 1]),
            np.concatenate([m[go_left] - 1, hi[go_right]]),
            np.concatenate([1 - ax[go_left], 1 - ax[go_right]]),
        )

    if not out_q:
        return empty
    return np.concatenate(out_q), np.concatenate(out_i)
