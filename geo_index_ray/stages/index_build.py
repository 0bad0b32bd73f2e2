"""Partition-parallel packed-index build: the engine's "source" stage.

Each Arrow batch becomes one immutable flatbush buffer (a binary cell in a
one-row index table) — the reference's whole-library operation expressed as
a `map_batches` stage.  The buffer is the ABI-stable index
(src/rtree/index.rs ABI); downstream probes reattach zero-copy via
``RTreeMetadata.from_buffer``.  The companion id array maps tree insertion
indexes back to row keys.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..kernels import kdtree, rtree


def build_rtree_index_stage(
    id_col: str,
    node_size: int = 16,
    method: str = "hilbert",
):
    """Stage: batch of (id, min_x, min_y, max_x, max_y) → one index row:
    (partition_fp, num_items, index:binary, ids:binary, bbox columns)."""

    def fn(batch: pa.Table) -> pa.Table:
        rid = batch[id_col].to_numpy().astype(np.int64)
        mnx = batch["min_x"].to_numpy()
        mny = batch["min_y"].to_numpy()
        mxx = batch["max_x"].to_numpy()
        mxy = batch["max_y"].to_numpy()
        buf = rtree.build_rtree(mnx, mny, mxx, mxy, node_size=node_size, method=method)
        fp = hashlib.sha1(rid.tobytes()).hexdigest()[:16]
        return pa.table(
            {
                "partition_fp": pa.array([fp]),
                "num_items": pa.array([len(rid)], pa.int64()),
                "index": pa.array([buf.tobytes()], pa.large_binary()),
                "ids": pa.array([rid.tobytes()], pa.large_binary()),
                "min_x": pa.array([float(mnx.min()) if len(rid) else 0.0]),
                "min_y": pa.array([float(mny.min()) if len(rid) else 0.0]),
                "max_x": pa.array([float(mxx.max()) if len(rid) else 0.0]),
                "max_y": pa.array([float(mxy.max()) if len(rid) else 0.0]),
            }
        )

    return fn


def build_kdtree_index_stage(id_col: str, x_col: str = "x", y_col: str = "y", node_size: int = 64):
    """Stage: batch of points → one kdbush index row."""

    def fn(batch: pa.Table) -> pa.Table:
        rid = batch[id_col].to_numpy().astype(np.int64)
        x = batch[x_col].to_numpy()
        y = batch[y_col].to_numpy()
        buf = kdtree.build_kdtree(x, y, node_size=node_size)
        fp = hashlib.sha1(rid.tobytes()).hexdigest()[:16]
        return pa.table(
            {
                "partition_fp": pa.array([fp]),
                "num_items": pa.array([len(rid)], pa.int64()),
                "index": pa.array([buf.tobytes()], pa.large_binary()),
                "ids": pa.array([rid.tobytes()], pa.large_binary()),
            }
        )

    return fn


def probe_index_table(index_table: pa.Table, qmin_x, qmin_y, qmax_x, qmax_y):
    """Search every partition index in an index table with a query batch;
    returns (query_ids, row_ids) over the *original* row keys."""
    out_q, out_i = [], []
    for row in range(index_table.num_rows):
        buf = index_table["index"][row].as_py()
        ids = np.frombuffer(index_table["ids"][row].as_py(), dtype=np.int64)
        q, i = rtree.search_batch(buf, qmin_x, qmin_y, qmax_x, qmax_y)
        out_q.append(q)
        out_i.append(ids[i.astype(np.int64)])
    if not out_q:
        return np.empty(0, dtype=np.uint32), np.empty(0, dtype=np.int64)
    return np.concatenate(out_q), np.concatenate(out_i)
