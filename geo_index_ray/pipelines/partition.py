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
